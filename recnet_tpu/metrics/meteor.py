"""METEOR — pure-Python reimplementation (no JVM / meteor-1.5.jar).

Replaces the reference's long-lived Java subprocess + stdio line protocol
(reference: coco_caption/pycocoevalcap/meteor/meteor.py:17-46) with an
in-process scorer using the classic, unambiguously documented METEOR
formulation (Lavie & Agarwal 2007, as also used by NLTK/HF reimplementations):

    Fmean   = P·R / (alpha·P + (1-alpha)·R),  alpha = 0.9
    Penalty = gamma · (chunks/matches)^beta,  gamma = 0.5, beta = 3
    score   = Fmean · (1 - Penalty)

with match modules exact (weight 1.0) and Porter-stem (weight 0.6).

Documented deltas vs the jar (accepted; the jar is not shippable without a
JVM): no WordNet synonym / paraphrase-table modules; Porter-with-Snowball-1c
instead of full Snowball stemming; greedy closest-occurrence alignment
instead of the jar's beam-search alignment; 2007 instead of 1.5's WMT-tuned
parameters. **Scores are therefore NOT numerically comparable to jar-based
published numbers** (e.g. the reference README's METEOR 27.2/27.3); compare
METEOR only between runs of this implementation. CaptionScorer prints a
one-time warning to that effect.

Measured accuracy (tests/test_metrics.py::test_meteor_matches_nltk_*): with
the stem weight set to NLTK's unweighted 1.0, segment scores agree with
NLTK 3.10's independent 2007-formulation implementation EXACTLY (delta 0.0)
on caption pairs whose maximal alignment is unique. On pairs with
duplicate-word alignment ambiguity the two diverge (mean |delta| 0.045 over
the 15-pair suite) because NLTK matches the last occurrence while this
implementation picks the closest occurrence — the 2007 paper specifies
choosing the maximal matching with the FEWEST CHUNKS, which closest-occurrence
satisfies on these cases and NLTK does not (verified by hand-computed
golden values in test_meteor_duplicate_alignment_follows_spec).

Corpus score aggregates sufficient statistics over segments (as the jar's
EVAL phase does), not a mean of segment scores.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from recnet_tpu.metrics.stemmer import porter_stem

ALPHA = 0.9
BETA = 3.0
GAMMA = 0.5
W_EXACT = 1.0
W_STEM = 0.6


def _align(hyp: List[str], ref: List[str], stem_weight: float = W_STEM
           ) -> Tuple[List[Tuple[int, int, float]], int]:
    """Two-stage (exact, stem) alignment.

    Returns (matches [(hyp_i, ref_j, weight)], chunks). Greedy: hyp words
    left-to-right pick the closest unmatched ref occurrence (which realizes
    the 2007 spec's fewest-chunks tie-break on duplicate words).
    """
    matches: List[Tuple[int, int, float]] = []
    hyp_used = [False] * len(hyp)
    ref_used = [False] * len(ref)

    def stage(hyp_keys: List[str], ref_keys: List[str], weight: float):
        for i, hk in enumerate(hyp_keys):
            if hyp_used[i]:
                continue
            best = None
            for j, rk in enumerate(ref_keys):
                if ref_used[j] or rk != hk:
                    continue
                d = abs(i - j)
                if best is None or d < best[0]:
                    best = (d, j)
            if best is not None:
                j = best[1]
                hyp_used[i] = True
                ref_used[j] = True
                matches.append((i, j, weight))

    stage(hyp, ref, W_EXACT)
    stage([porter_stem(w) for w in hyp], [porter_stem(w) for w in ref],
          stem_weight)

    matches.sort(key=lambda m: m[0])
    chunks = 0
    prev = None
    for (i, j, _) in matches:
        if prev is None or i != prev[0] + 1 or j != prev[1] + 1:
            chunks += 1
        prev = (i, j)
    return matches, chunks


class _Stats:
    __slots__ = ("w_h", "w_r", "m", "chunks", "len_h", "len_r")

    def __init__(self, w_h=0.0, w_r=0.0, m=0, chunks=0, len_h=0, len_r=0):
        self.w_h, self.w_r, self.m = w_h, w_r, m
        self.chunks, self.len_h, self.len_r = chunks, len_h, len_r

    def __iadd__(self, o):
        self.w_h += o.w_h
        self.w_r += o.w_r
        self.m += o.m
        self.chunks += o.chunks
        self.len_h += o.len_h
        self.len_r += o.len_r
        return self


def _segment_stats(hyp: str, ref: str, stem_weight: float = W_STEM) -> _Stats:
    h, r = hyp.split(), ref.split()
    matches, chunks = _align(h, r, stem_weight)
    w = sum(m[2] for m in matches)
    return _Stats(w_h=w, w_r=w, m=len(matches), chunks=chunks,
                  len_h=len(h), len_r=len(r))


def _score_from_stats(s: _Stats) -> float:
    if s.m == 0 or s.len_h == 0 or s.len_r == 0:
        return 0.0
    p = s.w_h / s.len_h
    r = s.w_r / s.len_r
    if p == 0 or r == 0:
        return 0.0
    fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
    frag = float(s.chunks) / s.m if s.chunks > 0 else 0.0
    penalty = GAMMA * (frag ** BETA)
    return fmean * (1.0 - penalty)


class Meteor:
    """compute_score(gts, res) -> (corpus_score, per-segment scores)."""

    def compute_score(self, gts: Dict[str, List[str]],
                      res: Dict[str, List[str]]):
        assert gts.keys() == res.keys()
        agg = _Stats()
        scores = []
        for iid in gts:
            hyp = res[iid][0]
            best_score, best_stats = 0.0, None
            for ref in gts[iid]:
                st = _segment_stats(hyp, ref)
                sc = _score_from_stats(st)
                if best_stats is None or sc > best_score:
                    best_score, best_stats = sc, st
            scores.append(best_score)
            agg += best_stats
        return _score_from_stats(agg), np.asarray(scores)

    def method(self) -> str:
        return "METEOR"
