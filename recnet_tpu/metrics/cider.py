"""CIDEr — Python 3 reimplementation of the vendored scorer.

Matches reference coco_caption/pycocoevalcap/cider/cider_scorer.py: document
frequency over reference sets (:93-104), tf·idf vectors with
ref_len = log(#images) (:107-131,162), clipped cosine similarity with a
gaussian length penalty sigma=6 (:133-159), mean over 1..4-grams ×10 divided
by #refs (:162-181).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List

import numpy as np


def _ngram_counts(s: str, n: int = 4) -> Dict[tuple, int]:
    words = s.split()
    counts: Dict[tuple, int] = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            counts[tuple(words[i:i + k])] += 1
    return counts


class Cider:
    def __init__(self, n: int = 4, sigma: float = 6.0):
        self.n = n
        self.sigma = sigma

    def compute_score(self, gts: Dict[str, List[str]],
                      res: Dict[str, List[str]]):
        assert gts.keys() == res.keys()
        ids = list(gts.keys())
        crefs = [[_ngram_counts(r, self.n) for r in gts[iid]] for iid in ids]
        ctest = [_ngram_counts(res[iid][0], self.n) for iid in ids]

        # document frequency over ref sets (cider_scorer.py:93-104)
        document_frequency: Dict[tuple, float] = defaultdict(float)
        for refs in crefs:
            for ngram in set(ng for ref in refs for ng in ref):
                document_frequency[ngram] += 1

        ref_len = np.log(float(len(crefs)))      # cider_scorer.py:162

        def counts2vec(cnts):
            vec = [defaultdict(float) for _ in range(self.n)]
            norm = [0.0] * self.n
            length = 0
            for ngram, tf in cnts.items():
                df = np.log(max(1.0, document_frequency[ngram]))
                k = len(ngram) - 1
                vec[k][ngram] = float(tf) * (ref_len - df)
                norm[k] += vec[k][ngram] ** 2
                if k == 1:                        # quirk: bigram count as length
                    length += tf
            return vec, [math.sqrt(x) for x in norm], length

        def sim(vh, vr, nh, nr, lh, lr):
            delta = float(lh - lr)
            val = np.zeros(self.n)
            for k in range(self.n):
                for ngram in vh[k]:
                    # clipped tf-idf product (cider_scorer.py:151)
                    val[k] += min(vh[k][ngram], vr[k][ngram]) * vr[k][ngram]
                if nh[k] != 0 and nr[k] != 0:
                    val[k] /= nh[k] * nr[k]
                val[k] *= math.e ** (-(delta ** 2) / (2 * self.sigma ** 2))
            return val

        scores = []
        for test, refs in zip(ctest, crefs):
            vec, norm, length = counts2vec(test)
            score = np.zeros(self.n)
            for ref in refs:
                vr, nr, lr = counts2vec(ref)
                score += sim(vec, vr, norm, nr, length, lr)
            scores.append(float(np.mean(score) / len(refs) * 10.0))
        return float(np.mean(scores)), np.asarray(scores)

    def method(self) -> str:
        return "CIDEr"
