"""Test-set decoding + scoring — the reference's evaluate() (eval.py:123-169).

Decodes the score batcher with greedy or beam search (both jitted fixed-shape
programs from recnet_tpu.decoding), truncates to the first n_test videos,
writes predictions.txt, and scores with the JVM-free CaptionScorer.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import numpy as np

from recnet_tpu.decoding import (beam_decode, greedy_decode,
                                 tokens_to_sentences)
from recnet_tpu.metrics import CaptionScorer, gts_from_pairs, res_from_dict


def decode_batch(decoder_params, dcfg, videos, search_method, max_len: int,
                 use_pallas: bool = False, mesh=None,
                 greedy_segment: int = 0):
    """Returns (n_steps, B) int token array, truncated like the reference.

    ``mesh`` is set on multi-host runs: the sharded params make decoding a
    global SPMD program, so the videos are replicated over the mesh (all
    ranks hold the identical batch) and the token outputs come back
    replicated — fetchable on every rank."""
    import jax.numpy as jnp

    if mesh is not None:
        from recnet_tpu.parallel import distributed as dist
        from recnet_tpu.parallel import mesh as mesh_lib
        videos = dist.put_global(np.asarray(videos),
                                 mesh_lib.replicated(mesh))
    else:
        videos = jnp.asarray(videos)
    if isinstance(search_method, str) and search_method == "greedy":
        from recnet_tpu.decoding import pallas_supported

        B = videos.shape[0]
        if use_pallas and pallas_supported(dcfg, "greedy_whole"):
            from recnet_tpu import decoding as dec
            block = 128 if B % 128 == 0 else B
            if greedy_segment:
                # segmented kernel with device-level early exit
                # (eos_stop): the scored artifact is the SENTENCE list
                # (tokens_to_sentences cuts every row at its first <EOS>),
                # and greedy rows are independent, so skipping the dead
                # tail past everyone's first <EOS> is sentence-exact —
                # predictions.txt and all metric scores are unchanged
                # (measured 2.32x device at B=2048/segment=4 on a trained
                # model; benchmarks/profile_whole_segmented.py)
                res = dec.greedy_decode_whole_segmented(
                    decoder_params, dcfg, videos, max_len, block_b=block,
                    segment=greedy_segment, eos_stop=True)
            else:
                res = dec.greedy_decode_whole(
                    decoder_params, dcfg, videos, max_len, block_b=block)
        else:
            res = greedy_decode(decoder_params, dcfg, videos, max_len)
        n = int(res.n_steps)
        return np.asarray(res.tokens)[:n]                     # (n, B)
    elif isinstance(search_method, (tuple, list)) and search_method[0] == "beam":
        from recnet_tpu.decoding import pallas_supported

        beam_width = int(search_method[1])
        # honor tc.use_pallas on the beam path too (round-3 gap: only
        # greedy took the kernel here while serving.Captioner wired it) —
        # the fused projection+top-K kernel is f32 token-exact vs XLA
        res = beam_decode(decoder_params, dcfg, videos, beam_width, max_len,
                          use_pallas_topk=(use_pallas and pallas_supported(
                              dcfg, "beam_topk")))
        n = int(res.n_steps)
        # reference transposes the (B, n) beam output to (n, B) (eval.py:148-149)
        return np.asarray(res.tokens)[:, :n].T
    raise NotImplementedError(f"Unknown search method: {search_method}")


def evaluate(tc, corpus, decoder_params, dcfg, search_method,
             predictions_fpath: Optional[str] = "predictions.txt",
             n_test: Optional[int] = None, mesh=None,
             score_on_host: bool = True) -> Dict[str, float]:
    """Full score-set decode + metric pass (reference: eval.py:123-169).

    ``score_on_host=False`` skips the host-side CaptionScorer pass and
    returns ``{}`` — used by non-primary ranks in multi-host runs, which
    must participate in the SPMD decode but would otherwise burn host CPU
    recomputing scores that only the primary logs (ADVICE r2)."""
    n_test = n_test if n_test is not None else tc.n_test
    eos = corpus.vocab.word2idx["<EOS>"]

    # device-resident score features: reuse one upload across the periodic
    # test evals (config.device_feature_cache; single-host + deterministic
    # sampling only — the mesh path replicates per call via put_global)
    batches = corpus.score_batcher
    if (getattr(tc, "device_feature_cache", False) and mesh is None
            and tc.frame_sampling_method == "uniform"
            and hasattr(corpus, "score_batches_device")):
        batches = corpus.score_batches_device()

    total_vids = []
    total_pd = []
    for vids, videos in batches:
        tokens = decode_batch(decoder_params, dcfg, videos, search_method,
                              tc.caption_max_len,
                              use_pallas=getattr(tc, "use_pallas", False),
                              mesh=mesh,
                              greedy_segment=getattr(tc, "greedy_segment", 0))
        total_vids += list(vids)
        total_pd += tokens_to_sentences(tokens, corpus.vocab.idx2word, eos)

    total_vids = total_vids[:n_test]
    total_pd = total_pd[:n_test]

    if predictions_fpath:
        with open(predictions_fpath, "w") as fout:
            for vid, caption in zip(total_vids, total_pd):
                fout.write("{}\t\t{}\n".format(vid, caption))

    if not score_on_host:
        return {}

    pd_dict = defaultdict(list)
    for vid, caption in zip(total_vids, total_pd):
        if vid != "PAD":
            pd_dict[vid].append(caption)

    gts = gts_from_pairs(
        [(vid, cap) for vid, cap in corpus.test_dataset.video_caption_pairs])
    res = res_from_dict(pd_dict)
    # score only vids present in both (batch padding adds none)
    ids = [i for i in gts.keys() if i in res]
    scorer = CaptionScorer(gts, res, image_ids=ids,
                           meteor_version=getattr(tc, "meteor_version",
                                                  "2007"))
    return scorer.evaluate()
