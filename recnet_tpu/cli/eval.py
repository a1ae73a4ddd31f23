"""CLI: python -m recnet_tpu.cli.eval --ckpt <dir>/<step> [--beam 5]

Mirrors reference eval.py:172-208: load checkpoint, rebuild the decoder,
decode the test split with beam search, print scores. Unlike the reference,
the vocab comes from the checkpoint itself (no corpus re-scan needed).
"""

from __future__ import annotations

import argparse

import jax

from recnet_tpu import checkpoint as ckpt
from recnet_tpu.data import Corpus
from recnet_tpu.evaluation import evaluate
from recnet_tpu.training.step import init_train_state


def main(argv=None):
    # honor JAX_COMPILATION_CACHE_DIR even though sitecustomize froze
    # jax config before this process's env lines could run
    from recnet_tpu.utils.compile_cache import enable_compile_cache_if_configured
    enable_compile_cache_if_configured()
    a = argparse.ArgumentParser()
    a.add_argument("--ckpt", type=str, required=True,
                   help="checkpoint step directory")
    a.add_argument("--beam", type=int, default=5)
    a.add_argument("--greedy", action="store_true")
    a.add_argument("--data_root", type=str, default=None,
                   help="override the data root stored in the checkpoint")
    a.add_argument("--use_pallas", action="store_true", default=None,
                   help="use the Pallas whole-decode / top-K kernels "
                        "(default: whatever the checkpoint trained with)")
    a.add_argument("--greedy_segment", type=int, default=None,
                   help="with Pallas + --greedy: run the whole-decode "
                        "kernel in N-step segments with device-level "
                        "early exit once every row has its first <EOS> — "
                        "sentence-exact, skips the dead tail (default: "
                        "the checkpoint's setting)")
    args = a.parse_args(argv)

    tc, vocab = ckpt.load_config_and_vocab(args.ckpt)
    if args.data_root:
        tc = tc.replace(data_root=args.data_root)
    if args.use_pallas is not None:
        tc = tc.replace(use_pallas=args.use_pallas)
    if args.greedy_segment is not None:
        tc = tc.replace(greedy_segment=args.greedy_segment)
    # only the score loader + test GTs are needed (reference eval.py:178-181).
    # data_bundle is turned off too: a checkpoint trained with --data_bundle
    # would otherwise make this eval-only corpus stat/pack ALL three splits
    # (the bundle key covers every input file), which breaks on hosts that
    # only carry the test split.
    tc = tc.replace(build_train_data_loader=False,
                    build_val_data_loader=False,
                    build_test_data_loader=True,
                    build_score_data_loader=True,
                    data_bundle=False)

    state, dcfg, rcfg = init_train_state(
        jax.random.PRNGKey(0), tc, vocab.n_vocabs)
    state, meta = ckpt.load_checkpoint(args.ckpt, state)
    corpus = Corpus(tc, vocab=vocab)

    search = "greedy" if args.greedy else ("beam", args.beam)
    scores = evaluate(tc, corpus, state.dec_params, dcfg, search)
    print(scores)


if __name__ == "__main__":
    main()
