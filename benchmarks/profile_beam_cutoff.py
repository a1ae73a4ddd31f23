"""Measure the beam serving length-cutoff's device-time gain at B<=2048.

Methodology (device time from the xplane 'XLA Modules' line — immune to
tunnel wall-clock noise, benchmarks/profile_step.py): the cutoff only
engages on models that emit <EOS> then <PAD> (a model that never
terminates runs to max_len in every variant), so this script first
OVERFITS a real RecNet decoder on the synthetic MSVD fixture for a few
hundred iterations — producing genuine caption-length behavior — then
profiles beam-5 decode over a B=2048 tile of fixture videos:

  scan      — the exact fixed-length scan (the default everywhere)
  while     — early_exit without a cutoff (the reference's all-<PAD>
              break; exact, asserted)
  cutoffK   — length_cutoff_margin=K for K in {2,4,8} (OPT-IN
              approximation)

Prints device ms/call, the speedup, and — the honest part — how many
sentences each cutoff variant changed vs the exact search (measured
r3: 1.94x at margin 2 with 28% sentence churn, margin-insensitive —
the reference's beam keeps accumulating penalized score after EOS, so
the top slot reorders late; this is why the cutoff is opt-in).

Caveat: the fixture vocabulary is small (~tens of words), so the vocab
projection is cheaper than the flagship 4188 — the per-step cost is
lower, but the STEP-COUNT reduction the cutoff delivers is the quantity
under test and transfers directly.

Usage: python benchmarks/profile_beam_cutoff.py [--batch 2048]
       [--train_iters 300] [--beam 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
# NOTE: an env-var here would be read too late (sitecustomize imports
# jax at interpreter start) — activate the persistent compile cache
# through jax.config instead (utils/compile_cache.py explains).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    a = argparse.ArgumentParser()
    a.add_argument("--batch", type=int, default=2048)
    a.add_argument("--train_iters", type=int, default=300)
    a.add_argument("--beam", type=int, default=5)
    a.add_argument("--calls", type=int, default=4)
    args = a.parse_args()

    import jax
    import jax.numpy as jnp

    from recnet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from benchmarks.profile_step import parse_xplane_device_ops
    from fixtures import make_msvd_fixture, tiny_train_config
    from recnet_tpu.data import Corpus
    from recnet_tpu.decoding import beam_decode, tokens_to_sentences
    from recnet_tpu.training.step import init_train_state, build_train_step

    root = tempfile.mkdtemp(prefix="beam_cutoff_fixture_")
    make_msvd_fixture(root)
    # flagship MODEL dims (GRU 512, emb 468, attn 128) over the fixture's
    # small data dims — the per-step cell/attention cost is realistic;
    # only the vocab projection is fixture-sized (caveat above)
    # caption_max_len=30 (the flagship serving setting): fixture captions
    # end well before it, which is exactly the case the cutoff targets —
    # the scan must still run all 31 steps, the cutoff stops at
    # max_last_eos + margin
    tc = tiny_train_config(root, use_recon=False,
                           decoder_learning_rate=5e-3,
                           decoder_hidden_size=512, embedding_size=468,
                           decoder_attn_size=128, batch_size=16,
                           caption_max_len=30)
    corpus = Corpus(tc)
    V = corpus.vocab.n_vocabs
    state, dcfg, _ = init_train_state(jax.random.PRNGKey(0), tc, V)
    step = build_train_step(tc, dcfg, None)

    batches = [(v, c) for _, v, c in corpus.train_batcher]
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.train_iters):
        v, c = batches[i % len(batches)]
        state, m = step(state, jnp.asarray(v), jnp.asarray(c), key)
    loss = float(m["loss"])
    print(f"overfit {args.train_iters} iters in {time.time()-t0:.0f}s, "
          f"final loss {loss:.4f} (vocab {V})", flush=True)

    # B-sized tile of fixture videos
    vids = np.concatenate([v for v, _ in batches], axis=0)
    reps = -(-args.batch // len(vids))
    videos = jnp.asarray(np.tile(vids, (reps, 1, 1))[: args.batch])
    params = state.dec_params
    eos = corpus.vocab.word2idx["<EOS>"]
    max_len = tc.caption_max_len

    variants = {
        "scan": dict(),
        "while": dict(early_exit=True),
        "cutoff2": dict(length_cutoff_margin=2),
        "cutoff4": dict(length_cutoff_margin=4),
        "cutoff8": dict(length_cutoff_margin=8),
    }
    results, sentences = {}, {}
    for name, kw in variants.items():
        fn = lambda v: beam_decode(params, dcfg, v, args.beam, max_len, **kw)
        res = fn(videos)
        np.asarray(res.tokens)      # compile + settle
        trace_dir = tempfile.mkdtemp(prefix=f"beam_{name}_")
        with jax.profiler.trace(trace_dir):
            outs = [fn(videos) for _ in range(args.calls)]
            toks = [np.asarray(r.tokens) for r in outs]
        _, module_ps, n_mod, _ = parse_xplane_device_ops(trace_dir)
        ms = module_ps / 1e9 / max(n_mod, 1)
        results[name] = ms
        n = int(outs[-1].n_steps)
        sentences[name] = tokens_to_sentences(
            toks[-1][:, :n].T, corpus.vocab.idx2word, eos)
        diff = sum(a != b for a, b in zip(sentences["scan"],
                                          sentences[name]))
        print(f"{name:8s}: {ms:8.2f} ms/call device "
              f"({n_mod} modules traced), n_steps={n}, "
              f"sentences != scan: {diff}/{args.batch} "
              f"({100 * diff / args.batch:.2f}%), "
              f"speedup {results['scan'] / ms:.2f}x", flush=True)

    assert sentences["while"] == sentences["scan"], \
        "plain early_exit must be exact"


if __name__ == "__main__":
    main()
