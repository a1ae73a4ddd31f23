"""Ablation profile of the whole-decode Pallas kernel.

The xplane profiler cannot see inside a Pallas kernel (it is one fused op),
so per-part cost is attributed by SUBTRACTION: compile kernel variants with
one part stubbed out (the ``ablate`` knob in ops/pallas/whole_decode.py),
time each at the same shape, and report full_time - variant_time as that
part's cost. Parts:

  emb     one-hot (TB,V)@(V,E) embedding-gather matmul
  attn    the whole 28-frame attention block
  score1  ... keeping everything but the 28 (A,1) score matvecs
  fma     ... keeping everything but the 28 (TB,F) context FMAs
  argmax  the per-step argmax over (TB, V) (proj kept)
  proj    the (TB,H)@(H,V) output projection + argmax

Timing is fetch-based best-of-N through the axon tunnel (block_until_ready
returns early there — NOTES.md). Each variant is a fresh compile (40-120 s
through the tunnel) cached in .jax_cache for reruns.

Usage: python benchmarks/profile_whole_decode.py [--batch 16384]
       [--block_b 256] [--rounds 3] [--ablate emb attn ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# NOTE: an env-var here would be read too late (sitecustomize imports
# jax at interpreter start) — activate the persistent compile cache
# through jax.config instead (utils/compile_cache.py explains).

import numpy as np
import jax
import jax.numpy as jnp

from recnet_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

from recnet_tpu.config import TrainConfig
from recnet_tpu.models import decoder as dec_mod
from recnet_tpu.ops import attention as attn_ops
from recnet_tpu.ops.pallas.whole_decode import whole_greedy_decode

DEFAULT_ABLATIONS = ["", "emb", "attn", "score1", "fma", "argmax", "proj"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--block_b", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--ablate", nargs="*", default=None)
    args = ap.parse_args()
    ablations = DEFAULT_ABLATIONS if args.ablate is None else args.ablate

    tc = TrainConfig()
    vocab = 4188
    cfg = dec_mod.config_from_train(tc, vocab)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    enc = jax.jit(lambda k: jax.random.normal(
        k, (args.batch, tc.encoder_output_len, tc.encoder_output_size),
        jnp.bfloat16))(jax.random.PRNGKey(1))
    enc.block_until_ready()
    uv = attn_ops.precompute_uv(params["attention"], enc)
    r = params["rnn"][0]
    bias2 = jnp.stack([r["b_ih"], r["b_hh"]])
    T = tc.caption_max_len + 1
    rows_steps = args.batch * T

    results = {}
    for ab in ablations:
        # "dual" selects the experimental interleaved-halves kernel
        # rather than an ablation of the production one
        fn = lambda e, u, ab=ab: whole_greedy_decode(
            params, e, u, bias2, emb_size=cfg.embedding_size,
            max_len=tc.caption_max_len, block_b=args.block_b,
            sos=cfg.sos_token, cell_type=cfg.cell_type,
            ablate="" if ab == "dual" else ab, dual=(ab == "dual"))
        t0 = time.perf_counter()
        np.asarray(fn(enc, uv))
        t_first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            outs = [fn(enc, uv) for _ in range(args.iters)]
            for o in outs:
                np.asarray(o)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results[ab or "full"] = best
        print(f"[{ab or 'full':8s}] first(compile) {t_first:6.1f}s  "
              f"best {best * 1e3:7.2f} ms  "
              f"{best / rows_steps * 1e9:6.1f} ns/row*step", flush=True)

    full = results.get("full")
    if full:
        print("\nattribution (full - variant):")
        for ab, t in results.items():
            if ab == "full":
                continue
            print(f"  {ab:8s} {1e3 * (full - t):7.2f} ms "
                  f"({100 * (full - t) / full:5.1f}% of full)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
