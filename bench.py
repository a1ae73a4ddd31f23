"""Headline benchmark: greedy-decode throughput (captions/sec) on the
flagship MSVD RecNet decoder (GRU 512, vocab 4188, 28x1536 InceptionV4
features, 31 decode steps).

The reference publishes no throughput numbers (SURVEY §6); the baseline is
the BASELINE.json north star: 10,000 captions/sec greedy decode on one TPU
v5e chip. vs_baseline = value / 10000.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_CAPTIONS_PER_SEC = 10000.0


def main():
    import jax
    import jax.numpy as jnp

    from recnet_tpu.config import TrainConfig
    from recnet_tpu.decoding import greedy_decode, greedy_decode_whole
    from recnet_tpu.models import decoder as dec_mod

    tc = TrainConfig()
    vocab_size = 4188
    dcfg = dec_mod.config_from_train(tc, vocab_size)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(0), dcfg)
    # bf16 serving config (standard TPU inference precision)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params)

    rng = np.random.default_rng(0)
    best = 0.0
    best_batch = 0
    best_path = ""
    paths = {
        "xla_scan_unroll4": lambda v: greedy_decode(
            params, dcfg, v, tc.caption_max_len, unroll=4),
        "pallas_whole_decode": lambda v: greedy_decode_whole(
            params, dcfg, v, tc.caption_max_len, block_b=256),
    }
    for batch in (32768,):  # one size: each (path, batch) costs a ~60-120s
                            # remote compile through the dev tunnel. Large
                            # batch amortizes the tunnel's per-call cost
                            # (measured 86k c/s at B=4096 -> 184k at 32768
                            # for the same kernel)
        videos = jnp.asarray(rng.standard_normal(
            (batch, tc.encoder_output_len, tc.encoder_output_size),
        ).astype(np.float32)).astype(jnp.bfloat16)
        for name, fn in paths.items():
            try:
                # warmup/compile; np.asarray forces completion + fetch (the
                # axon tunnel's block_until_ready returns early, so timing
                # must fetch)
                np.asarray(fn(videos).tokens)
                n_iters = 5
                for _attempt in range(4):  # best-of-4: the tunnel swings
                                           # ~1.7x between phases (NOTES.md)
                    t0 = time.perf_counter()
                    # dispatch all, then fetch: device serializes compute
                    # while D2H overlaps (serving-style pipelining)
                    results = [fn(videos) for _ in range(n_iters)]
                    for r in results:
                        np.asarray(r.tokens)
                    dt = time.perf_counter() - t0
                    cps = batch * n_iters / dt
                    if cps > best:
                        best, best_batch, best_path = cps, batch, name
            except Exception as e:   # one failing path must not kill bench
                import sys
                print(f"bench path {name} failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "captions_per_sec_greedy",
        "value": round(best, 1),
        "unit": "captions/s",
        "vs_baseline": round(best / BASELINE_CAPTIONS_PER_SEC, 3),
        "detail": {"batch_size": best_batch, "decode_steps": 31,
                   "vocab": vocab_size, "dtype": "bfloat16",
                   "path": best_path,
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
