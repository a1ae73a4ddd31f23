"""Measure the HBM feature-cache upload at MSR-VTT scale per storage dtype.

The data-bundle work (data/bundle.py) removed host-side prep from warm
starts, leaving the one-time cache upload as the dominant setup cost on
tunneled links (NOTES.md: 1069 MiB f32 ≈ most of the 30.5 s warm setup).
``config.feature_cache_dtype`` halves that for bf16/f16 storage; this
script measures the actual device_put wall time per dtype on the real
chip. Timing rule from NOTES.md: never trust ``block_until_ready``
through the tunnel — force completion by fetching a value computed from
the uploaded array.

Usage: python benchmarks/profile_cache_upload.py [--videos 6513]
(6513 = the official MSR-VTT train split; 28x1536 f32 frames = 1069 MiB.)
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=6513)
    ap.add_argument("--frames", type=int, default=28)
    ap.add_argument("--feat", type=int, default=1536)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import ml_dtypes  # host-side bf16 without touching the device
    from recnet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    rng = np.random.default_rng(0)
    base = rng.standard_normal(
        (args.videos, args.frames, args.feat)).astype(np.float32)

    @jax.jit
    def probe(cache):
        # tiny reduction over the LAST row: fetching it cannot resolve
        # before the whole transfer committed
        return jnp.sum(cache[-1].astype(jnp.float32))

    results = {}
    for name, dt in (("float32", np.float32),
                     ("bfloat16", ml_dtypes.bfloat16),
                     ("float16", np.float16)):
        host = base.astype(dt)
        mib = host.nbytes / 2**20
        # untimed warmup at the FULL shape (jit caches per shape+dtype):
        # the probe's compile must not land inside the first timed repeat —
        # with --repeats 1 it inflated the reported best by the whole
        # compile (ADVICE r4; the "118 s first attempt" NOTES artifact)
        warm = jax.device_put(host)
        float(np.asarray(probe(warm)))
        del warm
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            dev = jax.device_put(host)
            float(np.asarray(probe(dev)))  # force transfer completion
            times.append(time.time() - t0)
            del dev
        best = min(times)
        results[name] = {"mib": round(mib, 1), "upload_s": round(best, 2),
                         "mib_per_s": round(mib / best, 1)}
        print(f"[cache-upload] {name}: {mib:.0f} MiB in {best:.2f} s "
              f"({mib / best:.0f} MiB/s)")

    f32 = results["float32"]["upload_s"]
    for name in ("bfloat16", "float16"):
        results[name]["speedup_vs_f32"] = round(f32 / results[name]["upload_s"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
