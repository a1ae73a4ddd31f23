"""Headline benchmark: greedy-decode throughput (captions/sec) on the
flagship MSVD RecNet decoder (GRU 512, vocab 4188, 28x1536 InceptionV4
features, 31 decode steps).

The reference publishes no throughput numbers (SURVEY §6); the baseline is
the BASELINE.json north star: 10,000 captions/sec greedy decode on one TPU
v5e chip. vs_baseline = value / 10000.

Prints ONE JSON line (the best measurement).

Self-budgeted orchestration: each (path, batch) attempt runs in a FRESH
subprocess with its own timeout, smallest batch first so a result is locked
in early, larger batches only while the overall budget lasts. Rationale
(measured): remote compiles through the axon tunnel are phase-dependent —
B=4096 compiles in ~1-2 min, but the same kernel at B=32768 took >25 min
in a bad phase (a wedged compile must not zero the benchmark). A
persistent JAX compilation cache (.jax_cache/) makes repeat runs of any
already-compiled shape start in seconds.

If no attempt lands within the budget, remaining slots retry the
cheapest attempt rather than report zero.

Env knobs: BENCH_BUDGET_S (total, default 2700), BENCH_ATTEMPT_S (per
attempt, default 720).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_CAPTIONS_PER_SEC = 10000.0
REPO = os.path.dirname(os.path.abspath(__file__))

# smallest/cheapest-compile first: lock in a result early, then improve.
# measured captions/s on v5e (bf16): 1024 -> ~25-40k, 4096 -> ~70-90k,
# 16384 -> ~130-160k, 32768 -> ~185k (when its compile completes). In the
# worst observed tunnel phase a TRIVIAL jit took 258 s to compile, so even
# the cheap attempts need generous timeouts.
ATTEMPTS = [
    {"batch": 1024, "path": "xla_unroll4"},
    {"batch": 4096, "path": "pallas_whole", "block_b": 128},
    {"batch": 16384, "path": "pallas_whole", "block_b": 256},
    {"batch": 16384, "path": "xla_unroll4"},
    {"batch": 32768, "path": "pallas_whole", "block_b": 256},
]


def _measure_single(batch: int, path: str, block_b: int) -> None:
    """Child-process mode: measure one (path, batch) and print one JSON."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from recnet_tpu.config import TrainConfig
    from recnet_tpu.decoding import greedy_decode, greedy_decode_whole
    from recnet_tpu.models import decoder as dec_mod

    tc = TrainConfig()
    vocab_size = 4188
    dcfg = dec_mod.config_from_train(tc, vocab_size)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(0), dcfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    videos = jnp.asarray(rng.standard_normal(
        (batch, tc.encoder_output_len, tc.encoder_output_size),
    ).astype(np.float32)).astype(jnp.bfloat16)

    if path == "pallas_whole":
        fn = lambda v: greedy_decode_whole(
            params, dcfg, v, tc.caption_max_len, block_b=block_b)
    else:
        fn = lambda v: greedy_decode(
            params, dcfg, v, tc.caption_max_len, unroll=4)

    # warmup/compile; np.asarray forces completion + fetch (the axon
    # tunnel's block_until_ready returns early, so timing must fetch)
    t0 = time.perf_counter()
    np.asarray(fn(videos).tokens)
    warm = time.perf_counter() - t0  # post-compile dispatch+fetch cost
    t0 = time.perf_counter()
    np.asarray(fn(videos).tokens)
    warm = min(warm, time.perf_counter() - t0)
    # adapt the measurement volume to the observed per-call latency so a
    # degraded tunnel phase (30+ s per call observed) can't blow the
    # attempt window; a good phase keeps the full best-of-4 x 5
    if warm > 20:
        rounds, n_iters = 1, 2
    elif warm > 5:
        rounds, n_iters = 2, 3
    else:
        rounds, n_iters = 4, 5
    best = 0.0
    for _attempt in range(rounds):  # best-of-N: the tunnel swings ~1.7x
                                    # between phases (NOTES.md)
        t0 = time.perf_counter()
        # dispatch all, then fetch: device serializes compute while D2H
        # overlaps (serving-style pipelining)
        results = [fn(videos) for _ in range(n_iters)]
        for r in results:
            np.asarray(r.tokens)
        dt = time.perf_counter() - t0
        best = max(best, batch * n_iters / dt)
    print(json.dumps({"captions_per_sec": best,
                      "device": str(jax.devices()[0])}))


def main():
    budget = float(os.environ.get("BENCH_BUDGET_S", 2700))
    attempt_s = float(os.environ.get("BENCH_ATTEMPT_S", 720))
    deadline = time.time() + budget

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))

    best, best_att, device = 0.0, None, "?"
    for i, att in enumerate(ATTEMPTS):
        remaining = deadline - time.time()
        if best > 0 and remaining < attempt_s:
            break   # keep the result we have rather than risk the budget
        if best == 0 and i > 0 and remaining < attempt_s:
            att = ATTEMPTS[0]   # last gasp: retry the cheapest attempt
        # with no result yet, a retry gets the FULL attempt window even
        # past the soft deadline — overrunning the budget beats printing
        # zero (the worst observed phase compiled a trivial jit in 258 s)
        window = attempt_s if best == 0 else max(60.0,
                                                 min(attempt_s, remaining))
        code = (f"import bench; bench._measure_single("
                f"{att['batch']}, '{att['path']}', {att.get('block_b', 0)})")
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], cwd=REPO, env=env,
                capture_output=True, text=True, timeout=window)
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
            out = json.loads(line)
            if out["captions_per_sec"] > best:
                best, best_att, device = (out["captions_per_sec"], att,
                                          out["device"])
        except Exception as e:  # timeout / compile wedge / parse failure
            print(f"bench attempt {att} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)

    detail = {"decode_steps": 31, "vocab": 4188, "dtype": "bfloat16",
              "device": device}
    if best_att:
        detail["batch_size"] = best_att["batch"]
        detail["path"] = best_att["path"]
    print(json.dumps({
        "metric": "captions_per_sec_greedy",
        "value": round(best, 1),
        "unit": "captions/s",
        "vs_baseline": round(best / BASELINE_CAPTIONS_PER_SEC, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
