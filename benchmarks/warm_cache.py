"""Session-start compile-cache warmer (VERDICT r3 item 8).

``.jax_cache/`` has been observed EMPTY at session start (host re-image,
NOTES.md round 3), and the first ``bench.py`` attempts then run degraded:
each new HLO costs 40-120 s through the axon tunnel — the worst observed
phase took >25 min for the B=49152 whole-decode kernel, blowing the bench
attempt window. This script pushes every shape ``python bench.py``
measures — plus the flagship train-step program — through the NORMAL jit
path once, each in a fresh subprocess with a generous per-shape timeout,
so a later (driver) bench run compiles from cache in seconds.

NOT an AOT wrapper: ``jax.jit(fn).lower().compile()`` around the already-
@jit'd decode fns produces a DIFFERENT outer HLO that cache-misses and
recompiles for minutes (measured, NOTES.md round 3). The children call
``bench._setup_decode`` — the exact entry points the benchmark measures —
and the real ``build_train_step`` program.

Usage:
    python benchmarks/warm_cache.py              # bench shapes + train step
    python benchmarks/warm_cache.py --profiles   # + whole-decode ablation
                                                 #   variants (7 compiles)
    make warm

Env: WARM_SHAPE_S      per-shape subprocess timeout (default 1800 s —
                       sized for the worst observed degraded-phase compile)
     WARM_PROFILE_S    timeout for the --profiles ablation sweep (default
                       3600 s: 7 kernel variants, each a fresh compile)

Exit status: 0 if every requested shape warmed, 1 otherwise (failures are
logged and do not stop the remaining shapes).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- children

def _warm_decode(batch: int, path: str, block_b: int) -> None:
    """Compile + run one bench decode shape once (child-process mode)."""
    sys.path.insert(0, REPO)
    import numpy as np
    import bench

    t0 = time.perf_counter()
    fn, videos = bench._setup_decode(batch, path, block_b)
    _log(f"[warm {path}/B={batch}] setup: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    out = fn(videos)
    np.asarray(out.tokens)      # fetch = the only reliable completion
                                # signal through the tunnel (NOTES.md)
    _log(f"[warm {path}/B={batch}] first call (compile or cache hit + "
         f"run + fetch): {time.perf_counter() - t0:.1f}s")
    print("ok")


def _warm_train_step(batch: int, recon: str) -> None:
    """Compile + run the flagship train step once (child-process mode)."""
    sys.path.insert(0, REPO)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from recnet_tpu.config import TrainConfig
    from recnet_tpu.training.step import init_train_state, build_train_step

    tc = TrainConfig(batch_size=batch,
                     use_recon=recon != "none",
                     reconstructor_type=recon if recon != "none" else "global")
    V = 4188
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    step = build_train_step(tc, dcfg, rcfg)

    rng = np.random.default_rng(0)
    B, T = tc.batch_size, tc.caption_max_len + 1
    videos = jnp.asarray(
        rng.standard_normal((B, 28, 1536)).astype(np.float32))
    caps = np.zeros((T, B), np.int32)
    for b in range(B):
        L = int(rng.integers(5, T))
        caps[: L - 1, b] = rng.integers(3, V, L - 1)
        caps[L - 1, b] = 2
    caps = jnp.asarray(caps)

    t0 = time.perf_counter()
    state, m = step(state, videos, caps, jax.random.PRNGKey(1))
    loss = float(m["loss"])
    _log(f"[warm train/{recon}/B={batch}] first step (compile or cache "
         f"hit + run + fetch): {time.perf_counter() - t0:.1f}s "
         f"(loss {loss:.3f})")
    print("ok")


# ------------------------------------------------------------------ parent

def _targets(profiles: bool):
    sys.path.insert(0, REPO)
    import bench

    out = []
    for att in bench.ATTEMPTS:
        out.append({"kind": "decode", "batch": att["batch"],
                    "path": att["path"], "block_b": att.get("block_b", 0)})
    # the flagship train-step program (reference recipe: B=100, global
    # recon) — what benchmarks/profile_step.py compiles. NOTE: this is the
    # UNCACHED step; full_recipe_run's default path compiles
    # build_train_step_cached, whose HLO depends on the corpus's feature-
    # cache row count and vocab size, so it cannot be pre-warmed here —
    # instead the recipe activates the persistent compile cache itself
    # (enable_compile_cache), making its own second run warm (measured
    # 653.7s cold -> 30.5s, benchmarks/bundle_demo_warm.json).
    out.append({"kind": "train", "batch": 100, "recon": "global"})
    if profiles:
        # the 7 ablation-variant kernels profile_whole_decode compiles;
        # delegating to the script itself keeps the HLOs drift-free
        out.append({"kind": "ablate_sweep"})
    return out


def _run_target(tgt: dict, env: dict, timeout: float) -> bool:
    if tgt["kind"] == "decode":
        code = (f"import sys; sys.path.insert(0, {REPO!r}); "
                f"from benchmarks import warm_cache as w; "
                f"w._warm_decode({tgt['batch']}, '{tgt['path']}', "
                f"{tgt['block_b']})")
        argv = [sys.executable, "-c", code]
        label = f"decode {tgt['path']}/B={tgt['batch']}"
    elif tgt["kind"] == "train":
        code = (f"import sys; sys.path.insert(0, {REPO!r}); "
                f"from benchmarks import warm_cache as w; "
                f"w._warm_train_step({tgt['batch']}, '{tgt['recon']}')")
        argv = [sys.executable, "-c", code]
        label = f"train {tgt['recon']}/B={tgt['batch']}"
    else:   # ablate_sweep
        argv = [sys.executable,
                os.path.join(REPO, "benchmarks", "profile_whole_decode.py"),
                "--rounds", "1"]
        label = "whole-decode ablation sweep"
        timeout = float(os.environ.get("WARM_PROFILE_S", 3600))

    t0 = time.time()
    try:
        proc = subprocess.run(argv, cwd=REPO, env=env, timeout=timeout)
        ok = proc.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    _log(f"[warm] {label}: {'ok' if ok else 'FAILED'} "
         f"({time.time() - t0:.0f}s)")
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--profiles", action="store_true",
                    help="also warm the whole-decode ablation variants")
    args = ap.parse_args()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cache_dir = env.setdefault("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(REPO, ".jax_cache"))
    n0 = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    _log(f"[warm] cache {cache_dir}: {n0} entries at start")

    timeout = float(os.environ.get("WARM_SHAPE_S", 1800))
    t_start = time.time()
    results = [(t, _run_target(t, env, timeout)) for t in _targets(
        args.profiles)]
    n1 = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    failed = [t for t, ok in results if not ok]
    summary = {"warmed": len(results) - len(failed), "failed": len(failed),
               "cache_entries": n1, "cache_entries_added": n1 - n0,
               "wall_s": round(time.time() - t_start, 1)}
    print(json.dumps(summary), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
