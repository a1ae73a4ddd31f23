"""bf16 mixed-precision TRAINING evidence at the reference recipe (B=100).

``config.train_precision="bfloat16"`` runs the forward/backward in bf16
while params, optimizer state, and the loss reduction stay f32. Round 4
shipped the knob with only a B=1024 speed number; this script produces the
decision-grade evidence (VERDICT r4 weak #4):

1. **step time** f32 vs bf16 at the reference recipe itself (batch 100,
   global recon, 28x1536 features) — chained-dispatch wall plus true
   device time from the xplane 'XLA Modules' line (profile_step.py's
   parser; never sum 'XLA Ops');
2. **loss-trajectory drift**: 150 iterations from identical init on an
   identical batch stream, f32 vs bf16 — per-iteration relative loss
   divergence (the same window the torch-parity harness uses,
   tests/test_trajectory.py, so the numbers are comparable: torch-vs-JAX
   f32 agreement is ~1e-6 relative there).

The final-score comparison at recipe scale lives in full_recipe_run.py
(--train_precision); DESIGN.md §7 records all three together with the
recommendation.

Usage: python benchmarks/profile_bf16_train.py [--steps 100] [--iters 150]
Writes benchmarks/bf16_train_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _make_batches(tc, V, n_batches, seed=0):
    """A small cycle of realistic batches: fixed features, variable-length
    captions — enough structure for the loss to move over 150 iters."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    B, T = tc.batch_size, tc.caption_max_len + 1
    out = []
    for _ in range(n_batches):
        videos = jnp.asarray(rng.standard_normal(
            (B, tc.encoder_output_len, tc.encoder_output_size)
        ).astype(np.float32))
        caps = np.zeros((T, B), np.int32)
        for b in range(B):
            L = int(rng.integers(5, T))
            caps[: L - 1, b] = rng.integers(3, V, L - 1)
            caps[L - 1, b] = 2
        out.append((videos, jnp.asarray(caps)))
    return out


def _build(tc, V):
    import jax

    from recnet_tpu.training.step import build_train_step, init_train_state

    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    return state, build_train_step(tc, dcfg, rcfg)


def measure_step_time(tc, V, steps):
    """Chained-dispatch wall + xplane device ms/step for one precision."""
    import jax

    from profile_step import parse_xplane_device_ops

    state, step = _build(tc, V)
    (videos, caps), = _make_batches(tc, V, 1)
    key = jax.random.PRNGKey(1)
    for _ in range(3):                         # compile + settle
        state, m = step(state, videos, caps, key)
    _ = float(m["loss"])

    # wall OUTSIDE the trace: the profiler adds per-dispatch host overhead
    # through the tunnel that inflates wall ~15x and says nothing about
    # device throughput
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, videos, caps, key)
    _ = float(m["loss"])                       # force completion
    wall_ms = (time.perf_counter() - t0) / steps * 1e3

    trace_dir = f"/tmp/recnet_bf16_profile_{tc.train_precision}"
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, m = step(state, videos, caps, key)
        _ = float(m["loss"])                   # force completion in-trace
    _, module_ps, _, _ = parse_xplane_device_ops(trace_dir)
    return {"wall_ms_per_step": round(wall_ms, 2),
            "device_ms_per_step": round(module_ps / 1e9 / steps, 2)}


def measure_trajectory_drift(tc_f32, tc_bf16, V, iters):
    """150-iteration loss curves from identical init/batches, f32 vs bf16."""
    import jax

    batches = _make_batches(tc_f32, V, 10)
    losses = {}
    for name, tc in (("float32", tc_f32), ("bfloat16", tc_bf16)):
        state, step = _build(tc, V)
        key = jax.random.PRNGKey(1)
        curve = []
        for i in range(iters):
            videos, caps = batches[i % len(batches)]
            state, m = step(state, videos, caps, key)
            curve.append(float(m["loss"]))
        losses[name] = curve
    f32 = np.asarray(losses["float32"])
    b16 = np.asarray(losses["bfloat16"])
    rel = np.abs(b16 - f32) / np.maximum(np.abs(f32), 1e-12)
    return {
        "iters": iters,
        "loss_first": {"float32": round(float(f32[0]), 6),
                       "bfloat16": round(float(b16[0]), 6)},
        "loss_last": {"float32": round(float(f32[-1]), 6),
                      "bfloat16": round(float(b16[-1]), 6)},
        "loss_drop": {"float32": round(float(f32[0] - f32[-1]), 6),
                      "bfloat16": round(float(b16[0] - b16[-1]), 6)},
        "rel_divergence_mean": float(rel.mean()),
        "rel_divergence_max": float(rel.max()),
        "rel_divergence_last10_mean": float(rel[-10:].mean()),
    }


def main():
    a = argparse.ArgumentParser()
    a.add_argument("--steps", type=int, default=100,
                   help="timed steps per precision for the step-time block")
    a.add_argument("--iters", type=int, default=150,
                   help="trajectory length for the drift block")
    a.add_argument("--skip_timing", action="store_true")
    a.add_argument("--skip_trajectory", action="store_true")
    a.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bf16_train_results.json"))
    args = a.parse_args()

    import jax

    from recnet_tpu.config import TrainConfig
    from recnet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    V = 4188
    tc_f32 = TrainConfig(use_recon=True, reconstructor_type="global")
    tc_bf16 = tc_f32.replace(train_precision="bfloat16")
    results = {"recipe": "reference B=100, global recon, 28x1536, V=4188",
               "backend": jax.default_backend(),
               "device": str(jax.devices()[0])}

    if not args.skip_timing:
        for name, tc in (("float32", tc_f32), ("bfloat16", tc_bf16)):
            r = measure_step_time(tc, V, args.steps)
            results.setdefault("step_time", {})[name] = r
            print(f"[bf16-train] {name}: wall {r['wall_ms_per_step']} "
                  f"ms/step, device {r['device_ms_per_step']} ms/step")
        st = results["step_time"]
        st["device_speedup"] = round(
            st["float32"]["device_ms_per_step"]
            / st["bfloat16"]["device_ms_per_step"], 3)
        st["wall_speedup"] = round(
            st["float32"]["wall_ms_per_step"]
            / st["bfloat16"]["wall_ms_per_step"], 3)
        print(f"[bf16-train] device speedup {st['device_speedup']}x, "
              f"wall {st['wall_speedup']}x")

    if not args.skip_trajectory:
        d = measure_trajectory_drift(tc_f32, tc_bf16, V, args.iters)
        results["trajectory_drift"] = d
        print(f"[bf16-train] {args.iters}-iter drift: rel mean "
              f"{d['rel_divergence_mean']:.3e}, max "
              f"{d['rel_divergence_max']:.3e}, last-10 mean "
              f"{d['rel_divergence_last10_mean']:.3e}; loss drop "
              f"f32 {d['loss_drop']['float32']:.4f} vs bf16 "
              f"{d['loss_drop']['bfloat16']:.4f}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
