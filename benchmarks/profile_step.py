"""Profile the jitted train step at the reference recipe and report DEVICE
time per step (wall time through the dev tunnel is dispatch-bound and
overstates the step by ~1-2 ms — NOTES.md).

Runs a window of steps under jax.profiler.trace, parses the written
xplane.pb directly (the tensorboard profile plugin's converter is
version-broken in this image; NOTES.md round-2 recipe), aggregates event
durations on the TPU "XLA Ops" line, and prints the per-step device total
plus the top ops.

Usage: python benchmarks/profile_step.py [--batch 100] [--recon global]
       [--steps 8] [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
# NOTE: an env-var here would be read too late (sitecustomize imports
# jax at interpreter start) — activate the persistent compile cache
# through jax.config instead (utils/compile_cache.py explains).

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_xplane_device_ops(trace_dir: str):
    """-> (plane_name, module_total_ps, n_modules, {op: duration_ps}).

    Device time per executed program comes from the 'XLA Modules' line —
    one event per module execution, non-overlapping, so the sum is true
    device busy time. The 'XLA Ops' line is used only for the per-op
    attribution table and OVER-counts (its events nest: a while/fusion
    parent's duration includes its children; async copy-start spans the
    DMA wait), and 'Async XLA Ops' must not be summed at all.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "/device:TPU" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        module_ps, n_modules = 0, 0
        per_op = defaultdict(int)
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    module_ps += ev.duration_ps
                    n_modules += 1
            elif line.name == "XLA Ops":
                for ev in line.events:
                    per_op[meta.get(ev.metadata_id, "?")] += ev.duration_ps
        if n_modules:
            return plane.name, module_ps, n_modules, dict(per_op)
    raise RuntimeError("no TPU 'XLA Modules' line found in the trace")


def main():
    a = argparse.ArgumentParser()
    a.add_argument("--batch", type=int, default=100)
    a.add_argument("--recon", default="global",
                   choices=["global", "local", "none"])
    a.add_argument("--steps", type=int, default=8)
    a.add_argument("--top", type=int, default=25)
    a.add_argument("--trace_dir", default="/tmp/recnet_profile")
    args = a.parse_args()

    import jax
    import jax.numpy as jnp

    from recnet_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from recnet_tpu.config import TrainConfig
    from recnet_tpu.training.step import init_train_state, build_train_step

    tc = TrainConfig(batch_size=args.batch,
                     use_recon=args.recon != "none",
                     reconstructor_type=args.recon if args.recon != "none"
                     else "global")
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
    key = jax.random.PRNGKey(1)

    # compile + settle
    for _ in range(3):
        state, m = step(state, videos, caps, key)
    _ = float(m["loss"])

    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            state, m = step(state, videos, caps, key)
        _ = float(m["loss"])    # force completion inside the trace
    wall = (time.perf_counter() - t0) / args.steps

    plane, module_ps, n_modules, per_op = \
        parse_xplane_device_ops(args.trace_dir)
    print(f"\nplane: {plane}  ({n_modules} module executions, "
          f"{len(per_op)} distinct ops)")
    print(f"traced {args.steps} steps: wall {wall*1e3:.2f} ms/step, "
          f"DEVICE {module_ps/1e9/args.steps:.2f} ms/step "
          f"(XLA Modules line)")
    print(f"\ntop {args.top} ops by inclusive duration over {args.steps} "
          f"steps (NESTED — parents include children; attribution only):")
    for name, ps in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ps/1e9:8.3f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
