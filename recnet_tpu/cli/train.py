"""CLI: python -m recnet_tpu.cli.train [--debug] [--loss_only] [--config f.json]

Mirrors reference train.py:200-204's flags and adds config-file loading,
resume, and mesh control (new capabilities).
"""

from __future__ import annotations

import argparse

from recnet_tpu.config import TrainConfig
from recnet_tpu.training.loop import train


def main(argv=None):
    # honor JAX_COMPILATION_CACHE_DIR even though sitecustomize froze
    # jax config before this process's env lines could run
    from recnet_tpu.utils.compile_cache import enable_compile_cache_if_configured
    enable_compile_cache_if_configured()
    a = argparse.ArgumentParser()
    a.add_argument("--debug", "-D", action="store_true")
    a.add_argument("--loss_only", "-L", action="store_true")
    a.add_argument("--config", type=str, default=None,
                   help="TrainConfig JSON file (defaults match the reference)")
    a.add_argument("--resume", type=str, default=None,
                   help="checkpoint step directory to resume from")
    a.add_argument("--mesh", action="store_true",
                   help="shard over all visible devices (data parallel)")
    a.add_argument("--mesh_shape", type=str, default=None,
                   help='e.g. "data=4,model=2" (implies --mesh)')
    a.add_argument("--keep_last_k", type=int, default=0,
                   help="checkpoint retention (0 = keep all)")
    a.add_argument("--profile_dir", type=str, default=None,
                   help="jax.profiler trace directory (traces iters 10-14)")
    a.add_argument("--ckpt_backend", choices=["npz", "orbax"], default="npz",
                   help="checkpoint format (orbax adds async + multi-host)")
    a.add_argument("--async_ckpt", action="store_true",
                   help="non-blocking checkpoint saves (orbax backend)")
    a.add_argument("--coordinator", type=str, default=None,
                   help="multi-host: coordinator address host:port "
                        "(auto-detected on TPU pods; see parallel."
                        "distributed.initialize)")
    a.add_argument("--num_processes", type=int, default=None,
                   help="multi-host: total process count (implies --mesh)")
    a.add_argument("--process_id", type=int, default=None,
                   help="multi-host: this process's rank")
    a.add_argument("--cpu_collectives", type=str, default=None,
                   help="multi-host on CPU: collective impl (gloo/mpi)")
    a.add_argument("--steps_per_dispatch", type=int, default=None,
                   help="train steps per device dispatch (lax.scan over k "
                        "batches; cadences must divide by k)")
    a.add_argument("--device_feature_cache", action="store_true",
                   help="keep all train video features resident in HBM and "
                        "send only row indices per step (bit-identical; "
                        "requires uniform frame sampling)")
    a.add_argument("--feature_cache_dtype", type=str, default=None,
                   choices=["float32", "bfloat16", "float16"],
                   help="storage dtype for the HBM feature caches; half-"
                        "width halves upload + residency, compute stays f32 "
                        "(default float32 = bit-identical)")
    a.add_argument("--data_bundle", action="store_true",
                   help="build/load the preprocessed-corpus bundle (packed "
                        "features + tokenized captions + vocab, mmapped on "
                        "subsequent starts; bit-identical batches; requires "
                        "uniform frame sampling)")
    args = a.parse_args(argv)
    if args.async_ckpt and args.ckpt_backend != "orbax":
        a.error("--async_ckpt requires --ckpt_backend orbax "
                "(npz saves are synchronous)")

    # must happen before any other JAX API initializes the backend; a
    # no-op unless --num_processes or the JAX_NUM_PROCESSES env var asks
    # for a process group (initialize() documents the env defaults)
    from recnet_tpu.parallel import distributed as dist
    dist.initialize(coordinator_address=args.coordinator,
                    num_processes=args.num_processes,
                    process_id=args.process_id,
                    cpu_collectives=args.cpu_collectives)

    if args.config:
        with open(args.config) as f:
            tc = TrainConfig.from_json(f.read())
    else:
        tc = TrainConfig()

    use_mesh = args.mesh or dist.is_multihost()
    if args.mesh_shape:
        shape = tuple((kv.split("=")[0], int(kv.split("=")[1]))
                      for kv in args.mesh_shape.split(","))
        tc = tc.replace(mesh_shape=shape)
        use_mesh = True
    if args.steps_per_dispatch is not None:
        tc = tc.replace(steps_per_dispatch=args.steps_per_dispatch)
    if args.device_feature_cache:
        tc = tc.replace(device_feature_cache=True)
    if args.feature_cache_dtype is not None:
        tc = tc.replace(feature_cache_dtype=args.feature_cache_dtype)
    if args.data_bundle:
        tc = tc.replace(data_bundle=True)

    # die on incompatible knob combos before any data/devices are touched
    # (train() re-checks; here the error surfaces at argparse speed)
    tc.validate(debug=args.debug)

    train(tc, debug=args.debug, loss_only=args.loss_only,
          resume_from=args.resume, use_mesh=use_mesh,
          profile_dir=args.profile_dir, keep_last_k=args.keep_last_k,
          ckpt_backend=args.ckpt_backend, async_ckpt=args.async_ckpt)


if __name__ == "__main__":
    main()
