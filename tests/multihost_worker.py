"""One rank of a multi-process CPU 'pod' for tests/test_multihost.py.

Usage:
  python multihost_worker.py <process_id> <num_processes> <port>
      <fixture_root> <out_dir> <mesh_shape> <local_devices> [ckpt_backend]

ckpt_backend "orbax" saves cooperatively (every rank calls save) into a
directory SHARED by all ranks (../shared_ckpt next to out_dir); the
default "npz" saves from the primary only into <out_dir>/ckpt.

Runs the FULL training loop (training.loop.train) with use_mesh=True over a
global mesh spanning all processes, then prints a replicated parameter
digest. With num_processes=1 this is the single-process baseline the
multi-process run must match exactly (same seeds -> same batches -> same
global program).

Env bootstrap must happen before any jax import (see conftest.py notes on
the image's sitecustomize).
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    root = sys.argv[4]
    out_dir = sys.argv[5]
    mesh_shape = tuple((kv.split("=")[0], int(kv.split("=")[1]))
                       for kv in sys.argv[6].split(","))
    ndev = int(sys.argv[7])
    ckpt_backend = sys.argv[8] if len(sys.argv) > 8 else "npz"
    use_cache = len(sys.argv) > 9 and sys.argv[9] == "cache"
    use_bundle = len(sys.argv) > 10 and sys.argv[10] == "bundle"

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={ndev}")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from recnet_tpu.parallel import distributed as dist
    # generous timeouts: CI machines run this alongside the rest of the
    # suite, and rank 0 does extra host-side work (TB import, checkpoint)
    dist.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=nproc, process_id=pid,
                    cpu_collectives="gloo",
                    initialization_timeout=600,
                    heartbeat_timeout_seconds=600,
                    shutdown_timeout_seconds=600)
    assert jax.process_count() == nproc
    assert jax.device_count() == 8, jax.device_count()

    os.makedirs(out_dir, exist_ok=True)
    os.chdir(out_dir)  # predictions.txt lands here (primary only)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import tiny_train_config

    tc = tiny_train_config(
        root, batch_size=8, n_iterations=4,
        log_every=2, validate_every=4, test_every=4, save_every=4,
        mesh_shape=mesh_shape, device_feature_cache=use_cache)
    if use_bundle:
        # shared-data_root pod: the primary packs the bundle, other ranks
        # poll for the atomic rename (bundle.load_or_build) — the bundle
        # root lives in the SHARED fixture dir so both ranks address it
        tc = tc.replace(data_bundle=True,
                        data_bundle_root=os.path.join(root, "bundles"))

    if ckpt_backend == "orbax":
        save_dir = os.path.join(os.path.dirname(out_dir.rstrip("/")),
                                "shared_ckpt")
    else:
        save_dir = os.path.join(out_dir, "ckpt")

    from recnet_tpu.training.loop import train
    state = train(tc, use_mesh=True,
                  log_dir=os.path.join(out_dir, "logs"),
                  save_dir=save_dir, ckpt_backend=ckpt_backend)

    # Replicated digest of the final params: every rank must print the
    # same value, and it must match the single-process baseline.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from recnet_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(tc.mesh_shape)
    leaves = jax.tree_util.tree_leaves((state.dec_params, state.rec_params))
    d = jax.jit(lambda ls: sum(jnp.sum(jnp.abs(x)) for x in ls),
                out_shardings=NamedSharding(mesh, P()))(leaves)
    print(f"DIGEST {pid} {float(d):.6f}", flush=True)


if __name__ == "__main__":
    main()
