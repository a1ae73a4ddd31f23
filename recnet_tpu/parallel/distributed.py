"""Multi-host (multi-process) SPMD support.

The reference is a single process on a single GPU (SURVEY §2: no
torch.distributed anywhere). Scaling past one host in JAX is still SPMD:
every process runs the same program, ``jax.distributed`` wires the
processes' local chips into ONE global device mesh, and the existing
GSPMD-sharded train step (parallel.mesh) runs unchanged — XLA places the
gradient psum on ICI within a host and DCN across hosts. The only pieces
that are genuinely multi-host-specific live here:

* :func:`initialize` — process-group bootstrap (coordinator + rank), driven
  by CLI flags or the standard JAX env vars;
* :func:`put_global` — assemble a globally-sharded ``jax.Array`` from a
  host-local numpy batch (each process transfers only the shards it owns);
* :func:`is_primary` — gate host-side side effects (checkpoint writes,
  TensorBoard/JSONL logs, stdout) to process 0.

Design note: every process loads the full dataset and assembles the full
global batch in host RAM, then transfers only its addressable shards
(``jax.make_array_from_callback``). For RecNet-sized data (the reference
itself loads the entire feature HDF5 into RAM, dataset/MSVD.py:234-240)
this is simpler and faster than per-process file sharding, and it keeps
batch composition bit-identical to the single-process run — the seeded
shuffle order is the same everywhere, so parity tests can compare losses
across world sizes exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None,
               cpu_collectives: Optional[str] = None,
               **kwargs) -> None:
    """Join the process group. No-op for single-process runs.

    Must be called before any other JAX API touches the backend. Arguments
    default to the standard JAX env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods all three are
    auto-detected from the TPU metadata and may be omitted entirely.

    ``cpu_collectives`` ("gloo" or "mpi") selects the cross-process
    collective implementation for the CPU backend — required for
    multi-process CPU runs (tests use gloo); ignored on TPU. Extra
    kwargs (e.g. ``shutdown_timeout_seconds``, ``heartbeat_timeout_seconds``,
    ``initialization_timeout``) pass through to
    ``jax.distributed.initialize``.
    """
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    coord = (coordinator_address
             or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    n_known = (num_processes if num_processes is not None
               else (int(env_np) if env_np is not None else None))
    # Engage the process group when ANY bootstrap signal is present: an
    # explicit process count, a coordinator address (flag or env), an
    # explicit process id, or a TPU-pod environment whose metadata JAX can
    # auto-detect. Previously only num_processes/JAX_NUM_PROCESSES
    # triggered initialization, so --coordinator alone silently trained
    # independent single-process models on every host (ADVICE r2, medium).
    any_signal = (n_known is not None or coord is not None
                  or process_id is not None
                  or os.environ.get("JAX_PROCESS_ID") is not None
                  or _tpu_multihost_detected())
    if not any_signal:
        return  # single-process run
    if n_known is not None and n_known <= 1:
        return
    if n_known is None and coord is None and not _tpu_multihost_detected():
        # e.g. only --process_id given: cannot resolve the group; failing
        # loudly beats silently training a detached model per host.
        raise ValueError(
            "distributed.initialize: process_id given but neither a "
            "process count (--num_processes / JAX_NUM_PROCESSES) nor a "
            "coordinator address (--coordinator / JAX_COORDINATOR_ADDRESS) "
            "is set, and no TPU-pod environment was detected")
    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
        **kwargs)


def _tpu_multihost_detected() -> bool:
    """Heuristic for a MULTI-host TPU pod slice whose topology JAX
    auto-detects (``jax.distributed.initialize()`` with no arguments).

    Deliberately conservative: Cloud TPU runtimes set TPU_WORKER_ID (and a
    one-entry TPU_WORKER_HOSTNAMES) on every TPU VM including single-host
    slices, so those alone must NOT trigger a process group — a plain
    single-host run would then block in initialize() waiting for peers.
    Only a hostnames list with >1 entry or an explicit megascale
    coordinator counts as multi-host evidence.
    """
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return ("," in hosts
            or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")))


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns host-side side effects (rank 0)."""
    return jax.process_index() == 0


def is_multihost() -> bool:
    return jax.process_count() > 1


def put_global(x, sharding) -> jax.Array:
    """Host-local numpy (the FULL global batch) → globally-sharded Array.

    Each process calls this with an identical full copy of the batch and
    transfers only the shards addressable on its own devices
    (``jax.make_array_from_callback`` hands us the numpy index of each
    local shard). Works identically in single-process runs, where it is
    equivalent to ``jax.device_put(x, sharding)``.
    """
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def fetch_replicated(x) -> np.ndarray:
    """Device → host for a fully-replicated (or single-device) array.

    Every process holds a full copy of a replicated value, so this is safe
    on all ranks. For arrays still sharded over the mesh, gather them with
    a replicated ``out_shardings`` inside the jitted program instead of
    fetching here — cross-host shards are not addressable.
    """
    return np.asarray(x)
