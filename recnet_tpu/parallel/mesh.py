"""Device mesh + sharding rules: data parallel over 'data', tensor parallel
over 'model' for the vocab-sized matrices.

The reference is strictly single-GPU (SURVEY §2: no torch.distributed
anywhere); multi-chip scaling here is new capability, built the JAX way —
annotate shardings on one jitted step and let GSPMD insert the collectives
(psum gradient all-reduce over ICI for DP; all-gather/reduce-scatter around
the vocab-sharded embedding + output projection for TP). No NCCL-style
communication layer exists or is needed.

Mesh axes:
* ``data``  — batch dimension of videos/captions; gradients all-reduced.
* ``model`` — vocab dimension of the embedding table and output projection
  (the only RecNet matrices big enough to be worth sharding).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[Tuple[str, int]] | None = None,
              devices=None) -> Mesh:
    """shape e.g. (("data", 4), ("model", 2)); defaults to all devices on
    a 1-D data axis."""
    devices = devices if devices is not None else jax.devices()
    if shape is None or tuple(shape) == (("data", 1),):
        shape = (("data", len(devices)),)
    names = [name for name, _ in shape]
    sizes = [size for _, size in shape]
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    mesh_devices = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(mesh_devices, axis_names=names)


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch dimension over 'data' (axis 0 for videos (B,F,E),
    axis 1 for time-major captions (T,B))."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_path(path_str: str, use_tp: bool) -> P:
    """Partition rule by parameter name.

    TP rules apply only inside the decoder subtree (.dec_params / .dec_opt):
    the reconstructor also has out_w/out_b, but those are (hidden, hidden) —
    not vocab-sized — and stay replicated.
    """
    if not use_tp:
        return P()
    if not (".dec_params" in path_str or ".dec_opt" in path_str):
        return P()
    if "embedding" in path_str:
        return P("model", None)      # (V, E) sharded over vocab
    if "out_w" in path_str:
        return P(None, "model")      # (H, V) sharded over vocab
    if "out_b" in path_str:
        return P("model")            # (V,)
    return P()


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a TrainState (params + optimizer moments).

    The optimizer state mirrors the param tree, so path matching covers it.
    TP rules apply only when the mesh has a 'model' axis of size > 1.
    """
    use_tp = "model" in mesh.axis_names and mesh.shape["model"] > 1

    def to_sharding(path, leaf):
        path_str = jax.tree_util.keystr(path)
        spec = _spec_for_path(path_str, use_tp)
        if spec != P() and np.ndim(leaf) != len(spec):
            spec = P()               # scalars / mismatched leaves: replicate
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, state)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Place a host/replicated TrainState onto the mesh per the rules.

    Multi-process: the mesh spans processes, so leaves are assembled as
    global arrays from each process's (identical, same-seed) local copy —
    every process uploads only the shards its own devices hold."""
    shardings = state_shardings(state, mesh)
    if jax.process_count() > 1:
        from recnet_tpu.parallel.distributed import put_global
        put = lambda x, s: put_global(np.asarray(x), s)
    else:
        put = jax.device_put
    return jax.tree_util.tree_map(put, state, shardings)
