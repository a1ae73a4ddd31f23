"""Pallas TPU kernel: fused vocab projection + exact top-K.

Beam search needs, per step and per beam row, only the top-K of the vocab
logits (decoding.beam_decode step 1 — ``log(sigmoid(·))`` is monotonic, so
top-K of the raw logits suffices). The XLA path materializes the (B·K, V)
logits to HBM and then runs K rounds of max+mask over them — ~86 MB written
plus ~860 MB re-read per step at the flagship shapes. This kernel fuses the
projection matmul with an in-VMEM iterative top-K so the logits never leave
VMEM: HBM traffic per step drops to the (B·K, H) activations + the (H, V)
weights.

Per grid cell (one batch tile, whole padded vocab):
  logits = out · W + b            (MXU, f32 accumulation; bias in f32 —
                                   logits live entirely in f32)
  K rounds of: row max → first-occurrence argmax → mask winner
  write the K (value, index) pairs into the first K lanes of a 128-lane row

Selection semantics match ``jax.lax.top_k`` over the f32 projection (stable
first-occurrence tie order) — pinned by tests/test_pallas_topk.py. For f32
inputs this is token-exact vs the XLA beam path on real TPU; for bf16
inputs the f32 logits are HIGHER fidelity than a bf16-rounded comparison
(and mirror XLA's allow-excess-precision treatment of the bf16 path), so
bf16 token streams may differ from the XLA path at rounding level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _kernel(out_ref, w_ref, b_ref, val_ref, idx_ref,
            *, k: int, v_real: int):
    # Logits are computed ENTIRELY in f32 — f32-accumulated matmul + f32
    # bias — and the selection loop runs in f32 (Mosaic's argmax is
    # f32-only anyway). For f32 inputs this is bit-identical to the XLA
    # path (verified token-exact on TPU). For bf16 inputs it is *higher*
    # fidelity than a bf16-rounded comparison and mirrors what XLA's
    # allow-excess-precision mode does to the bf16 path on TPU.
    logits = jnp.dot(out_ref[:], w_ref[:],
                     preferred_element_type=jnp.float32)
    logits = logits + b_ref[0, :].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    v_pad = logits.shape[1]
    neg_inf = jnp.float32(-jnp.inf)
    logits = jnp.where(col < v_real, logits, neg_inf)
    rev = (v_pad - col).astype(jnp.float32)       # v_pad..1, first = largest

    tb = logits.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, _LANES), 1)
    vals_out = jnp.full((tb, _LANES), -jnp.inf, jnp.float32)
    idxs_out = jnp.zeros((tb, _LANES), jnp.int32)
    for j in range(k):
        m = jnp.max(logits, axis=1, keepdims=True)                # (TB, 1)
        # first-occurrence index without argmax (whose Mosaic lowering is
        # slower and f32-only): hits are d >= 0 after subtracting the max
        # (a scalar-threshold compare — (TB,1)-broadcast FLOAT compares hit
        # a Mosaic relayout bug); the first hit has the largest v_pad-col.
        hit = ((logits - m) >= jnp.float32(0.0)).astype(jnp.float32)
        i = (v_pad - jnp.max(rev * hit, axis=1, keepdims=True)
             ).astype(jnp.int32)
        vals_out = jnp.where(lane == j, m, vals_out)
        idxs_out = jnp.where(lane == j, i, idxs_out)
        logits = jnp.where(col == i, neg_inf, logits)
    val_ref[:] = vals_out
    idx_ref[:] = idxs_out


@functools.partial(jax.jit,
                   static_argnames=("k", "block_b", "interpret"))
def outproj_topk(out: jax.Array, out_w: jax.Array, out_b: jax.Array,
                 *, k: int, block_b: int = 128,
                 interpret: bool = False):
    """Fused ``top_k(out @ out_w + out_b, k)`` without materializing logits.

    out (N, H); out_w (H, V); out_b (V,). Returns (values (N, k) f32,
    indices (N, k) int32), ordered like ``lax.top_k``.
    """
    N, H = out.shape
    V = out_w.shape[1]
    assert k <= _LANES
    v_pad = -(-V // _LANES) * _LANES
    n_pad = -(-N // block_b) * block_b
    if v_pad != V:
        out_w = jnp.pad(out_w, ((0, 0), (0, v_pad - V)))
        out_b = jnp.pad(out_b, (0, v_pad - V))
    if n_pad != N:
        out = jnp.pad(out, ((0, n_pad - N), (0, 0)))

    kernel = functools.partial(_kernel, k=k, v_real=V)
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(n_pad // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # out tile
            pl.BlockSpec((H, v_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # weights (resident)
            pl.BlockSpec((1, v_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),      # bias
        ],
        out_specs=[
            pl.BlockSpec((block_b, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, _LANES), jnp.int32),
        ],
        interpret=interpret,
    )(out, out_w, out_b.reshape(1, -1))
    return vals[:N, :k], idxs[:N, :k]
