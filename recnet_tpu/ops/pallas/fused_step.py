"""Pallas TPU kernel: fused attention + GRU decoder step.

Fuses the per-step hot path of the caption decoder — unnormalized additive
attention over the 28 encoder frames (reference: models/decoder.py:50-61) and
the GRU cell update (decoder.py:64-66) — into one kernel. The vocab projection
+ argmax stay in XLA (one large MXU matmul, already optimal there).

Dataflow per grid cell (i = batch tile, j = frame):
  j == 0 : cache W·h in scratch, zero the context accumulator
  each j : score_j = w·tanh(W h + U v_j + b);  ctx += score_j * enc_j
           (enc streams through VMEM one (TB,1,F) block at a time — the
            (B,28,A) tanh intermediate and (B,F) context never touch HBM)
  j == L-1: gates = [emb,ctx]·W_ih + h·W_hh + b; GRU combine; write h'

All weights live in VMEM for the whole call (constant index maps → Mosaic
fetches them once). f32 accumulation via preferred_element_type; inputs and
outputs bf16 (the serving dtype) or f32 for small shapes.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(emb_ref, h_ref, enc_ref, uv_ref,
            attn_w_ref, attn_v_ref, attn_b_ref,
            w_ih_ref, w_hh_ref, b_ref,
            h_out_ref,
            wh_scratch, ctx_scratch,
            *, n_frames: int, emb_size: int, frame_chunk: int,
            feat_size: int, attn_size: int):
    j = pl.program_id(1)
    n_chunks = n_frames // frame_chunk

    @pl.when(j == 0)
    def _init():
        wh_scratch[:] = jnp.dot(h_ref[:], attn_w_ref[:],
                                preferred_element_type=jnp.float32)
        ctx_scratch[:] = jnp.zeros_like(ctx_scratch)

    # score_f = tanh(W h + U v_f + b) @ w, ctx += score_f * enc_f
    # for each frame f in this chunk (statically unrolled)
    attn_v = attn_v_ref[:].astype(jnp.float32)
    attn_b = attn_b_ref[0, :].astype(jnp.float32)
    acc = jnp.zeros_like(ctx_scratch)
    for c in range(frame_chunk):
        uv_c = uv_ref[:, c * attn_size:(c + 1) * attn_size]
        act = jnp.tanh(wh_scratch[:] + uv_c.astype(jnp.float32) + attn_b)
        score = jnp.dot(act, attn_v,
                        preferred_element_type=jnp.float32)  # (TB, 1)
        enc_c = enc_ref[:, c * feat_size:(c + 1) * feat_size]
        acc = acc + score * enc_c.astype(jnp.float32)
    ctx_scratch[:] += acc

    @pl.when(j == n_chunks - 1)
    def _finish():
        dtype = h_ref.dtype
        ctx = (ctx_scratch[:] / n_frames).astype(dtype)
        # gi = [emb, ctx] @ W_ih ; gh = h @ W_hh   (f32 accumulation)
        gi = (jnp.dot(emb_ref[:], w_ih_ref[:emb_size, :],
                      preferred_element_type=jnp.float32)
              + jnp.dot(ctx, w_ih_ref[emb_size:, :],
                        preferred_element_type=jnp.float32))
        gh = jnp.dot(h_ref[:], w_hh_ref[:],
                     preferred_element_type=jnp.float32)
        H = h_ref.shape[-1]
        b_ih = b_ref[0, :].astype(jnp.float32)
        b_hh = b_ref[1, :].astype(jnp.float32)
        gi = gi + b_ih
        gh = gh + b_hh
        # PyTorch GRU gate order r, z, n; the reset gate scales the
        # hidden-side n-term (gh) only.
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H: 2 * H] + gh[:, H: 2 * H])
        n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        h = h_ref[:].astype(jnp.float32)
        h_out_ref[:] = ((1.0 - z) * n + z * h).astype(dtype)


def pack_gru_bias(b_ih: jax.Array, b_hh: jax.Array) -> jax.Array:
    """(2, 3H): row0 = b_ih, row1 = b_hh."""
    return jnp.stack([b_ih, b_hh])


@functools.partial(jax.jit,
                   static_argnames=("emb_size", "block_b", "frame_chunk",
                                    "interpret"))
def fused_gru_attn_step(emb: jax.Array, h: jax.Array, enc: jax.Array,
                        uv: jax.Array, attn_w: jax.Array, attn_v: jax.Array,
                        attn_b: jax.Array, w_ih: jax.Array, w_hh: jax.Array,
                        bias3: jax.Array, *, emb_size: int,
                        block_b: int = 128, frame_chunk: int = 1,
                        interpret: bool = False
                        ) -> jax.Array:
    """One fused decoder step.

    emb (B,E); h (B,H); enc (B,L,F); uv (B,L,A); attn_w (H,A); attn_v (A,1);
    attn_b (1,A); w_ih (E+F, 3H); w_hh (H, 3H); bias3 (2, 3H) from
    pack_gru_bias. Returns h' (B,H).
    """
    B, L, F = enc.shape
    H = h.shape[-1]
    A = attn_w.shape[-1]
    TB = min(block_b, B)
    assert B % TB == 0, f"batch {B} not divisible by block {TB}"
    FC = frame_chunk
    assert L % FC == 0, f"frames {L} not divisible by frame_chunk {FC}"
    grid = (B // TB, L // FC)

    # flatten the frame axis into the lane axis: (B, L, F) -> (B, L*F) so the
    # per-chunk block (TB, FC*F) satisfies TPU (8, 128) block-shape constraints
    enc2 = enc.reshape(B, L * F)
    uv2 = uv.reshape(B, L * A)

    kernel = functools.partial(_kernel, n_frames=L, emb_size=emb_size,
                               frame_chunk=FC, feat_size=F, attn_size=A)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, emb.shape[-1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),          # emb
            pl.BlockSpec((TB, H), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),          # h
            pl.BlockSpec((TB, FC * F), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),          # enc (streamed)
            pl.BlockSpec((TB, FC * A), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),          # uv (streamed)
            pl.BlockSpec((H, A), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),          # attn_w
            pl.BlockSpec((A, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),          # attn_v
            pl.BlockSpec((1, A), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),          # attn_b
            pl.BlockSpec((w_ih.shape[0], 3 * H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),          # w_ih
            pl.BlockSpec((H, 3 * H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),          # w_hh
            pl.BlockSpec((2, 3 * H), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),          # bias3
        ],
        out_specs=pl.BlockSpec((TB, H), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H), h.dtype),
        scratch_shapes=[
            pltpu.VMEM((TB, A), jnp.float32),               # W·h cache
            pltpu.VMEM((TB, F), jnp.float32),               # ctx accumulator
        ],
        interpret=interpret,
    )(emb, h, enc2, uv2, attn_w, attn_v, attn_b, w_ih, w_hh, bias3)


def gru_attn_step_reference(emb, h, enc, uv, attn_w, attn_v, attn_b,
                            w_ih, w_hh, b_ih, b_hh, emb_size):
    """Plain-XLA restatement for parity testing."""
    wh = h @ attn_w
    act = jnp.tanh(wh[:, None, :] + uv + attn_b[0])
    scores = jnp.squeeze(act @ attn_v, -1)
    ctx = jnp.einsum("bl,blf->bf", scores, enc) / enc.shape[1]
    x = jnp.concatenate([emb, ctx], -1)
    gi = x @ w_ih + b_ih
    gh = h @ w_hh + b_hh
    H = h.shape[-1]
    r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
    n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
    return (1.0 - z) * n + z * h
