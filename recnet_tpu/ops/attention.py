"""RecNet's additive attention — deliberately *unnormalized* (no softmax).

The reference constructs ``attn_softmax`` but never applies it
(reference: models/decoder.py:30,55-61 and models/local_reconstructor.py:22,44-49):
scores ``w·tanh(W h + U v + b)`` broadcast-multiply the values and are
**mean-pooled** over the time axis. Parity requires reproducing this, not
fixing it.

Key TPU optimization: the value projection ``U v`` is independent of the query,
so it is computed once per sequence *outside* the timestep scan
(``precompute_uv``) instead of per step as the reference does
(models/decoder.py:54 runs inside the per-step forward). The per-step work is
then one small (B,H)x(H,A) matmul + a batched weighted mean.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def init_attention_params(key: jax.Array, query_size: int, value_size: int,
                          attn_size: int, dtype=jnp.float32) -> Params:
    """Matches PyTorch nn.Linear default init (U(-1/sqrt(fan_in), ...)) for
    W/U/w and the reference's ones-init for the bias b
    (reference: models/decoder.py:25-29)."""
    k1, k2, k3 = jax.random.split(key, 3)

    def linear(k, fan_in, fan_out):
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(k, (fan_in, fan_out), dtype, -bound, bound)

    return {
        "W": linear(k1, query_size, attn_size),   # attn_W: query (hidden) proj
        "U": linear(k2, value_size, attn_size),   # attn_U: value proj
        "b": jnp.ones((attn_size,), dtype),       # attn_b = ones (decoder.py:27)
        "w": linear(k3, attn_size, 1),            # attn_w: score proj
    }


def precompute_uv(params: Params, values: jax.Array) -> jax.Array:
    """(B, T, V) -> (B, T, A). Hoisted out of the decode scan."""
    return values @ params["U"]


def attention_scores(params: Params, query: jax.Array, uv: jax.Array) -> jax.Array:
    """Unnormalized additive scores.

    query: (B, H); uv: (B, T, A)  ->  scores: (B, T)
    score_t = w · tanh(W q + U v_t + b)   (reference: models/decoder.py:51-58)
    """
    wh = query @ params["W"]                       # (B, A)
    act = jnp.tanh(wh[:, None, :] + uv + params["b"])
    return jnp.squeeze(act @ params["w"], axis=-1)  # (B, T)


def attend_mean(params: Params, query: jax.Array, values: jax.Array,
                uv: jax.Array, mask: jax.Array | None = None,
                denom: jax.Array | None = None) -> jax.Array:
    """Score-weighted MEAN over time (reference: models/decoder.py:59-61).

    context = mean_t(score_t * v_t) = (1/T) Σ_t score_t v_t.

    ``mask``(B?, T) and ``denom`` support the fixed-shape local-reconstructor
    path where only the first T_eff of T timesteps are real: masked terms are
    zeroed and the mean divides by ``denom`` (T_eff) instead of T, matching the
    reference's dynamic stacking (local_reconstructor.py:48-49).
    """
    scores = attention_scores(params, query, uv)   # (B, T)
    if mask is not None:
        scores = scores * mask
    weighted = jnp.einsum("bt,btv->bv", scores, values)
    if denom is None:
        denom = jnp.asarray(values.shape[1], weighted.dtype)
    return weighted / denom
