"""Loss functions reproducing the reference's exact normalization quirks.

The decoder loss is NOT a plain token-mean cross entropy: the reference takes
the *mean* CE over the masked tokens of each timestep, *sums* those per-step
means, then divides by the *total token count* (reference: train.py:54-68).
With variable per-step mask counts these differ; parity requires the quirk.

Regularization is ``lambda * Σ_p ||p||_2`` — a sum of L2 *norms*, not squared
norms (reference: train.py:69-70,103-104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def step_mean_ce(logits: jax.Array, targets: jax.Array, mask: jax.Array):
    """Per-step masked-mean cross entropy, fixed-shape.

    logits: (T, B, V); targets: (T, B) int; mask: (T, B) bool/float.

    Returns (loss, n_tokens) where
      loss = Σ_t mean_{b: mask}(CE_tb) / Σ_tb mask   (reference: train.py:54-68)
    Steps with an all-zero mask contribute 0 to the numerator, which matches
    the reference's early loop break (train.py:66-67): masks are monotone in t
    (padding is terminal), so broken-out steps all have empty masks.
    """
    # losses always reduce in f32 (no-op on the f32 parity path; required
    # for stability under bf16 mixed-precision training)
    logits = logits.astype(jnp.float32)
    mask = mask.astype(logits.dtype)
    logz = jax.nn.logsumexp(logits, axis=-1)                       # (T, B)
    tgt_logit = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    ce = logz - tgt_logit                                          # (T, B)
    per_step_sum = jnp.sum(ce * mask, axis=1)                      # (T,)
    per_step_cnt = jnp.sum(mask, axis=1)                           # (T,)
    per_step_mean = per_step_sum / jnp.maximum(per_step_cnt, 1.0)
    n_tokens = jnp.sum(per_step_cnt)
    loss = jnp.sum(per_step_mean) / jnp.maximum(n_tokens, 1.0)
    return loss, n_tokens


def l2_norm_sum(params) -> jax.Array:
    """Σ_p ||p||_2 over all leaves (reference: train.py:69)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(jnp.sqrt(jnp.sum(jnp.square(p))) for p in leaves)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Elementwise-mean MSE = torch.nn.MSELoss() (reference: train.py:185).
    Reduces in f32 (no-op on the f32 parity path)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean(jnp.square(pred - target))
