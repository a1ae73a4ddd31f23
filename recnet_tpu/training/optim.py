"""Optax chains matching torch.optim.Adam semantics exactly.

The reference uses Adam with *coupled* L2 weight decay (decay added to the
gradient before the moment updates — torch.optim.Adam(weight_decay=...), NOT
AdamW) and optional AMSGrad (reference: train.py:149-150,186-187). BLEU parity
at 100k steps requires matching this update rule bit-for-bit, so the moment
transform is written out here instead of trusting library defaults:

    g   <- g + wd * p
    m_t <- b1 m + (1-b1) g ;  v_t <- b2 v + (1-b2) g^2
    m^  <- m_t / (1-b1^t)
    amsgrad: vmax <- max(vmax, v_t); denom = sqrt(vmax)/sqrt(1-b2^t) + eps
    else:    denom = sqrt(v_t)/sqrt(1-b2^t) + eps
    p   <- p - lr * m^ / denom
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TorchAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates
    nu_max: Optional[optax.Updates]


def scale_by_torch_adam(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8,
                        amsgrad: bool = False) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return TorchAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu_max=jax.tree_util.tree_map(jnp.zeros_like, params)
            if amsgrad else None,
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        # lerp form matches torch's exp_avg.lerp_(grad, 1-b1) rounding exactly
        mu = jax.tree_util.tree_map(
            lambda m, g: m + (1 - b1) * (g - m), state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        if amsgrad:
            nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
            denom_src = nu_max
        else:
            nu_max = None
            denom_src = nu
        sqrt_bc2 = jnp.sqrt(bc2)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v) / sqrt_bc2 + eps),
            mu, denom_src)
        return new_updates, TorchAdamState(count, mu, nu, nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def torch_adam(learning_rate: float, weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               amsgrad: bool = False) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay, amsgrad) as an optax chain."""
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))  # coupled L2
    steps.append(scale_by_torch_adam(b1, b2, eps, amsgrad))
    steps.append(optax.scale(-learning_rate))
    return optax.chain(*steps)


def clip_by_global_norm(grads, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ equivalent (reference: train.py:269-270).

    Note: torch clips in place with factor max_norm/(norm+1e-6) applied only
    when norm > max_norm.
    """
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    scale = jnp.where(gnorm > max_norm, max_norm / (gnorm + 1e-6), 1.0)
    return jax.tree_util.tree_map(lambda g: g * scale, grads), gnorm
