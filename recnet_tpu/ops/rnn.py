"""Single-step LSTM/GRU cells with PyTorch-compatible gate semantics.

The reference drives ``nn.LSTM``/``nn.GRU`` one timestep at a time from Python
loops (reference: models/decoder.py:36-40,66; train.py:41-67). Here the cells
are pure functions of (params, x, state) so they can be rolled over time with
``jax.lax.scan`` and fused into Pallas kernels later, while producing the same
math as cuDNN cells:

* LSTM gate order i, f, g, o;  c' = f*c + i*g;  h' = o * tanh(c')
* GRU  gate order r, z, n;     n = tanh(W_in x + b_in + r * (W_hn h + b_hn));
                               h' = (1-z)*n + z*h

Weights are stored input-major — ``w_ih: (input, 4H)``, ``w_hh: (H, 4H)`` — so
each step is two MXU-friendly ``x @ W`` matmuls (the transpose of PyTorch's
``(4H, input)`` layout).

Initialization matches PyTorch RNN default: U(-1/sqrt(H), 1/sqrt(H)) for every
weight and bias.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def init_rnn_params(key: jax.Array, cell_type: str, input_size: int,
                    hidden_size: int, dtype=jnp.float32) -> Params:
    """PyTorch-default uniform init for one RNN layer."""
    n_gates = 4 if cell_type == "LSTM" else 3
    bound = 1.0 / (hidden_size ** 0.5)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    shape_ih = (input_size, n_gates * hidden_size)
    shape_hh = (hidden_size, n_gates * hidden_size)
    u = lambda k, s: jax.random.uniform(k, s, dtype, minval=-bound, maxval=bound)
    return {
        "w_ih": u(k1, shape_ih),
        "w_hh": u(k2, shape_hh),
        "b_ih": u(k3, (n_gates * hidden_size,)),
        "b_hh": u(k4, (n_gates * hidden_size,)),
    }


def lstm_cell(params: Params, x: jax.Array,
              state: Tuple[jax.Array, jax.Array]) -> Tuple[jax.Array, jax.Array]:
    """One LSTM step. x: (B, in), state: (h, c) each (B, H). Returns (h', c')."""
    h, c = state
    gates = (x @ params["w_ih"] + params["b_ih"]
             + h @ params["w_hh"] + params["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def gru_cell(params: Params, x: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step with PyTorch's reset-gate placement. Returns h'."""
    gi = x @ params["w_ih"] + params["b_ih"]
    gh = h @ params["w_hh"] + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def lstm_cell_pre(params: Params, gi: jax.Array,
                  state: Tuple[jax.Array, jax.Array]
                  ) -> Tuple[jax.Array, jax.Array]:
    """LSTM step with the input-side term precomputed:
    ``gi = x @ w_ih + b_ih``. Lets decode scans hoist the loop-invariant
    input matmuls (embedding/context projections) out of the scan."""
    h, c = state
    gates = gi + h @ params["w_hh"] + params["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def gru_cell_pre(params: Params, gi: jax.Array, h: jax.Array) -> jax.Array:
    """GRU step with ``gi = x @ w_ih + b_ih`` precomputed."""
    gh = h @ params["w_hh"] + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def rnn_step_pre(cell_type: str, params: Params, gi: jax.Array, state):
    """rnn_step with the input-side gate term precomputed (same carry)."""
    if cell_type == "LSTM":
        h, c = lstm_cell_pre(params, gi, state)
        return (h, c)
    elif cell_type == "GRU":
        h = gru_cell_pre(params, gi, state[0])
        return (h, state[1])
    raise ValueError(f"Unknown cell type: {cell_type}")


def rnn_step(cell_type: str, params: Params, x: jax.Array, state):
    """Uniform interface: state is always a (h, c) tuple; GRU ignores/echoes c.

    Keeping the carry PyTree shape identical for both cell types lets the
    decoder scan / beam search treat them uniformly (the reference branches on
    model type everywhere, e.g. train.py:28-35, eval.py:78-102).
    """
    if cell_type == "LSTM":
        h, c = lstm_cell(params, x, state)
        return (h, c)
    elif cell_type == "GRU":
        h = gru_cell(params, x, state[0])
        return (h, state[1])
    raise ValueError(f"Unknown cell type: {cell_type}")


def zero_state(batch_size: int, hidden_size: int, dtype=jnp.float32):
    """Zero-initialized (h, c) carry (reference: train.py:28-35)."""
    z = jnp.zeros((batch_size, hidden_size), dtype)
    return (z, z)


# ---------------------------------------------------------------------------
# Whole-rollout cores with out-of-scan weight gradients.
#
# Autodiff of a lax.scan accumulates the recurrent weight gradient in the
# backward loop's CARRY — for the reconstructor's (1536, 6144) W_hh that is
# ~38 MB of HBM read+write PER STEP (measured ~2 ms of the B=100 train step,
# DESIGN.md §4c). These custom-VJP rollouts instead stash the per-step gate
# activations on the forward pass, run a backward scan whose carry is only
# (dh, dc) (B, H), and contract dW_hh = h_prevᵀ · dgates as ONE stacked
# matmul outside the loop. Inputs are precomputed gate terms (gi = x@W_ih +
# b_ih), so they compose with the input-matmul hoist: the whole recurrence
# has NO weight-sized tensors in any loop carry, forward or backward.
# ---------------------------------------------------------------------------


def rollout_cell_fwd(cell_type: str, gi, h, c, w_hh, b_hh):
    """One recurrent step from precomputed input gates.

    Returns (h_new, c_new, acts) where ``acts`` stacks exactly the
    saturated activations :func:`rollout_cell_bwd` needs —
    [i, f, g, o] for LSTM, [r, z, n, h_n] for GRU (GRU echoes ``c``).
    Shared by every custom-VJP rollout (ops/rnn.py cores and the
    decoder's _tf_attn_rollout) so the gate math exists once.
    """
    if cell_type == "LSTM":
        gates = gi + h @ w_hh + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new, jnp.concatenate([i, f, g, o], -1)
    gh = h @ w_hh + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h, c, jnp.concatenate([r, z, n, h_n], -1)


def rollout_cell_bwd(cell_type: str, dh, dc_next, act, h_pv, c_pv, c_t,
                     w_hh):
    """Cotangents of one :func:`rollout_cell_fwd` step.

    ``dh`` must already sum the recurrent and output cotangents flowing
    into h_t. Returns (dgi, dgh, dh_prev, dc_prev); for LSTM dgi is dgh.
    """
    if cell_type == "LSTM":
        i, f, g, o = jnp.split(act, 4, axis=-1)
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc_next + dh * o * (1.0 - tc * tc)
        dgates = jnp.concatenate(
            [dc * g * i * (1.0 - i), dc * c_pv * f * (1.0 - f),
             dc * i * (1.0 - g * g), do * o * (1.0 - o)], -1)
        return dgates, dgates, dgates @ w_hh.T, dc * f
    r, z, n, h_n = jnp.split(act, 4, axis=-1)
    dz = dh * (h_pv - n)
    dn_pre = dh * (1.0 - z) * (1.0 - n * n)
    dr_pre = dn_pre * h_n * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)
    dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], -1)
    dgi = jnp.concatenate([dr_pre, dz_pre, dn_pre], -1)
    return dgi, dgh, dh * z + dgh @ w_hh.T, dc_next


@jax.custom_vjp
def lstm_rollout_pre(w_hh: jax.Array, b_hh: jax.Array, gi_all: jax.Array,
                     h0: jax.Array, c0: jax.Array) -> jax.Array:
    """Roll an LSTM over precomputed input gates. gi_all: (T, B, 4H);
    returns the hidden-state stack (T, B, H)."""
    return _lstm_rollout_fwd(w_hh, b_hh, gi_all, h0, c0)[0]


def _lstm_rollout_fwd(w_hh, b_hh, gi_all, h0, c0):
    def step(state, gi):
        h, c = state
        h_new, c_new, acts = rollout_cell_fwd("LSTM", gi, h, c, w_hh, b_hh)
        return (h_new, c_new), (h_new, c_new, acts)

    _, (hs, cs, acts) = jax.lax.scan(step, (h0, c0), gi_all)
    return hs, (w_hh, hs, cs, acts, h0, c0)


def _lstm_rollout_bwd(res, dhs):
    w_hh, hs, cs, acts, h0, c0 = res
    c_prev = jnp.concatenate([c0[None], cs[:-1]], 0)

    def step(carry, xs):
        dh_next, dc_next = carry
        dh_out, act, c_t, c_pv = xs
        dgates, _, dh_prev, dc_prev = rollout_cell_bwd(
            "LSTM", dh_next + dh_out, dc_next, act, None, c_pv, c_t, w_hh)
        return (dh_prev, dc_prev), dgates

    zero = jnp.zeros_like(h0)
    (dh0, dc0), dgates = jax.lax.scan(
        step, (zero, zero), (dhs, acts, cs, c_prev), reverse=True)
    h_prev = jnp.concatenate([h0[None], hs[:-1]], 0)
    dw_hh = jnp.einsum("tbh,tbg->hg", h_prev, dgates)
    db_hh = dgates.sum((0, 1))
    return dw_hh, db_hh, dgates, dh0, dc0


lstm_rollout_pre.defvjp(_lstm_rollout_fwd, _lstm_rollout_bwd)


@jax.custom_vjp
def gru_rollout_pre(w_hh: jax.Array, b_hh: jax.Array, gi_all: jax.Array,
                    h0: jax.Array) -> jax.Array:
    """Roll a GRU over precomputed input gates. gi_all: (T, B, 3H);
    returns the hidden-state stack (T, B, H)."""
    return _gru_rollout_fwd(w_hh, b_hh, gi_all, h0)[0]


def _gru_rollout_fwd(w_hh, b_hh, gi_all, h0):
    def step(h, gi):
        h_new, _, acts = rollout_cell_fwd("GRU", gi, h, None, w_hh, b_hh)
        return h_new, (h_new, acts)

    _, (hs, acts) = jax.lax.scan(step, h0, gi_all)
    return hs, (w_hh, hs, acts, h0)


def _gru_rollout_bwd(res, dhs):
    w_hh, hs, acts, h0 = res
    h_prev = jnp.concatenate([h0[None], hs[:-1]], 0)

    def step(dh_next, xs):
        dh_out, act, h_pv = xs
        dgi, dgh, dh_prev, _ = rollout_cell_bwd(
            "GRU", dh_next + dh_out, None, act, h_pv, None, None, w_hh)
        return dh_prev, (dgi, dgh)

    dh0, (dgi, dgh) = jax.lax.scan(
        step, jnp.zeros_like(h0), (dhs, acts, h_prev), reverse=True)
    dw_hh = jnp.einsum("tbh,tbg->hg", h_prev, dgh)
    db_hh = dgh.sum((0, 1))
    return dw_hh, db_hh, dgi, dh0


gru_rollout_pre.defvjp(_gru_rollout_fwd, _gru_rollout_bwd)


def rnn_rollout_pre(cell_type: str, params: Params, gi_all: jax.Array,
                    h0: jax.Array, c0: jax.Array) -> jax.Array:
    """Uniform whole-rollout interface over precomputed input gates."""
    if cell_type == "LSTM":
        return lstm_rollout_pre(params["w_hh"], params["b_hh"], gi_all,
                                h0, c0)
    elif cell_type == "GRU":
        return gru_rollout_pre(params["w_hh"], params["b_hh"], gi_all, h0)
    raise ValueError(f"Unknown cell type: {cell_type}")
