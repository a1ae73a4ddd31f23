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
