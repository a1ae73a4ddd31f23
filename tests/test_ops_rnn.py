"""Parity tests: our functional cells vs torch.nn.LSTM/GRU (CPU).

The reference's compute path is stock torch RNN cells (reference:
models/decoder.py:32-40); these tests pin our JAX cells to the same math.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from recnet_tpu.ops import rnn


def _torch_rnn(cell_type, input_size, hidden_size, seed):
    torch.manual_seed(seed)
    cls = torch.nn.LSTM if cell_type == "LSTM" else torch.nn.GRU
    return cls(input_size=input_size, hidden_size=hidden_size, num_layers=1)


def _params_from_torch(mod):
    return {
        "w_ih": jnp.asarray(mod.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(mod.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(mod.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(mod.bias_hh_l0.detach().numpy()),
    }


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
def test_cell_matches_torch_single_step(cell_type, rng):
    B, I, H = 5, 12, 9
    mod = _torch_rnn(cell_type, I, H, seed=0)
    params = _params_from_torch(mod)

    x = rng.standard_normal((B, I), dtype=np.float32)
    h0 = rng.standard_normal((B, H), dtype=np.float32)
    c0 = rng.standard_normal((B, H), dtype=np.float32)

    with torch.no_grad():
        if cell_type == "LSTM":
            out, (ht, ct) = mod(torch.from_numpy(x[None]),
                                (torch.from_numpy(h0[None]), torch.from_numpy(c0[None])))
        else:
            out, ht = mod(torch.from_numpy(x[None]), torch.from_numpy(h0[None]))

    state = (jnp.asarray(h0), jnp.asarray(c0))
    new_state = rnn.rnn_step(cell_type, params, jnp.asarray(x), state)

    np.testing.assert_allclose(np.asarray(new_state[0]), ht[0].numpy(),
                               rtol=1e-5, atol=1e-5)
    if cell_type == "LSTM":
        np.testing.assert_allclose(np.asarray(new_state[1]), ct[0].numpy(),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
def test_cell_matches_torch_rollout(cell_type, rng):
    """Multi-step rollout through lax.scan vs torch sequence forward."""
    B, I, H, T = 4, 8, 16, 13
    mod = _torch_rnn(cell_type, I, H, seed=1)
    params = _params_from_torch(mod)

    xs = rng.standard_normal((T, B, I), dtype=np.float32)
    with torch.no_grad():
        out, _ = mod(torch.from_numpy(xs))

    def step(state, x):
        new_state = rnn.rnn_step(cell_type, params, x, state)
        return new_state, new_state[0]

    init = rnn.zero_state(B, H)
    _, hs = jax.lax.scan(step, init, jnp.asarray(xs))

    np.testing.assert_allclose(np.asarray(hs), out.numpy(), rtol=1e-5, atol=1e-5)


def test_init_shapes():
    key = jax.random.PRNGKey(0)
    p = rnn.init_rnn_params(key, "LSTM", 10, 7)
    assert p["w_ih"].shape == (10, 28)
    assert p["w_hh"].shape == (7, 28)
    p = rnn.init_rnn_params(key, "GRU", 10, 7)
    assert p["w_ih"].shape == (10, 21)
    bound = 1.0 / np.sqrt(7)
    assert np.all(np.abs(np.asarray(p["w_ih"])) <= bound)


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
def test_rollout_pre_value_and_grads_match_scan_autodiff(cell_type, rng):
    """The custom-VJP whole-rollout core (out-of-scan W_hh gradient,
    ops/rnn.py) must agree with plain autodiff through a lax.scan of the
    per-step cell — values and ALL gradients (w_hh, b_hh, gi, h0, c0)."""
    T, B, H = 7, 5, 6
    key = jax.random.PRNGKey(3)
    params = rnn.init_rnn_params(key, cell_type, H, H)
    n_gates = 4 if cell_type == "LSTM" else 3
    gi = jnp.asarray(rng.standard_normal((T, B, n_gates * H)), jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    c0 = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    # a non-trivial downstream loss so every step's output gets a cotangent
    w_loss = jnp.asarray(rng.standard_normal((T, B, H)), jnp.float32)

    def loss_scan(w_hh, b_hh, gi, h0, c0):
        p = dict(params, w_hh=w_hh, b_hh=b_hh)

        def step(state, gi_t):
            new_state = rnn.rnn_step_pre(cell_type, p, gi_t, state)
            return new_state, new_state[0]

        _, hs = jax.lax.scan(step, (h0, c0), gi)
        return jnp.sum(hs * w_loss), hs

    def loss_core(w_hh, b_hh, gi, h0, c0):
        p = dict(params, w_hh=w_hh, b_hh=b_hh)
        hs = rnn.rnn_rollout_pre(cell_type, p, gi, h0, c0)
        return jnp.sum(hs * w_loss), hs

    args = (params["w_hh"], params["b_hh"], gi, h0, c0)
    (l1, hs1), g1 = jax.value_and_grad(loss_scan, argnums=(0, 1, 2, 3, 4),
                                       has_aux=True)(*args)
    (l2, hs2), g2 = jax.value_and_grad(loss_core, argnums=(0, 1, 2, 3, 4),
                                       has_aux=True)(*args)
    np.testing.assert_allclose(np.asarray(hs1), np.asarray(hs2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    names = ["w_hh", "b_hh", "gi", "h0", "c0"]
    for n, a, b in zip(names, g1, g2):
        if cell_type == "GRU" and n == "c0":
            continue  # GRU carries no cell state; scan echoes c0 (zero grad)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=n)
