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
