"""Parity test: unnormalized additive attention vs a torch transcription of the
reference math (reference: models/decoder.py:50-61). The torch side here is an
independent re-statement of those lines, used only as a test oracle."""

import numpy as np
import torch

import jax.numpy as jnp

from recnet_tpu.ops import attention


def _torch_oracle(W, U, b, w, query, values):
    """score = w·tanh(W q + U v + b); context = mean_t(score_t * v_t)."""
    q = torch.from_numpy(query)
    v = torch.from_numpy(values)
    Wh = q @ torch.from_numpy(W)                      # (B, A)
    Uv = v @ torch.from_numpy(U)                      # (B, T, A)
    alphas = torch.tanh(Wh[:, None, :] + Uv + torch.from_numpy(b))
    alphas = alphas @ torch.from_numpy(w)             # (B, T, 1)
    weighted = alphas.expand_as(v) * v                # broadcast like decoder.py:59
    return weighted.mean(dim=1).numpy()


def test_attend_mean_matches_reference_math(rng):
    B, T, H, V, A = 3, 28, 512, 64, 16
    W = rng.standard_normal((H, A), dtype=np.float32) * 0.05
    U = rng.standard_normal((V, A), dtype=np.float32) * 0.05
    b = np.ones((A,), dtype=np.float32)
    w = rng.standard_normal((A, 1), dtype=np.float32) * 0.05
    query = rng.standard_normal((B, H), dtype=np.float32)
    values = rng.standard_normal((B, T, V), dtype=np.float32)

    params = {"W": jnp.asarray(W), "U": jnp.asarray(U),
              "b": jnp.asarray(b), "w": jnp.asarray(w)}
    uv = attention.precompute_uv(params, jnp.asarray(values))
    ctx = attention.attend_mean(params, jnp.asarray(query), jnp.asarray(values), uv)

    expected = _torch_oracle(W, U, b, w, query, values)
    np.testing.assert_allclose(np.asarray(ctx), expected, rtol=1e-4, atol=1e-5)


def test_attend_mean_masked_matches_dynamic_slice(rng):
    """Fixed-shape masked attention == dynamic-length attention over T_eff."""
    B, T, Teff, V, A, H = 2, 31, 11, 24, 8, 12
    params = {
        "W": jnp.asarray(rng.standard_normal((H, A), dtype=np.float32)),
        "U": jnp.asarray(rng.standard_normal((V, A), dtype=np.float32)),
        "b": jnp.ones((A,), jnp.float32),
        "w": jnp.asarray(rng.standard_normal((A, 1), dtype=np.float32)),
    }
    query = jnp.asarray(rng.standard_normal((B, H), dtype=np.float32))
    values = jnp.asarray(rng.standard_normal((B, T, V), dtype=np.float32))

    # dynamic: slice to T_eff, plain mean
    uv_dyn = attention.precompute_uv(params, values[:, :Teff])
    ctx_dyn = attention.attend_mean(params, query, values[:, :Teff], uv_dyn)

    # fixed: full T with mask + denom
    mask = (jnp.arange(T) < Teff).astype(jnp.float32)[None, :].repeat(B, 0)
    uv = attention.precompute_uv(params, values)
    ctx_fix = attention.attend_mean(params, query, values, uv, mask=mask,
                                    denom=jnp.float32(Teff))

    np.testing.assert_allclose(np.asarray(ctx_fix), np.asarray(ctx_dyn),
                               rtol=1e-4, atol=1e-5)


def test_no_softmax_applied(rng):
    """Scores must be raw (can exceed any prob simplex) — reference quirk."""
    B, T, V, A, H = 1, 4, 3, 2, 3
    params = {
        "W": jnp.zeros((H, A), jnp.float32),
        "U": jnp.zeros((V, A), jnp.float32),
        "b": jnp.ones((A,), jnp.float32) * 5.0,   # tanh(5) ~ 1
        "w": jnp.ones((A, 1), jnp.float32) * 3.0,
    }
    query = jnp.zeros((B, H), jnp.float32)
    values = jnp.ones((B, T, V), jnp.float32)
    uv = attention.precompute_uv(params, values)
    scores = attention.attention_scores(params, query, uv)
    # each score ~= 2*3*tanh(5) ~= 5.999 — unnormalized, sums way past 1
    assert float(jnp.min(scores)) > 5.0
