"""teacher_forced_rollout_fast == teacher_forced_rollout(use_tf=True) in
eval mode, and the specialized train step still learns."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recnet_tpu.config import TrainConfig
from recnet_tpu.models import decoder as dec_mod
from recnet_tpu.training.step import init_train_state, build_train_step


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
def test_fast_rollout_matches_generic(cell_type, rng):
    B, F, ENC, V, E, H, A, T = 5, 6, 18, 29, 9, 14, 7, 11
    cfg = dec_mod.DecoderConfig(
        cell_type=cell_type, n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=ENC, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(2), cfg)
    enc = jnp.asarray(rng.standard_normal((B, F, ENC)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, V, (T, B)).astype(np.int32))

    generic = dec_mod.teacher_forced_rollout(
        params, cfg, enc, targets, jnp.asarray(True))
    fast = dec_mod.teacher_forced_rollout_fast(params, cfg, enc, targets)

    np.testing.assert_allclose(np.asarray(fast.logits),
                               np.asarray(generic.logits),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fast.hiddens),
                               np.asarray(generic.hiddens),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fast.greedy_tokens),
                                  np.asarray(generic.greedy_tokens))


def test_specialized_train_step_learns(rng):
    tc = TrainConfig(
        caption_max_len=8, batch_size=4, embedding_size=12,
        encoder_output_size=20, encoder_output_len=6,
        decoder_hidden_size=16, decoder_attn_size=8,
        reconstructor_hidden_size=20, reconstructor_attn_size=8,
        decoder_learning_rate=1e-2,
        decoder_teacher_forcing_ratio=1.0,   # triggers the fast path
        use_recon=True, reconstructor_type="global")
    V = 25
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    step = build_train_step(tc, dcfg, rcfg)

    T = tc.caption_max_len + 1
    videos = jnp.asarray(rng.standard_normal(
        (tc.batch_size, tc.encoder_output_len, tc.encoder_output_size)
    ).astype(np.float32))
    targets = np.zeros((T, tc.batch_size), np.int32)
    for b in range(tc.batch_size):
        L = int(rng.integers(2, T))
        targets[: L - 1, b] = rng.integers(3, V, L - 1)
        targets[L - 1, b] = 2
    captions = jnp.asarray(targets)

    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(25):
        state, m = step(state, videos, captions, key)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
def test_fast_rollout_grads_match_generic(cell_type, rng):
    """The fast path's custom-VJP rollout (_tf_attn_rollout: out-of-scan
    w_ih/w_hh/d(enc) contractions) must match scan-autodiff through the
    generic rollout — gradients w.r.t. every decoder parameter AND the
    encoder outputs."""
    B, F, ENC, V, E, H, A, T = 4, 5, 12, 17, 8, 10, 6, 9
    cfg = dec_mod.DecoderConfig(
        cell_type=cell_type, n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=ENC, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(4), cfg)
    enc = jnp.asarray(rng.standard_normal((B, F, ENC)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, V, (T, B)).astype(np.int32))
    wl = jnp.asarray(rng.standard_normal((T, B, V)).astype(np.float32))
    wh = jnp.asarray(rng.standard_normal((T, 1, B, H)).astype(np.float32))

    def loss(p, e, fast):
        r = (dec_mod.teacher_forced_rollout_fast(p, cfg, e, targets)
             if fast else
             dec_mod.teacher_forced_rollout(p, cfg, e, targets,
                                            jnp.asarray(True)))
        return jnp.sum(r.logits * wl) + jnp.sum(r.hiddens * wh)

    v1, (gp1, ge1) = jax.value_and_grad(
        lambda p, e: loss(p, e, True), argnums=(0, 1))(params, enc)
    v2, (gp2, ge2) = jax.value_and_grad(
        lambda p, e: loss(p, e, False), argnums=(0, 1))(params, enc)

    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ge1), np.asarray(ge2),
                               rtol=1e-5, atol=1e-6)
    flat1, _ = jax.tree_util.tree_flatten_with_path(gp1)
    flat2, _ = jax.tree_util.tree_flatten_with_path(gp2)
    for (path, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
