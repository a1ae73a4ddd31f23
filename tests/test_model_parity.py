"""End-to-end forward parity: fixed-shape JAX scan vs the torch oracle that
re-states the reference's dynamic-loop semantics (early break, per-step
masked-mean CE, reconstructor means over T_eff)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recnet_tpu.models import decoder as dec_mod
from recnet_tpu.models import reconstructors as rec_mod
from recnet_tpu.ops.losses import step_mean_ce

from torch_oracle import (OracleDecoder, OracleGlobalRecon, OracleLocalRecon,
                          oracle_forward_decoder)

B, F, ENC, V, E, H, A = 6, 7, 20, 37, 10, 16, 8
MAX_LEN = 12
T = MAX_LEN + 1


def _make_batch(rng, full_length=False):
    enc = rng.standard_normal((B, F, ENC)).astype(np.float32)
    lengths = np.full(B, T) if full_length else rng.integers(2, 9, B)
    targets = np.zeros((T, B), np.int32)
    for b in range(B):
        L = int(lengths[b])
        targets[: L - 1, b] = rng.integers(3, V, L - 1)
        targets[L - 1, b] = 2  # <EOS>
    return enc, targets


def _dec_cfg(cell_type):
    return dec_mod.DecoderConfig(
        cell_type=cell_type, n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=ENC, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
@pytest.mark.parametrize("full_length", [False, True])
def test_decoder_rollout_matches_oracle(cell_type, full_length, rng):
    cfg = _dec_cfg(cell_type)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(7), cfg)
    enc, targets = _make_batch(rng, full_length)

    oracle = OracleDecoder(params, cell_type)
    o_loss, o_hiddens, o_greedy = oracle_forward_decoder(
        oracle, enc, targets, MAX_LEN, teacher_forcing=True)
    t_eff = o_hiddens.shape[0]

    rollout = dec_mod.teacher_forced_rollout(
        params, cfg, jnp.asarray(enc), jnp.asarray(targets),
        use_teacher_forcing=jnp.asarray(True), rng=None, train=False)
    mask = jnp.asarray(targets) > 0
    ce, n_tok = step_mean_ce(rollout.logits, jnp.asarray(targets), mask)

    assert int(n_tok) == int((targets > 0).sum())
    np.testing.assert_allclose(float(ce), o_loss, rtol=2e-5, atol=2e-6)
    # hiddens agree on the executed prefix
    np.testing.assert_allclose(np.asarray(rollout.hiddens)[:t_eff],
                               o_hiddens, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(rollout.greedy_tokens)[:t_eff], o_greedy)


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
def test_decoder_greedy_feed_matches_oracle(cell_type, rng):
    """teacher_forcing=False: decoder feeds its own argmax (val-mode path)."""
    cfg = _dec_cfg(cell_type)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(3), cfg)
    enc, targets = _make_batch(rng)

    oracle = OracleDecoder(params, cell_type)
    o_loss, o_hiddens, o_greedy = oracle_forward_decoder(
        oracle, enc, targets, MAX_LEN, teacher_forcing=False)
    t_eff = o_hiddens.shape[0]

    rollout = dec_mod.teacher_forced_rollout(
        params, cfg, jnp.asarray(enc), jnp.asarray(targets),
        use_teacher_forcing=jnp.asarray(False), rng=None, train=False)
    mask = jnp.asarray(targets) > 0
    ce, _ = step_mean_ce(rollout.logits, jnp.asarray(targets), mask)

    np.testing.assert_array_equal(
        np.asarray(rollout.greedy_tokens)[:t_eff], o_greedy)
    np.testing.assert_allclose(float(ce), o_loss, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
def test_global_reconstructor_matches_oracle(cell_type, rng):
    dcfg = _dec_cfg("GRU")
    dec_params = dec_mod.init_decoder_params(jax.random.PRNGKey(11), dcfg)
    enc, targets = _make_batch(rng)

    oracle_dec = OracleDecoder(dec_params, "GRU")
    _, o_hiddens, _ = oracle_forward_decoder(oracle_dec, enc, targets, MAX_LEN)
    t_eff = o_hiddens.shape[0]

    rcfg = rec_mod.ReconstructorConfig(
        kind="global", cell_type=cell_type, n_layers=1,
        decoder_hidden_size=H, hidden_size=ENC, dropout=0.0,
        decoder_dropout=0.0, caption_max_len=MAX_LEN, encoder_output_len=F)
    rec_params = rec_mod.init_reconstructor_params(jax.random.PRNGKey(5), rcfg)

    o_loss = OracleGlobalRecon(rec_params, cell_type, MAX_LEN).loss(
        o_hiddens, enc)

    rollout = dec_mod.teacher_forced_rollout(
        dec_params, dcfg, jnp.asarray(enc), jnp.asarray(targets),
        use_teacher_forcing=jnp.asarray(True), rng=None, train=False)
    mask = (jnp.asarray(targets) > 0).astype(jnp.float32)
    step_mask = (mask.sum(1) > 0).astype(jnp.float32)
    assert int(step_mask.sum()) == t_eff
    j_loss = rec_mod.global_recon_loss(
        rec_params, rcfg, rollout.hiddens, jnp.asarray(enc), step_mask,
        jnp.float32(t_eff), rng=None, train=False)

    np.testing.assert_allclose(float(j_loss), o_loss, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
def test_local_reconstructor_matches_oracle(cell_type, rng):
    dcfg = _dec_cfg("GRU")
    dec_params = dec_mod.init_decoder_params(jax.random.PRNGKey(13), dcfg)
    enc, targets = _make_batch(rng)

    oracle_dec = OracleDecoder(dec_params, "GRU")
    _, o_hiddens, _ = oracle_forward_decoder(oracle_dec, enc, targets, MAX_LEN)
    t_eff = o_hiddens.shape[0]

    rcfg = rec_mod.ReconstructorConfig(
        kind="local", cell_type=cell_type, n_layers=1,
        decoder_hidden_size=H, hidden_size=ENC, attn_size=A, dropout=0.0,
        decoder_dropout=0.0, caption_max_len=MAX_LEN, encoder_output_len=F)
    rec_params = rec_mod.init_reconstructor_params(jax.random.PRNGKey(6), rcfg)

    o_loss = OracleLocalRecon(rec_params, cell_type, F).loss(o_hiddens, enc)

    rollout = dec_mod.teacher_forced_rollout(
        dec_params, dcfg, jnp.asarray(enc), jnp.asarray(targets),
        use_teacher_forcing=jnp.asarray(True), rng=None, train=False)
    mask = (jnp.asarray(targets) > 0).astype(jnp.float32)
    step_mask = (mask.sum(1) > 0).astype(jnp.float32)
    j_loss = rec_mod.local_recon_loss(
        rec_params, rcfg, rollout.hiddens, jnp.asarray(enc), step_mask,
        jnp.float32(t_eff), rng=None, train=False)

    np.testing.assert_allclose(float(j_loss), o_loss, rtol=2e-4, atol=1e-6)
