"""Pallas fused attention+GRU step: parity vs the plain-XLA restatement
(interpret mode on CPU) and vs decoder_step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recnet_tpu.models import decoder as dec_mod
from recnet_tpu.ops import attention as attn_ops
from recnet_tpu.ops.pallas.fused_step import (
    fused_gru_attn_step, gru_attn_step_reference, pack_gru_bias)

B, L, F, E, H, A, V = 16, 7, 24, 12, 16, 8, 40


def _inputs(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3,
                                dtype=dtype)
    emb = mk(B, E)
    h = mk(B, H)
    enc = mk(B, L, F)
    attn_w = mk(H, A)
    attn_v = mk(A, 1)
    attn_b = jnp.ones((1, A), dtype)
    w_ih = mk(E + F, 3 * H)
    w_hh = mk(H, 3 * H)
    b_ih = mk(3 * H)
    b_hh = mk(3 * H)
    uv = mk(B, L, A)
    return emb, h, enc, uv, attn_w, attn_v, attn_b, w_ih, w_hh, b_ih, b_hh


def test_fused_step_matches_reference_interpret():
    (emb, h, enc, uv, attn_w, attn_v, attn_b,
     w_ih, w_hh, b_ih, b_hh) = _inputs()
    expected = gru_attn_step_reference(
        emb, h, enc, uv, attn_w, attn_v, attn_b, w_ih, w_hh, b_ih, b_hh, E)
    got = fused_gru_attn_step(
        emb, h, enc, uv, attn_w, attn_v, attn_b, w_ih, w_hh,
        pack_gru_bias(b_ih, b_hh), emb_size=E, block_b=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-5, atol=2e-6)


def test_fused_step_matches_decoder_step_interpret():
    """Same math as models.decoder.decoder_step (eval mode, GRU)."""
    cfg = dec_mod.DecoderConfig(
        cell_type="GRU", n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))
    token = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    state = dec_mod.zero_state(cfg, B)
    uv = attn_ops.precompute_uv(params["attention"], enc)

    logits, (h_new, _) = dec_mod.decoder_step(
        params, cfg, token, state, enc, uv)

    emb = params["embedding"][token] * cfg.embedding_scale
    r = params["rnn"][0]
    a = params["attention"]
    h_fused = fused_gru_attn_step(
        emb, state[0][0], enc, uv, a["W"], a["w"], a["b"][None, :],
        r["w_ih"], r["w_hh"], pack_gru_bias(r["b_ih"], r["b_hh"]),
        emb_size=E, block_b=8, interpret=True)

    np.testing.assert_allclose(np.asarray(h_fused), np.asarray(h_new[0]),
                               rtol=2e-5, atol=2e-6)
    # and the logits computed from the fused h match
    logits_fused = h_fused @ params["out_w"] + params["out_b"]
    np.testing.assert_allclose(np.asarray(logits_fused), np.asarray(logits),
                               rtol=2e-4, atol=2e-5)


def test_pallas_greedy_decode_matches_xla(rng):
    from recnet_tpu.decoding import greedy_decode, greedy_decode_pallas

    cfg = dec_mod.DecoderConfig(
        cell_type="GRU", n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(5), cfg)
    params = dict(params, out_w=params["out_w"] * 8.0)  # force EOS/PAD emission
    enc = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))

    ref = greedy_decode(params, cfg, enc, 9)
    got = greedy_decode_pallas(params, cfg, enc, 9, block_b=8, interpret=True)
    assert int(got.n_steps) == int(ref.n_steps)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))


def test_fused_step_frame_chunking(rng):
    """frame_chunk > 1 produces identical results."""
    (emb, h, enc, uv, attn_w, attn_v, attn_b,
     w_ih, w_hh, b_ih, b_hh) = _inputs(seed=4)
    base = fused_gru_attn_step(
        emb, h, enc, uv, attn_w, attn_v, attn_b, w_ih, w_hh,
        pack_gru_bias(b_ih, b_hh), emb_size=E, block_b=8, frame_chunk=1,
        interpret=True)
    chunked = fused_gru_attn_step(
        emb, h, enc, uv, attn_w, attn_v, attn_b, w_ih, w_hh,
        pack_gru_bias(b_ih, b_hh), emb_size=E, block_b=8, frame_chunk=7,
        interpret=True)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(base),
                               rtol=1e-6, atol=1e-7)


def test_whole_decode_kernel_matches_xla(rng):
    from recnet_tpu.decoding import greedy_decode, greedy_decode_whole

    cfg = dec_mod.DecoderConfig(
        cell_type="GRU", n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(9), cfg)
    params = dict(params, out_w=params["out_w"] * 8.0)
    enc = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))

    ref = greedy_decode(params, cfg, enc, 9)
    got = greedy_decode_whole(params, cfg, enc, 9, block_b=8, interpret=True)
    n = int(ref.n_steps)
    assert int(got.n_steps) == n
    np.testing.assert_array_equal(np.asarray(got.tokens)[:n],
                                  np.asarray(ref.tokens)[:n])


def test_whole_decode_early_exit_matches(rng):
    """early_exit while_loop variant == fori variant on the executed prefix
    (single tile: exact reference break semantics)."""
    from recnet_tpu.decoding import greedy_decode_whole

    cfg = dec_mod.DecoderConfig(
        cell_type="GRU", n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(9), cfg)
    params = dict(params, out_w=params["out_w"] * 8.0)
    enc = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))

    full = greedy_decode_whole(params, cfg, enc, 9, block_b=B, interpret=True)
    fast = greedy_decode_whole(params, cfg, enc, 9, block_b=B,
                               early_exit=True, interpret=True)
    n = int(full.n_steps)
    assert int(fast.n_steps) == n
    np.testing.assert_array_equal(np.asarray(fast.tokens)[:n],
                                  np.asarray(full.tokens)[:n])


def test_whole_decode_lstm_matches_xla(rng):
    from recnet_tpu.decoding import greedy_decode, greedy_decode_whole

    cfg = dec_mod.DecoderConfig(
        cell_type="LSTM", n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(11), cfg)
    params = dict(params, out_w=params["out_w"] * 8.0)
    enc = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))

    ref = greedy_decode(params, cfg, enc, 9)
    got = greedy_decode_whole(params, cfg, enc, 9, block_b=8, interpret=True)
    n = int(ref.n_steps)
    assert int(got.n_steps) == n
    np.testing.assert_array_equal(np.asarray(got.tokens)[:n],
                                  np.asarray(ref.tokens)[:n])

def test_whole_decode_intkey_argmax_matches_native(rng):
    """The production argmax (order-preserving int-key + min-iota; 4.8%
    faster than Mosaic's jnp.argmax lowering) picks the identical
    first-occurrence-of-max token as the native lowering."""
    from recnet_tpu.ops.pallas.whole_decode import whole_greedy_decode

    cfg = dec_mod.DecoderConfig(
        cell_type="GRU", n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    for seed in (3, 7):
        params = dec_mod.init_decoder_params(jax.random.PRNGKey(seed), cfg)
        enc = jnp.asarray(
            rng.standard_normal((B, L, F)).astype(np.float32))
        uv = attn_ops.precompute_uv(params["attention"], enc)
        r = params["rnn"][0]
        bias2 = jnp.stack([r["b_ih"], r["b_hh"]])
        kw = dict(emb_size=cfg.embedding_size, max_len=9, block_b=8,
                  sos=cfg.sos_token, cell_type=cfg.cell_type, interpret=True)
        got = whole_greedy_decode(params, enc, uv, bias2, **kw)
        ref = whole_greedy_decode(params, enc, uv, bias2,
                                  ablate="nativeargmax", **kw)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_whole_decode_intkey_ties_pick_first_index():
    """Exact-tie logits: the int-key argmax must pick the FIRST index of
    the max (jnp.argmax semantics) — forced by zero weights (all logits
    equal out_b) and a bias with a duplicated maximum."""
    from recnet_tpu.ops.pallas.whole_decode import whole_greedy_decode

    cfg = dec_mod.DecoderConfig(
        cell_type="GRU", n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(0), cfg)
    out_b = np.full((V,), -1.0, np.float32)
    out_b[[5, 17]] = 2.5                     # exact duplicate maximum
    params = dict(params, out_w=jnp.zeros_like(params["out_w"]),
                  out_b=jnp.asarray(out_b))
    enc = jnp.zeros((B, L, F), jnp.float32)
    uv = attn_ops.precompute_uv(params["attention"], enc)
    r = params["rnn"][0]
    bias2 = jnp.stack([r["b_ih"], r["b_hh"]])
    toks = whole_greedy_decode(
        params, enc, uv, bias2, emb_size=cfg.embedding_size, max_len=3,
        block_b=8, sos=cfg.sos_token, cell_type=cfg.cell_type,
        interpret=True)
    assert (np.asarray(toks) == 5).all()


def test_whole_decode_dual_matches_single(rng):
    """The experimental interleaved-halves kernel (dual=True) is
    token-exact vs the production single-stream kernel (measured only
    +1.7% on hardware — kept as the scaffold for engine-overlap
    experiments; DESIGN.md §3)."""
    from recnet_tpu.ops.pallas.whole_decode import whole_greedy_decode

    for cell in ("GRU", "LSTM"):
        cfg = dec_mod.DecoderConfig(
            cell_type=cell, n_layers=1, vocab_size=V, embedding_size=E,
            embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
            embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
        params = dec_mod.init_decoder_params(jax.random.PRNGKey(4), cfg)
        enc = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))
        uv = attn_ops.precompute_uv(params["attention"], enc)
        r = params["rnn"][0]
        bias2 = jnp.stack([r["b_ih"], r["b_hh"]])
        kw = dict(emb_size=cfg.embedding_size, max_len=9, block_b=B,
                  sos=cfg.sos_token, cell_type=cfg.cell_type, interpret=True)
        one = whole_greedy_decode(params, enc, uv, bias2, **kw)
        two = whole_greedy_decode(params, enc, uv, bias2, dual=True, **kw)
        np.testing.assert_array_equal(np.asarray(two), np.asarray(one))


def test_whole_decode_rejects_indivisible_block_b(rng):
    """Argument validation must survive python -O: an indivisible block_b
    raises ValueError instead of silently truncating the tail tile."""
    from recnet_tpu.decoding import greedy_decode_whole

    cfg = dec_mod.DecoderConfig(
        cell_type="GRU", n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(3), cfg)
    enc = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))
    with pytest.raises(ValueError, match="block_b"):
        greedy_decode_whole(params, cfg, enc, 9, block_b=6, interpret=True)


@pytest.mark.parametrize("cell", ["GRU", "LSTM"])
@pytest.mark.parametrize("segment", [3, 5, 10, 12])
def test_whole_decode_segmented_matches(rng, cell, segment):
    """Segmented whole-decode (device-level early exit between N-step
    Pallas segments) == the single whole kernel on the executed prefix,
    across multi-tile batches and segment lengths that don't divide T."""
    from recnet_tpu.decoding import (greedy_decode_whole,
                                     greedy_decode_whole_segmented)

    cfg = dec_mod.DecoderConfig(
        cell_type=cell, n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(9), cfg)
    params = dict(params, out_w=params["out_w"] * 8.0)
    enc = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))

    full = greedy_decode_whole(params, cfg, enc, 9, block_b=8,
                               interpret=True)
    seg = greedy_decode_whole_segmented(params, cfg, enc, 9, block_b=8,
                                        segment=segment, interpret=True)
    n = int(full.n_steps)
    assert int(seg.n_steps) == n
    np.testing.assert_array_equal(np.asarray(seg.tokens)[:n],
                                  np.asarray(full.tokens)[:n])


def test_whole_decode_segmented_early_stop(rng):
    """A model that emits <PAD> immediately stops at the first segment
    boundary with the same n_steps/prefix as the full kernel."""
    from recnet_tpu.decoding import (greedy_decode_whole,
                                     greedy_decode_whole_segmented)

    cfg = dec_mod.DecoderConfig(
        cell_type="GRU", n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(9), cfg)
    params = dict(params,
                  out_b=params["out_b"].at[cfg.pad_token].set(50.0))
    enc = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))

    full = greedy_decode_whole(params, cfg, enc, 9, block_b=8,
                               interpret=True)
    seg = greedy_decode_whole_segmented(params, cfg, enc, 9, block_b=8,
                                        segment=4, interpret=True)
    assert int(full.n_steps) == 1
    assert int(seg.n_steps) == 1
    np.testing.assert_array_equal(np.asarray(seg.tokens)[:1],
                                  np.asarray(full.tokens)[:1])


def test_whole_decode_segmented_eos_stop_sentence_exact(rng):
    """eos_stop=True stops once every row has a first <EOS>; tokens beyond
    the stop are PAD-filled, but sentences (cut at first EOS, the contract
    of every consumer — reference utils.py:11-20) are EXACT."""
    from recnet_tpu.decoding import (greedy_decode_whole,
                                     greedy_decode_whole_segmented,
                                     tokens_to_sentences)

    cfg = dec_mod.DecoderConfig(
        cell_type="GRU", n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=F, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(9), cfg)
    # bias <EOS> so every row terminates in the first few steps but the
    # all-<PAD> break never fires (like a trained model)
    params = dict(params, out_w=params["out_w"] * 8.0,
                  out_b=params["out_b"].at[cfg.eos_token].set(6.0))
    enc = jnp.asarray(rng.standard_normal((B, L, F)).astype(np.float32))

    full = greedy_decode_whole(params, cfg, enc, 9, block_b=8,
                               interpret=True)
    seg = greedy_decode_whole_segmented(params, cfg, enc, 9, block_b=8,
                                        segment=3, eos_stop=True,
                                        interpret=True)
    idx2word = {i: f"w{i}" for i in range(V)}
    s_full = tokens_to_sentences(
        np.asarray(full.tokens)[: int(full.n_steps)], idx2word,
        cfg.eos_token)
    s_seg = tokens_to_sentences(
        np.asarray(seg.tokens)[: int(seg.n_steps)], idx2word, cfg.eos_token)
    assert s_seg == s_full
    # the stop engaged: fewer valid steps reported than the full kernel
    assert int(seg.n_steps) <= int(full.n_steps)
