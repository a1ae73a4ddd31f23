"""Greedy/beam decode parity vs a NumPy/torch transcription of eval.py:19-120."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from recnet_tpu.models import decoder as dec_mod
from recnet_tpu.decoding import greedy_decode, beam_decode, tokens_to_sentences

from torch_oracle import OracleDecoder

B, F, ENC, V, E, H, A = 4, 6, 18, 23, 8, 12, 7
MAX_LEN = 9
PAD, SOS, EOS = 0, 1, 2


def _cfg(cell_type):
    return dec_mod.DecoderConfig(
        cell_type=cell_type, n_layers=1, vocab_size=V, embedding_size=E,
        embedding_scale=1.0, encoder_size=ENC, hidden_size=H, attn_size=A,
        embedding_dropout=0.0, dropout=0.0, out_dropout=0.0,
        sos_token=SOS, pad_token=PAD, eos_token=EOS)


@torch.no_grad()
def oracle_greedy(dec, enc, max_len):
    """reference eval.py:19-33."""
    enc = torch.from_numpy(enc).float()
    Bn = enc.shape[0]
    hidden = (torch.zeros(1, Bn, H), torch.zeros(1, Bn, H))
    token = torch.full((Bn,), SOS, dtype=torch.long)
    outputs = []
    for t in range(max_len + 1):
        logits, hidden = dec.step(token, hidden, enc)
        token = logits.argmax(dim=1)
        outputs.append(token.clone().numpy())
        if t == max_len or bool((token == PAD).all()):
            break
    return np.stack(outputs)  # (n_steps, B)


@torch.no_grad()
def oracle_beam(dec, enc, beam_width, max_len):
    """Transcription of reference eval.py:36-120 (list-based beams)."""
    enc = torch.from_numpy(enc).float()
    Bn = enc.shape[0]
    K = beam_width
    input_list = [torch.full((Bn,), SOS, dtype=torch.long)]
    hidden_list = [(torch.zeros(1, Bn, H), torch.zeros(1, Bn, H))]
    cum_prob_list = [torch.zeros(Bn)]          # log(1) = 0
    output_list = [[[]] for _ in range(Bn)]

    for t in range(max_len + 1):
        outputs = None
        tmp_next_hidden = []
        for i, (inp, hid, cum) in enumerate(
                zip(input_list, hidden_list, cum_prob_list)):
            logits, nh = dec.step(inp, hid, enc)
            tmp_next_hidden.append(nh)

            np_out = np.asarray(output_list, dtype=np.int64) \
                if t > 0 else np.zeros((Bn, 1, 0), np.int64)
            rows, cols = np.where(np_out[:, i] == EOS)
            seq_len = np.full(Bn, t + 1, np.float64)
            seq_len[rows] = cols + 1           # later (larger col) wins
            seq_len = torch.from_numpy(seq_len ** 0.7).float()

            pen = cum / seq_len
            out = torch.log(torch.sigmoid(logits)) + pen[:, None]
            outputs = out if outputs is None else torch.cat([outputs, out], 1)

        topk_probs, topk_flat = outputs.topk(K)
        topk_probs = topk_probs.T              # (K, B)
        topk_flat = topk_flat.T
        topk_idxs = topk_flat % V
        topk_is = topk_flat // V

        next_hidden_list = []
        for k in range(K):
            hs, cs = [], []
            for b in range(Bn):
                src = int(topk_is[k][b])
                hs.append(tmp_next_hidden[src][0][:, b])
                cs.append(tmp_next_hidden[src][1][:, b])
            next_hidden_list.append(
                (torch.stack(hs, 1), torch.stack(cs, 1)))

        next_output_list = [[] for _ in range(Bn)]
        for k in range(K):
            for b in range(Bn):
                src = int(topk_is[k][b])
                next_output_list[b].append(
                    output_list[b][src] + [int(topk_idxs[k][b])])

        input_list = [topk_idxs[k] for k in range(K)]
        hidden_list = next_hidden_list
        cum_prob_list = [topk_probs[k] for k in range(K)]
        output_list = next_output_list

        if t == max_len or bool((torch.stack(input_list) == PAD).all()):
            break

    return np.asarray([out[0] for out in output_list])  # (B, n_steps)


def _setup(cell_type, seed, peaky=True):
    cfg = _cfg(cell_type)
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(seed), cfg)
    if peaky:
        # scale up the output projection so EOS/PAD get emitted and the
        # early-stop paths get exercised
        params = dict(params)
        params["out_w"] = params["out_w"] * 8.0
    rng = np.random.default_rng(seed)
    enc = rng.standard_normal((B, F, ENC)).astype(np.float32)
    return cfg, params, enc


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_greedy_matches_oracle(cell_type, seed):
    cfg, params, enc = _setup(cell_type, seed)
    oracle = OracleDecoder(params, cell_type)
    o_tokens = oracle_greedy(oracle, enc, MAX_LEN)

    res = greedy_decode(params, cfg, jnp.asarray(enc), MAX_LEN)
    n = int(res.n_steps)
    assert n == o_tokens.shape[0]
    np.testing.assert_array_equal(np.asarray(res.tokens)[:n], o_tokens)


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
@pytest.mark.parametrize("seed,K", [(0, 3), (1, 3), (2, 3), (0, 5)])
def test_beam_matches_oracle(cell_type, seed, K):
    cfg, params, enc = _setup(cell_type, seed)
    oracle = OracleDecoder(params, cell_type)
    o_top1 = oracle_beam(oracle, enc, K, MAX_LEN)   # (B, n_steps)

    res = beam_decode(params, cfg, jnp.asarray(enc), K, MAX_LEN)
    n = int(res.n_steps)
    assert n == o_top1.shape[1]
    np.testing.assert_array_equal(np.asarray(res.tokens)[:, :n], o_top1)


def test_tokens_to_sentences():
    idx2word = {0: "<PAD>", 1: "<SOS>", 2: "<EOS>", 3: "cat", 4: "runs"}
    idxs = np.array([[3, 3], [4, 2], [2, 4]])  # (T=3, B=2)
    sents = tokens_to_sentences(idxs, idx2word, eos_token=2)
    assert sents == ["cat runs", "cat"]


def test_sample_decode_shapes_and_determinism():
    from recnet_tpu.decoding import sample_decode
    cfg = _cfg("GRU")
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(5)
    enc = jnp.asarray(rng.standard_normal((B, F, ENC)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    r1 = sample_decode(params, cfg, enc, MAX_LEN, key, temperature=1.0)
    r2 = sample_decode(params, cfg, enc, MAX_LEN, key, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
    assert r1.tokens.shape == (MAX_LEN + 1, B)
    # different key -> (almost surely) different tokens
    r3 = sample_decode(params, cfg, enc, MAX_LEN, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(r1.tokens), np.asarray(r3.tokens))


def test_sample_decode_low_temperature_approaches_greedy():
    from recnet_tpu.decoding import sample_decode, greedy_decode
    cfg = _cfg("GRU")
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(6)
    enc = jnp.asarray(rng.standard_normal((B, F, ENC)).astype(np.float32))
    g = greedy_decode(params, cfg, enc, MAX_LEN)
    s = sample_decode(params, cfg, enc, MAX_LEN, jax.random.PRNGKey(0),
                      temperature=1e-4)
    n = min(int(g.n_steps), int(s.n_steps))
    np.testing.assert_array_equal(np.asarray(s.tokens)[:n],
                                  np.asarray(g.tokens)[:n])


def test_sample_decode_top_k_restricts_support():
    from recnet_tpu.decoding import sample_decode
    cfg = _cfg("GRU")
    params = dec_mod.init_decoder_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(7)
    enc = jnp.asarray(rng.standard_normal((B, F, ENC)).astype(np.float32))
    # top_k=1 == greedy chain
    from recnet_tpu.decoding import greedy_decode
    g = greedy_decode(params, cfg, enc, MAX_LEN)
    s = sample_decode(params, cfg, enc, MAX_LEN, jax.random.PRNGKey(3),
                      top_k=1)
    n = min(int(g.n_steps), int(s.n_steps))
    np.testing.assert_array_equal(np.asarray(s.tokens)[:n],
                                  np.asarray(g.tokens)[:n])


@pytest.mark.parametrize("cell_type", ["LSTM", "GRU"])
def test_greedy_early_exit_matches_scan(cell_type):
    """early_exit (while_loop, the reference's actual break) produces
    identical tokens/n_steps to the fixed scan."""
    cfg, params, enc = _setup(cell_type, 1)   # peaky -> terminates early
    a = greedy_decode(params, cfg, jnp.asarray(enc), MAX_LEN)
    b = greedy_decode(params, cfg, jnp.asarray(enc), MAX_LEN,
                      early_exit=True)
    assert int(a.n_steps) == int(b.n_steps)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


@pytest.mark.parametrize("cell_type,K", [("GRU", 5), ("LSTM", 3)])
def test_beam_early_exit_matches_scan(cell_type, K):
    cfg, params, enc = _setup(cell_type, 2)
    a = beam_decode(params, cfg, jnp.asarray(enc), K, MAX_LEN)
    b = beam_decode(params, cfg, jnp.asarray(enc), K, MAX_LEN,
                    early_exit=True)
    assert int(a.n_steps) == int(b.n_steps)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    # while_loop and scan compile to differently-fused programs; scores
    # agree to f32 rounding (tokens above are exact)
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               rtol=1e-5)


@pytest.mark.parametrize("cell_type", ["GRU", "LSTM"])
def test_beam_saturated_logits_tie_break_by_word_index(cell_type):
    """Round-2's documented edge, now guarded (decoding.py per_beam_topk):
    two DISTINCT logits saturating log_sigmoid to exactly 0.0 must rank by
    word index (the flat-top-K tie order), not by raw logit. Constructed
    by zeroing out_w and planting two saturated biases — log_sigmoid(110)
    == log_sigmoid(111) == 0.0 exactly (exp(-110) underflows even the
    subnormal range), so a flat top-K over the scores ties and keeps the
    LOWER word index first despite its smaller raw logit."""
    cfg, params, enc = _setup(cell_type, 0, peaky=False)
    params = dict(params)
    params["out_w"] = params["out_w"] * 0.0
    wa, wb = 5, 9                      # wa < wb, logit(wa) < logit(wb)
    out_b = np.zeros(V, np.float32)
    out_b[wa] = 110.0
    out_b[wb] = 111.0
    params["out_b"] = jnp.asarray(out_b)
    res = beam_decode(params, cfg, jnp.asarray(enc), 3, MAX_LEN)
    assert np.asarray(res.tokens)[:, 0].tolist() == [wa] * B


@pytest.mark.parametrize("cell_type,K,seed", [("GRU", 5, 0), ("GRU", 3, 1),
                                              ("LSTM", 3, 2)])
def test_beam_length_cutoff_sentences_match_full_scan(cell_type, K, seed):
    """Serving length-cutoff (stop margin steps after every beam has an
    EOS): the returned top-beam SENTENCE (tokens up to first EOS) must
    match the full fixed-length scan. Peaky models terminate early, so the
    cutoff actually engages (verified via n_steps < scan steps when the
    cutoff fires before max_len)."""
    from recnet_tpu.decoding import tokens_to_sentences

    cfg, params, enc = _setup(cell_type, seed)   # peaky -> EOS early
    full = beam_decode(params, cfg, jnp.asarray(enc), K, MAX_LEN)
    cut = beam_decode(params, cfg, jnp.asarray(enc), K, MAX_LEN,
                      early_exit=True, length_cutoff_margin=2)
    idx2word = {i: f"w{i}" for i in range(V)}
    idx2word[EOS] = "<EOS>"
    s_full = tokens_to_sentences(
        np.asarray(full.tokens)[:, : int(full.n_steps)].T, idx2word, EOS)
    s_cut = tokens_to_sentences(
        np.asarray(cut.tokens)[:, : int(cut.n_steps)].T, idx2word, EOS)
    assert s_full == s_cut
    assert int(cut.n_steps) <= int(full.n_steps)


def test_beam_length_cutoff_engages_on_eos_repeater():
    """Trained captioners keep re-emitting <EOS> after the first one, so a
    cutoff keyed on the reference's last_eos register (which tracks the
    LATEST EOS for the length penalty) would never fire. The cutoff must
    key on the sticky FIRST EOS per candidate: construct a model whose
    beams emit <EOS> every step — the cutoff must stop after
    first_eos + margin, not run to max_len."""
    cfg, params, enc = _setup("GRU", 0, peaky=False)
    params = dict(params)
    params["out_w"] = params["out_w"] * 0.0
    out_b = np.zeros(V, np.float32)
    out_b[EOS] = 10.0                       # EOS always wins, every step
    out_b[5] = 8.0                          # runner-up fills the beam
    params["out_b"] = jnp.asarray(out_b)

    full = beam_decode(params, cfg, jnp.asarray(enc), 3, MAX_LEN)
    cut = beam_decode(params, cfg, jnp.asarray(enc), 3, MAX_LEN,
                      length_cutoff_margin=2)
    # every beam's first EOS is t=0 -> stop at t >= 0 + 1 + 2
    assert int(cut.n_steps) <= 4 < int(full.n_steps)
    # sentences (cut at first EOS) identical
    from recnet_tpu.decoding import tokens_to_sentences
    idx2word = {i: f"w{i}" for i in range(V)}
    s_full = tokens_to_sentences(
        np.asarray(full.tokens)[:, : int(full.n_steps)].T, idx2word, EOS)
    s_cut = tokens_to_sentences(
        np.asarray(cut.tokens)[:, : int(cut.n_steps)].T, idx2word, EOS)
    assert s_full == s_cut


def test_evaluation_beam_path_forwards_use_pallas(monkeypatch):
    """tc.use_pallas must reach beam_decode's use_pallas_topk from the
    eval path (round-3 gap: evaluation.decode_batch silently took the XLA
    projection even when the config asked for Pallas; serving wired it)."""
    from recnet_tpu import evaluation as ev

    captured = {}

    def fake_beam_decode(params, dcfg, videos, K, max_len, **kw):
        captured.update(kw)
        import types
        return types.SimpleNamespace(
            tokens=jnp.zeros((videos.shape[0], max_len + 1), jnp.int32),
            n_steps=jnp.asarray(max_len + 1, jnp.int32),
            scores=jnp.zeros((videos.shape[0], K)))

    monkeypatch.setattr(ev, "beam_decode", fake_beam_decode)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    videos = np.zeros((2, 3, 4), np.float32)
    ev.decode_batch({}, _cfg("GRU"), videos, ("beam", 5), max_len=4,
                    use_pallas=True)
    assert captured.get("use_pallas_topk") is True
    ev.decode_batch({}, _cfg("GRU"), videos, ("beam", 5), max_len=4,
                    use_pallas=False)
    assert captured.get("use_pallas_topk") is False


def test_evaluation_greedy_path_forwards_greedy_segment(monkeypatch):
    """tc.greedy_segment must route the eval greedy pass to the segmented
    whole-decode kernel (eos_stop early exit), and 0 must keep the single
    fixed-length kernel — decode-level sentence exactness is pinned in
    test_pallas_fused.py; this pins the evaluation wiring."""
    import types

    from recnet_tpu import decoding as dec
    from recnet_tpu import evaluation as ev

    captured = {}

    def fake(name):
        def f(params, dcfg, videos, max_len, **kw):
            captured["fn"] = name
            captured.update(kw)
            return types.SimpleNamespace(
                tokens=jnp.zeros((max_len + 1, videos.shape[0]), jnp.int32),
                n_steps=jnp.asarray(max_len + 1, jnp.int32))
        return f

    monkeypatch.setattr(dec, "greedy_decode_whole_segmented",
                        fake("segmented"))
    monkeypatch.setattr(dec, "greedy_decode_whole", fake("whole"))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    videos = np.zeros((2, 3, ENC), np.float32)

    ev.decode_batch({}, _cfg("GRU"), videos, "greedy", max_len=4,
                    use_pallas=True, greedy_segment=4)
    assert captured.pop("fn") == "segmented"
    assert captured.get("segment") == 4 and captured.get("eos_stop") is True

    ev.decode_batch({}, _cfg("GRU"), videos, "greedy", max_len=4,
                    use_pallas=True, greedy_segment=0)
    assert captured.pop("fn") == "whole"

    # LSTM configs take the kernel too (it supports both cell types)
    ev.decode_batch({}, _cfg("LSTM"), videos, "greedy", max_len=4,
                    use_pallas=True, greedy_segment=4)
    assert captured.pop("fn") == "segmented"
