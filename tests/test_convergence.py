"""Whole-stack learning test: overfit a tiny corpus until greedy decoding
reproduces the training captions, then confirm the metric suite scores it
highly. Exercises data -> model -> optimizer -> decode -> metrics together."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recnet_tpu.config import TrainConfig
from recnet_tpu.decoding import greedy_decode, tokens_to_sentences
from recnet_tpu.metrics import Bleu
from recnet_tpu.training.step import init_train_state, build_train_step


@pytest.mark.slow
def test_overfit_tiny_corpus_and_decode(rng):
    V = 30
    tc = TrainConfig(
        caption_max_len=6, batch_size=4, embedding_size=16,
        encoder_output_size=24, encoder_output_len=5,
        decoder_hidden_size=32, decoder_attn_size=8,
        use_recon=False,
        decoder_learning_rate=5e-3,
        embedding_dropout=0.0, decoder_out_dropout=0.0)
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    step = build_train_step(tc, dcfg, rcfg)

    # 4 videos with fixed captions
    T = tc.caption_max_len + 1
    videos = jnp.asarray(rng.standard_normal(
        (4, tc.encoder_output_len, tc.encoder_output_size)
    ).astype(np.float32))
    caps = np.zeros((T, 4), np.int32)
    sentences = [[3, 4, 5], [6, 7], [8, 9, 10, 11], [12, 13, 14]]
    for b, words in enumerate(sentences):
        caps[: len(words), b] = words
        caps[len(words), b] = 2  # EOS
    captions = jnp.asarray(caps)

    key = jax.random.PRNGKey(3)
    for i in range(400):
        state, m = step(state, videos, captions, key)
    assert float(m["loss"]) < 1.0

    res = greedy_decode(state.dec_params, dcfg, videos, tc.caption_max_len)
    tokens = np.asarray(res.tokens)[: int(res.n_steps)]
    idx2word = {i: f"w{i}" for i in range(V)}
    idx2word.update({0: "<PAD>", 1: "<SOS>", 2: "<EOS>"})
    decoded = tokens_to_sentences(tokens, idx2word, 2)
    expected = [" ".join(f"w{w}" for w in s) for s in sentences]
    n_exact = sum(d == e for d, e in zip(decoded, expected))
    assert n_exact >= 3, f"decoded={decoded} expected={expected}"

    # metric suite confirms near-perfect reconstruction
    gts = {str(i): [e] for i, e in enumerate(expected)}
    hyp = {str(i): [d] for i, d in enumerate(decoded)}
    bleu, _ = Bleu(4).compute_score(gts, hyp)
    assert bleu[0] > 0.9


@pytest.mark.slow
def test_overfit_tiny_corpus_bf16_training(rng):
    """Same overfit exercise with train_precision='bfloat16': the bf16
    compute path must still learn the corpus to (near-)exact reproduction —
    the caption-quality check behind the 1.30x mixed-precision option."""
    V = 30
    tc = TrainConfig(
        caption_max_len=6, batch_size=4, embedding_size=16,
        encoder_output_size=24, encoder_output_len=5,
        use_recon=False,
        decoder_hidden_size=32, decoder_attn_size=8,
        decoder_learning_rate=5e-3,
        embedding_dropout=0.0, decoder_out_dropout=0.0,
        train_precision="bfloat16")
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    step = build_train_step(tc, dcfg, rcfg)

    T = tc.caption_max_len + 1
    videos = jnp.asarray(rng.standard_normal(
        (4, tc.encoder_output_len, tc.encoder_output_size)
    ).astype(np.float32))
    caps = np.zeros((T, 4), np.int32)
    sentences = [[3, 4, 5], [6, 7], [8, 9, 10, 11], [12, 13, 14]]
    for b, words in enumerate(sentences):
        caps[: len(words), b] = words
        caps[len(words), b] = 2
    captions = jnp.asarray(caps)

    key = jax.random.PRNGKey(3)
    for _ in range(400):
        state, m = step(state, videos, captions, key)
    assert float(m["loss"]) < 1.0

    res = greedy_decode(state.dec_params, dcfg, videos, tc.caption_max_len)
    tokens = np.asarray(res.tokens)[: int(res.n_steps)]
    idx2word = {i: f"w{i}" for i in range(V)}
    idx2word.update({0: "<PAD>", 1: "<SOS>", 2: "<EOS>"})
    decoded = tokens_to_sentences(tokens, idx2word, 2)
    expected = [" ".join(f"w{w}" for w in s) for s in sentences]
    n_exact = sum(d == e for d, e in zip(decoded, expected))
    assert n_exact >= 3, f"decoded={decoded} expected={expected}"
