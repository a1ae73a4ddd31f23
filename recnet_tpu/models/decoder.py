"""Attention RNN caption decoder — functional, scan-friendly, fixed-shape.

Rebuild of the reference Decoder (reference: models/decoder.py:6-70):
embedding·scale + dropout → *unnormalized* additive attention over encoder
features (no softmax — decoder.py:30 constructs one but :55-61 never applies
it; scores mean-pool the features) → LSTM/GRU → vocab projection + dropout.

TPU-first differences from the reference's per-step Python loop
(train.py:41-67):
* the value projection U·v is precomputed once per sequence (attention.py);
* the whole teacher-forced rollout is ONE ``lax.scan`` inside ONE jitted step;
* shapes are fixed (T = caption_max_len+1) with masking instead of the
  reference's early loop break — proven loss-equivalent in tests.

``nn.LSTM(dropout=p)`` applies dropout only *between* stacked layers, so the
reference's ``decoder_dropout`` is a no-op at n_layers=1; ours matches (the
inter-layer dropout only fires for n_layers > 1).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from recnet_tpu.ops import attention as attn_ops
from recnet_tpu.ops import rnn as rnn_ops


class DecoderConfig(NamedTuple):
    """Static hyperparameters (hashable, jit-friendly)."""
    cell_type: str = "GRU"            # ["LSTM", "GRU"]
    n_layers: int = 1
    vocab_size: int = 4188
    embedding_size: int = 468
    embedding_scale: float = 1.0
    encoder_size: int = 1536
    hidden_size: int = 512
    attn_size: int = 128
    embedding_dropout: float = 0.5
    dropout: float = 0.5              # inter-layer RNN dropout
    out_dropout: float = 0.5
    sos_token: int = 1
    pad_token: int = 0
    eos_token: int = 2


def init_decoder_params(key: jax.Array, cfg: DecoderConfig,
                        dtype=jnp.float32) -> Dict:
    k_emb, k_attn, k_out_w, k_out_b, *k_rnn = jax.random.split(
        key, 4 + cfg.n_layers)
    bound = 1.0 / (cfg.hidden_size ** 0.5)
    rnn_layers = []
    for li in range(cfg.n_layers):
        in_size = (cfg.embedding_size + cfg.encoder_size) if li == 0 \
            else cfg.hidden_size
        rnn_layers.append(rnn_ops.init_rnn_params(
            k_rnn[li], cfg.cell_type, in_size, cfg.hidden_size, dtype))
    return {
        # nn.Embedding default init: N(0, 1)
        "embedding": jax.random.normal(
            k_emb, (cfg.vocab_size, cfg.embedding_size), dtype),
        "attention": attn_ops.init_attention_params(
            k_attn, cfg.hidden_size, cfg.encoder_size, cfg.attn_size, dtype),
        "rnn": rnn_layers,
        "out_w": jax.random.uniform(
            k_out_w, (cfg.hidden_size, cfg.vocab_size), dtype, -bound, bound),
        "out_b": jax.random.uniform(
            k_out_b, (cfg.vocab_size,), dtype, -bound, bound),
    }


def zero_state(cfg: DecoderConfig, batch_size: int, dtype=jnp.float32):
    """(h, c) each (L, B, H), zero-init (reference: train.py:28-35)."""
    z = jnp.zeros((cfg.n_layers, batch_size, cfg.hidden_size), dtype)
    return (z, z)


def _dropout(x: jax.Array, rate: float, rng: Optional[jax.Array],
             train: bool) -> jax.Array:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _multilayer_rnn(cfg: DecoderConfig, params_layers, x, state,
                    rng: Optional[jax.Array], train: bool):
    """Stacked cells with inter-layer dropout (PyTorch nn.RNN semantics)."""
    h, c = state
    new_h, new_c = [], []
    inp = x
    for li, p in enumerate(params_layers):
        hi, ci = rnn_ops.rnn_step(cfg.cell_type, p, inp, (h[li], c[li]))
        new_h.append(hi)
        new_c.append(ci)
        inp = hi
        if li + 1 < len(params_layers) and train and cfg.dropout > 0 and rng is not None:
            inp = _dropout(inp, cfg.dropout, jax.random.fold_in(rng, li), train)
    return inp, (jnp.stack(new_h), jnp.stack(new_c))


def decoder_step(params: Dict, cfg: DecoderConfig, token: jax.Array,
                 state, encoder_outputs: jax.Array, uv: jax.Array,
                 rng: Optional[jax.Array] = None, train: bool = False
                 ) -> Tuple[jax.Array, Tuple]:
    """One decode step (reference: models/decoder.py:45-70).

    token: (B,) int32; state: (h, c) each (L, B, H);
    encoder_outputs: (B, F, enc); uv: (B, F, A) precomputed U·v.
    Returns (logits (B, V), new_state).
    """
    if rng is not None:
        r_emb, r_rnn, r_out = jax.random.split(rng, 3)
    else:
        r_emb = r_rnn = r_out = None

    emb = params["embedding"][token] * cfg.embedding_scale
    emb = _dropout(emb, cfg.embedding_dropout, r_emb, train)

    query = state[0][-1]  # last-layer h (decoder.py:51-53)
    context = attn_ops.attend_mean(
        params["attention"], query, encoder_outputs, uv)

    x = jnp.concatenate([emb, context], axis=-1)
    output, new_state = _multilayer_rnn(cfg, params["rnn"], x, state,
                                        r_rnn, train)

    logits = output @ params["out_w"] + params["out_b"]
    logits = _dropout(logits, cfg.out_dropout, r_out, train)
    return logits, new_state


class DecoderRollout(NamedTuple):
    logits: jax.Array          # (T, B, V)
    hiddens: jax.Array         # (T, L, B, H) — all-layer h per step (train.py:61-64)
    greedy_tokens: jax.Array   # (T, B) argmax chain (used when not teacher forcing)


def teacher_forced_rollout(params: Dict, cfg: DecoderConfig,
                           encoder_outputs: jax.Array, targets: jax.Array,
                           use_teacher_forcing: jax.Array,
                           rng: Optional[jax.Array] = None,
                           train: bool = False) -> DecoderRollout:
    """Full T-step rollout as one lax.scan (replaces train.py:41-67 loop).

    targets: (T, B) int32. ``use_teacher_forcing`` is a scalar bool traced per
    iteration — the reference draws ONE Bernoulli per iteration for the whole
    batch/sequence (train.py:37-38), not per step.
    """
    T, B = targets.shape
    uv = attn_ops.precompute_uv(params["attention"], encoder_outputs)
    init_token = jnp.full((B,), cfg.sos_token, jnp.int32)

    def step(carry, xs):
        state, token = carry
        t, tgt_t = xs
        step_rng = None if rng is None else jax.random.fold_in(rng, t)
        logits, new_state = decoder_step(
            params, cfg, token, state, encoder_outputs, uv, step_rng, train)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_token = jnp.where(use_teacher_forcing, tgt_t, greedy)
        return (new_state, next_token), (logits, new_state[0], greedy)

    init = (zero_state(cfg, B, encoder_outputs.dtype), init_token)
    xs = (jnp.arange(T), targets)
    _, (logits, hiddens, greedy_tokens) = jax.lax.scan(step, init, xs)
    return DecoderRollout(logits, hiddens, greedy_tokens)


def teacher_forced_rollout_fast(params: Dict, cfg: DecoderConfig,
                                encoder_outputs: jax.Array,
                                targets: jax.Array,
                                rng: Optional[jax.Array] = None,
                                train: bool = False) -> DecoderRollout:
    """Specialized rollout for teacher-forcing ratio 1.0 (the reference
    default, config.py:71): every step's input token is known upfront, so

    * the embedding gather happens ONCE for all T steps, and
    * the vocab projection (the largest matmul) moves OUT of the scan into
      one (T·B, H) x (H, V) MXU-friendly matmul.

    The scan body shrinks to attention + RNN cell. Produces logits/hiddens
    identical to teacher_forced_rollout(use_teacher_forcing=True) in eval
    mode (verified in tests); dropout masks differ in draw order but match
    in distribution.
    """
    T, B = targets.shape
    uv = attn_ops.precompute_uv(params["attention"], encoder_outputs)
    inputs = jnp.concatenate(
        [jnp.full((1, B), cfg.sos_token, targets.dtype), targets[:-1]], axis=0)

    if rng is not None:
        r_emb, r_rnn, r_out = jax.random.split(rng, 3)
    else:
        r_emb = r_rnn = r_out = None

    emb_all = params["embedding"][inputs] * cfg.embedding_scale   # (T, B, E)
    emb_all = _dropout(emb_all, cfg.embedding_dropout, r_emb, train)

    if cfg.n_layers == 1:
        # custom-VJP rollout (see _tf_attn_rollout): the embedding-side gate
        # term hoists out of the scan as one (T·B)-row matmul, the scan body
        # shrinks to attention + ctx@w_enc + cell, and the backward pass
        # emits per-step cotangents instead of carrying the w_ih / w_hh /
        # d(enc) accumulators. At one layer the scan body is deterministic
        # (no in-scan dropout), so r_rnn is unused, same as the scan below.
        r0 = params["rnn"][0]
        E = cfg.embedding_size
        gi_emb = emb_all @ r0["w_ih"][:E] + r0["b_ih"]            # (T, B, G)
        hs = _tf_attn_rollout(
            cfg.cell_type, params["attention"], r0["w_ih"][E:],
            r0["w_hh"], r0["b_hh"], encoder_outputs, uv, gi_emb)
        hiddens = hs[:, None]                                     # (T, 1, B, H)
    else:
        def step(state, xs):
            t, emb_t = xs
            query = state[0][-1]
            context = attn_ops.attend_mean(
                params["attention"], query, encoder_outputs, uv)
            x = jnp.concatenate([emb_t, context], axis=-1)
            rr = None if r_rnn is None else jax.random.fold_in(r_rnn, t)
            _, new_state = _multilayer_rnn(cfg, params["rnn"], x, state,
                                           rr, train)
            return new_state, new_state[0]

        init = zero_state(cfg, B, encoder_outputs.dtype)
        _, hiddens = jax.lax.scan(step, init, (jnp.arange(T), emb_all))

    logits = hiddens[:, -1] @ params["out_w"] + params["out_b"]  # (T, B, V)
    logits = _dropout(logits, cfg.out_dropout, r_out, train)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return DecoderRollout(logits, hiddens, greedy)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tf_attn_rollout(cell_type, att, w_enc, w_hh, b_hh, enc, uv, gi_emb):
    """Teacher-forced decoder recurrence (attention + cell) as one
    custom-VJP rollout (single layer; train fast path).

    Same construction as reconstructors._local_attn_rollout: the backward
    scan carries only (dh, dc) + the small attention cotangents, EMITS
    per-step gate/context cotangents, and contracts the weight gradients —
    w_enc (the ctx rows of w_ih), w_hh, and d(enc) itself — as stacked
    matmuls outside the loop. Plain scan-autodiff would carry the
    (E+enc, G) and (H, G) weight-grad accumulators AND the (B, F, enc)
    encoder-grad accumulator through all T backward steps.

    gi_emb: (T, B, G) = emb@w_ih[:E] + b_ih (precomputed, differentiable
    outside); w_enc: (enc, G) = w_ih[E:]. Returns hidden stack (T, B, H).
    """
    return _tf_rollout_fwd(cell_type, att, w_enc, w_hh, b_hh, enc, uv,
                           gi_emb)[0]


def _tf_rollout_fwd(cell_type, att, w_enc, w_hh, b_hh, enc, uv, gi_emb):
    T, B, G = gi_emb.shape
    H = w_hh.shape[0]
    F = enc.shape[1]
    dtype = enc.dtype

    def step(state, gi_emb_t):
        h, c = state
        wh = h @ att["W"]                                        # (B, A)
        act = jnp.tanh(wh[:, None, :] + uv + att["b"])           # (B, F, A)
        scores = (act @ att["w"])[..., 0]                        # (B, F)
        ctx = jnp.einsum("bf,bfe->be", scores, enc) / F
        gi = gi_emb_t + ctx @ w_enc
        h_new, c_new, acts = rnn_ops.rollout_cell_fwd(
            cell_type, gi, h, c, w_hh, b_hh)
        return (h_new, c_new), (h_new, c_new, acts, scores, ctx)

    z0 = jnp.zeros((B, H), dtype)
    _, (hs, cs, acts, scores, ctxs) = jax.lax.scan(step, (z0, z0), gi_emb)
    return hs, (att, w_enc, w_hh, enc, uv, hs, cs, acts, scores, ctxs)


def _tf_rollout_bwd(cell_type, res, dhs):
    att, w_enc, w_hh, enc, uv, hs, cs, acts, scores, ctxs = res
    B, F, _ = enc.shape
    H = w_hh.shape[0]
    z0 = jnp.zeros((B, H), enc.dtype)
    h_prev = jnp.concatenate([z0[None], hs[:-1]], 0)
    c_prev = jnp.concatenate([z0[None], cs[:-1]], 0)
    w_vec = att["w"][:, 0]

    # The attention activation at every step is a function of h_prev only —
    # ALL of which is known before the backward scan — so materialize it
    # once (one stacked matmul + one (T,B,F,A) tanh chain) instead of
    # recomputing wh/tanh inside every backward step, and strip the scan
    # carry down to the true recurrence (dh, dc): the attention weight and
    # uv gradients contract OUT of the scan from emitted per-step
    # cotangents, the same construction already used for w_ih/w_hh/d(enc).
    # (Round-3 follow-up to the "decoder backward attention chain" headroom
    # item; the in-scan (B,F,A) work shrinks to the one contraction the
    # dh_prev recurrence genuinely needs.)
    WH = jnp.einsum("tbh,ha->tba", h_prev, att["W"])
    ACT = jnp.tanh(WH[:, :, None, :] + uv[None] + att["b"])   # (T, B, F, A)
    U2 = 1.0 - ACT * ACT

    def step(carry, xs):
        dh_next, dc_next = carry
        dout, act_t, h_pv, c_pv, c_t, u2_t = xs
        dgi, dgh, dh_prev, dc_prev = rnn_ops.rollout_cell_bwd(
            cell_type, dh_next + dout, dc_next, act_t, h_pv, c_pv, c_t,
            w_hh)
        dctx = dgi @ w_enc.T                                     # (B, enc)
        dscores = jnp.einsum("be,bfe->bf", dctx, enc) / F
        # attention-query gradient — the only attention math the (dh, dc)
        # recurrence needs in-scan
        dwh = jnp.einsum("bf,bfa->ba", dscores, u2_t) * w_vec
        dh_prev = dh_prev + dwh @ att["W"].T
        return (dh_prev, dc_prev), (dgi, dgh, dctx, dscores, dwh)

    # note: the per-step ``scores`` are NOT threaded through the scan —
    # they are only needed in the out-of-scan d_enc contraction below
    (dh0, dc0), (dgi, dgh, dctx, dsc, dwh) = jax.lax.scan(
        step, (z0, z0), (dhs, acts, h_prev, c_prev, cs, U2), reverse=True)

    # stacked out-of-scan contractions
    dpre = dsc[:, :, :, None] * w_vec * U2                   # (T, B, F, A)
    d_uv = dpre.sum(0)
    db = dpre.sum((0, 1, 2))
    dw = jnp.einsum("tbfa,tbf->a", ACT, dsc)[:, None]
    dW = jnp.einsum("tbh,tba->ha", h_prev, dwh)
    d_w_enc = jnp.einsum("tbe,tbg->eg", ctxs, dgi)
    d_w_hh = jnp.einsum("tbh,tbg->hg", h_prev, dgh)
    d_b_hh = dgh.sum((0, 1))
    # d(enc) from the context path, one einsum over the emitted cotangents
    d_enc = jnp.einsum("tbf,tbe->bfe", scores, dctx) / F
    d_att = {"W": dW, "U": jnp.zeros_like(att["U"]), "b": db, "w": dw}
    return (d_att, d_w_enc, d_w_hh, d_b_hh, d_enc, d_uv, dgi)


_tf_attn_rollout.defvjp(_tf_rollout_fwd, _tf_rollout_bwd)


def hoisted_decode_tables(params: Dict, cfg: DecoderConfig,
                          encoder_outputs: jax.Array):
    """Loop-invariant input-side matmuls of the decode scan, hoisted.

    The RNN input is x = [emb(token), ctx] with ctx = Σ_f score_f·enc_f / F,
    so the input-side gate term decomposes linearly:

        x @ w_ih + b_ih = (emb·scale @ w_ih[:E])[token]
                          + Σ_f score_f (enc_f @ w_ih[E:]) / F + b_ih

    Precomputing the two bracketed factors turns the per-step (B, E+enc) x
    (E+enc, G) matmul — the decode scan's single largest — into a table
    gather plus a (B, F) x (B, F, G) weighted sum (measured ~1.5× greedy
    decode on v5e). Eval-path only (embedding dropout would land before the
    fold otherwise); single-layer decoders (the reference's config.py:66).

    Returns (pre_table (V, G), encW (B, F, G), b_ih (G,)).
    """
    assert cfg.n_layers == 1
    E = cfg.embedding_size
    w_ih = params["rnn"][0]["w_ih"]
    pre_table = (params["embedding"] * cfg.embedding_scale) @ w_ih[:E]
    encW = jnp.einsum("bfe,eg->bfg", encoder_outputs, w_ih[E:])
    return pre_table, encW, params["rnn"][0]["b_ih"]


def decoder_step_hoisted(params: Dict, cfg: DecoderConfig, token: jax.Array,
                         state, uv: jax.Array, pre_table: jax.Array,
                         encW: jax.Array, b_ih: jax.Array
                         ) -> Tuple[jax.Array, Tuple]:
    """decoder_step (eval mode, 1 layer) using hoisted_decode_tables.

    Returns (output (B, H), new_state) — the vocab projection is left to the
    caller (beam search replaces it with a fused projection+top-K kernel)."""
    query = state[0][-1]
    scores = attn_ops.attention_scores(params["attention"], query, uv)
    F = encW.shape[1]
    gi = (pre_table[token]
          + jnp.einsum("bf,bfg->bg", scores, encW) / F + b_ih)
    h, c = rnn_ops.rnn_step_pre(cfg.cell_type, params["rnn"][0], gi,
                                (state[0][0], state[1][0]))
    return h, (h[None], c[None])


def config_from_train(tc, vocab_size: int) -> DecoderConfig:
    """Build a DecoderConfig from a recnet_tpu TrainConfig."""
    return DecoderConfig(
        cell_type=tc.decoder_model,
        n_layers=tc.decoder_n_layers,
        vocab_size=vocab_size,
        embedding_size=tc.embedding_size,
        embedding_scale=tc.embedding_scale,
        encoder_size=tc.encoder_output_size,
        hidden_size=tc.decoder_hidden_size,
        attn_size=tc.decoder_attn_size,
        embedding_dropout=tc.embedding_dropout,
        dropout=tc.decoder_dropout,
        out_dropout=tc.decoder_out_dropout,
        sos_token=tc.init_word2idx_dict["<SOS>"],
        pad_token=tc.init_word2idx_dict["<PAD>"],
        eos_token=tc.init_word2idx_dict["<EOS>"],
    )
