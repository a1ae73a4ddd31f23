"""Greedy and beam-search decoding as single jitted fixed-shape programs.

Rebuilds reference eval.py:19-120. The reference steps the decoder from Python,
once per live beam per timestep (eval.py:47-48), with per-(beam,batch) hidden
regathering through nested Python loops (eval.py:78-102). Here the whole search
is ONE ``lax.scan``: beams fold into the batch axis for the decoder step, and
hidden/history reordering is a ``take_along_axis`` gather over a (B, K, ...)
state PyTree.

Faithful quirks (required for output parity, verified against a NumPy oracle):
* beam scores use ``log(sigmoid(logits))`` — NOT log-softmax (eval.py:61);
* the cumulative score is *re-divided* by the length penalty every step:
  cum' = cum / len^0.7 + logsig (eval.py:59-63);
* the length for the penalty is (last EOS position + 1) if the beam's history
  contains an EOS, else t+1 — "last" because the reference's np.where
  assignment overwrites earlier matches (eval.py:51-58);
* search stops when every candidate token is <PAD>=0 or at max_len
  (eval.py:30,116); we freeze state at that point and report n_steps so the
  host can truncate exactly where the reference's loop broke.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from recnet_tpu.models import decoder as dec_mod
from recnet_tpu.ops import attention as attn_ops
from recnet_tpu.ops import rnn as rnn_ops


class GreedyResult(NamedTuple):
    tokens: jax.Array    # (T, B) int32 — valid through n_steps
    n_steps: jax.Array   # scalar int32


def pallas_supported(cfg: "dec_mod.DecoderConfig", kind: str) -> bool:
    """Single source of truth for whether a Pallas decode path can serve
    this config on the current backend — consumed by BOTH
    ``evaluation.decode_batch`` and ``serving.Captioner`` so the
    ``use_pallas`` flag means the same thing in every layer (round-4
    verdict: serving gated whole-decode on GRU-only while eval took it for
    LSTM too).

    kind:
      * ``"greedy_whole"`` — the whole-decode / segmented kernels
        (ops/pallas/whole_decode.py): GRU **or** LSTM, 1 layer (the kernel
        takes ``cell_type`` throughout; multi-layer stays XLA).
      * ``"beam_topk"`` — the fused projection+top-K beam kernel
        (ops/pallas/topk.py): cell-agnostic — it only sees hidden states
        and the output projection, so any cell/depth qualifies.

    Always False off-TPU (Mosaic kernels are TPU-only; CPU tests use
    ``interpret=True`` on the kernels directly). The check is
    ``!= "tpu"`` rather than ``== "cpu"`` so GPU/METAL backends fall back
    to XLA instead of crashing in a Mosaic lowering (the axon TPU tunnel
    reports ``"tpu"``)."""
    if jax.default_backend() != "tpu":
        return False
    if kind == "greedy_whole":
        return cfg.cell_type in ("GRU", "LSTM") and cfg.n_layers == 1
    if kind == "beam_topk":
        return True
    raise ValueError(f"unknown Pallas capability kind: {kind!r}")


def _make_step_logits(params, cfg, encoder_outputs, uv):
    """Shared single-token step for the greedy/sampling scans: returns
    fn(token, state) -> (logits, new_state), using the hoisted decode
    tables when the config allows (single layer)."""
    if cfg.n_layers == 1:
        pre_table, encW, b_ih = dec_mod.hoisted_decode_tables(
            params, cfg, encoder_outputs)

        def step_logits(token, state):
            h, new_state = dec_mod.decoder_step_hoisted(
                params, cfg, token, state, uv, pre_table, encW, b_ih)
            return h @ params["out_w"] + params["out_b"], new_state
        return step_logits

    def step_logits(token, state):
        return dec_mod.decoder_step(
            params, cfg, token, state, encoder_outputs, uv, None, False)
    return step_logits


@partial(jax.jit, static_argnames=("cfg", "max_len", "unroll", "early_exit"))
def greedy_decode(params: Dict, cfg: dec_mod.DecoderConfig,
                  encoder_outputs: jax.Array, max_len: int,
                  unroll: int = 1, early_exit: bool = False) -> GreedyResult:
    """Greedy argmax chain (reference: eval.py:19-33).

    ``unroll`` unrolls the decode scan (XLA fuses across steps; ~13% faster
    at unroll=4 on v5e for the flagship shapes).

    ``early_exit=True`` uses a ``lax.while_loop`` that stops at the first
    all-<PAD> step — the reference's actual loop break (eval.py:30). Output
    identical to the fixed scan (tested); with trained models captions end
    well before max_len, so serving skips the dead tail steps. The scan is
    the right choice for fixed-cost benchmarking and maximal pipelining."""
    B = encoder_outputs.shape[0]
    T = max_len + 1
    uv = attn_ops.precompute_uv(params["attention"], encoder_outputs)
    init_token = jnp.full((B,), cfg.sos_token, jnp.int32)
    step_logits = _make_step_logits(params, cfg, encoder_outputs, uv)

    def step(carry, t):
        state, token, done, n_steps = carry
        logits, new_state = step_logits(token, state)
        out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        out = jnp.where(done, jnp.int32(cfg.pad_token), out)
        new_done = done | jnp.all(out == cfg.pad_token)
        n_steps = jnp.where(done, n_steps, t + 1)
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(done, o, n), new_state, state)
        return (state, out, new_done, n_steps), out

    init = (dec_mod.zero_state(cfg, B, encoder_outputs.dtype), init_token,
            jnp.asarray(False), jnp.zeros([], jnp.int32))
    if early_exit:
        def cond(carry):
            t, (_, _, done, _), _ = carry
            return (t < T) & jnp.logical_not(done)

        def body(carry):
            t, c, toks = carry
            c, out = step(c, t)
            return t + 1, c, toks.at[t].set(out)

        _, (_, _, _, n_steps), tokens = jax.lax.while_loop(
            cond, body,
            (jnp.zeros([], jnp.int32), init,
             jnp.full((T, B), cfg.pad_token, jnp.int32)))  # <PAD> tail,
        return GreedyResult(tokens, n_steps)                # like the scan
    (_, _, _, n_steps), tokens = jax.lax.scan(step, init, jnp.arange(T),
                                              unroll=unroll)
    return GreedyResult(tokens, n_steps)


@partial(jax.jit, static_argnames=("cfg", "max_len", "block_b", "interpret"))
def greedy_decode_pallas(params: Dict, cfg: dec_mod.DecoderConfig,
                         encoder_outputs: jax.Array, max_len: int,
                         block_b: int = 256,
                         interpret: bool = False) -> GreedyResult:
    """Greedy decode with the fused Pallas attention+GRU step kernel
    (recnet_tpu.ops.pallas.fused_step) doing the recurrent hot path; the
    vocab projection + argmax stay in XLA. GRU, 1 layer only (the flagship
    config, reference config.py:31,66). Matches greedy_decode exactly in
    f32 (tested); bf16 serving differs only by rounding."""
    assert cfg.cell_type == "GRU" and cfg.n_layers == 1, \
        "pallas fused step supports the GRU/1-layer flagship config"
    from recnet_tpu.ops.pallas.fused_step import (
        fused_gru_attn_step, pack_gru_bias)

    B = encoder_outputs.shape[0]
    T = max_len + 1
    a = params["attention"]
    r = params["rnn"][0]
    uv = attn_ops.precompute_uv(a, encoder_outputs)
    bias3 = pack_gru_bias(r["b_ih"], r["b_hh"])
    attn_b2 = a["b"][None, :]
    init_token = jnp.full((B,), cfg.sos_token, jnp.int32)
    E = cfg.embedding_size

    def step(carry, t):
        h, token, done, n_steps = carry
        emb = params["embedding"][token] * cfg.embedding_scale
        h_new = fused_gru_attn_step(
            emb, h, encoder_outputs, uv, a["W"], a["w"], attn_b2,
            r["w_ih"], r["w_hh"], bias3, emb_size=E, block_b=block_b,
            interpret=interpret)
        logits = h_new @ params["out_w"] + params["out_b"]
        out = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        out = jnp.where(done, jnp.int32(cfg.pad_token), out)
        new_done = done | jnp.all(out == cfg.pad_token)
        n_steps = jnp.where(done, n_steps, t + 1)
        h_new = jnp.where(done, h, h_new)
        return (h_new, out, new_done, n_steps), out

    init = (jnp.zeros((B, cfg.hidden_size), encoder_outputs.dtype),
            init_token, jnp.asarray(False), jnp.zeros([], jnp.int32))
    (_, _, _, n_steps), tokens = jax.lax.scan(step, init, jnp.arange(T))
    return GreedyResult(tokens, n_steps)


@partial(jax.jit, static_argnames=("cfg", "max_len", "block_b", "early_exit",
                                   "interpret"))
def greedy_decode_whole(params: Dict, cfg: dec_mod.DecoderConfig,
                        encoder_outputs: jax.Array, max_len: int,
                        block_b: int = 128, early_exit: bool = False,
                        interpret: bool = False) -> GreedyResult:
    """Greedy decode with the WHOLE loop inside one Pallas kernel
    (ops.pallas.whole_decode): weights + encoder tile stay VMEM-resident
    across all steps. GRU or LSTM, 1 layer. Matches greedy_decode on the
    executed prefix; n_steps recovered from the first all-<PAD> step
    (eval.py:30)."""
    assert cfg.n_layers == 1
    from recnet_tpu.ops.pallas.whole_decode import whole_greedy_decode

    r = params["rnn"][0]
    uv = attn_ops.precompute_uv(params["attention"], encoder_outputs)
    bias2 = jnp.stack([r["b_ih"], r["b_hh"]])
    tokens_bt = whole_greedy_decode(
        params, encoder_outputs, uv, bias2, emb_size=cfg.embedding_size,
        max_len=max_len, block_b=block_b, sos=cfg.sos_token,
        cell_type=cfg.cell_type, early_exit=early_exit, interpret=interpret)
    tokens = tokens_bt.T                                   # (T, B)
    T = max_len + 1
    all_pad = jnp.all(tokens == cfg.pad_token, axis=1)     # (T,)
    first = jnp.argmax(all_pad)
    n_steps = jnp.where(jnp.any(all_pad), first + 1, T).astype(jnp.int32)
    return GreedyResult(tokens, n_steps)


@partial(jax.jit, static_argnames=("cfg", "max_len", "block_b", "segment",
                                   "eos_stop", "interpret"))
def greedy_decode_whole_segmented(params: Dict, cfg: dec_mod.DecoderConfig,
                                  encoder_outputs: jax.Array, max_len: int,
                                  block_b: int = 128, segment: int = 8,
                                  eos_stop: bool = False,
                                  interpret: bool = False) -> GreedyResult:
    """Whole-loop Pallas greedy decode with DEVICE-LEVEL early exit.

    Runs the production whole-decode step in fixed ``segment``-step Pallas
    calls that carry (h, c, token) through HBM, chained by an XLA
    ``while_loop`` that stops at the first segment boundary where every
    row's current token is <PAD> — the reference's whole-batch break
    (eval.py:30) at segment granularity. Unlike ``early_exit=True`` on
    ``greedy_decode_whole`` (a per-tile ``lax.while_loop`` INSIDE the
    kernel, which defeats Mosaic's pipelining at ~2x per-step cost and
    deviates on multi-tile batches), every segment keeps the pipelined
    fori_loop and the stop condition is global, so the executed token
    prefix is bit-identical to ``greedy_decode_whole``'s and ``n_steps``
    matches exactly (pinned by tests). Costs: up to ``segment - 1`` extra
    steps past the break point, plus one weights+enc/uv HBM re-fetch and a
    (B, H) x2 + (B,) state round-trip per segment — measured 6-10%
    overhead when NO stop fires (benchmarks/profile_whole_segmented.py).

    ``eos_stop=True`` additionally stops once EVERY row has emitted its
    first <EOS>. The all-<PAD> break almost never fires on trained models
    (PAD-target steps are masked out of the training loss, train.py:246,
    so models never learn to emit <PAD>), while first-EOS happens well
    before max_len — and rows are independent in greedy decode, so tokens
    after a row's first <EOS> can never change its SENTENCE (every
    consumer cuts at first EOS, utils.py:11-20). With ``eos_stop`` the
    returned token matrix is PAD beyond the stop boundary (not
    bit-identical to the full kernel's dead-tail tokens) but the decoded
    sentences are EXACT — unlike the beam length cutoff, which is an
    approximation. This is the serving fast path."""
    assert cfg.n_layers == 1
    from recnet_tpu.ops.pallas.whole_decode import whole_greedy_decode_segment

    B = encoder_outputs.shape[0]
    T = max_len + 1
    n_seg = -(-T // segment)
    dtype = encoder_outputs.dtype
    r = params["rnn"][0]
    H = r["w_hh"].shape[0]
    uv = attn_ops.precompute_uv(params["attention"], encoder_outputs)
    bias2 = jnp.stack([r["b_ih"], r["b_hh"]])

    def cond(carry):
        s, h, c, tok, seen_eos, toks = carry
        live = jnp.logical_not(jnp.all(tok == cfg.pad_token))
        if eos_stop:
            live &= jnp.logical_not(jnp.all(seen_eos))
        return (s < n_seg) & live

    def body(carry):
        s, h, c, tok, seen_eos, toks = carry
        tseg, h, c, tok = whole_greedy_decode_segment(
            params, encoder_outputs, uv, bias2, h, c, tok,
            emb_size=cfg.embedding_size, seg_len=segment, block_b=block_b,
            cell_type=cfg.cell_type, interpret=interpret)
        toks = jax.lax.dynamic_update_slice(
            toks, tseg, (jnp.zeros([], jnp.int32), s * segment))
        seen_eos |= jnp.any(tseg == cfg.eos_token, axis=1, keepdims=True)
        return (s + 1, h, c, tok, seen_eos, toks)

    init = (jnp.zeros([], jnp.int32),
            jnp.zeros((B, H), dtype), jnp.zeros((B, H), dtype),
            jnp.full((B, 1), cfg.sos_token, jnp.int32),
            jnp.zeros((B, 1), jnp.bool_),
            jnp.full((B, n_seg * segment), cfg.pad_token, jnp.int32))
    _, _, _, _, _, toks = jax.lax.while_loop(cond, body, init)
    tokens = toks[:, :T].T                                 # (T, B)
    all_pad = jnp.all(tokens == cfg.pad_token, axis=1)     # (T,)
    first = jnp.argmax(all_pad)
    n_steps = jnp.where(jnp.any(all_pad), first + 1, T).astype(jnp.int32)
    return GreedyResult(tokens, n_steps)


class BeamResult(NamedTuple):
    tokens: jax.Array    # (B, T) int32 — top beam history, valid through n_steps
    n_steps: jax.Array   # scalar int32
    scores: jax.Array    # (B, K) final cumulative scores


@partial(jax.jit, static_argnames=("cfg", "beam_width", "max_len",
                                   "use_pallas_topk", "unroll", "early_exit",
                                   "length_cutoff_margin", "interpret"))
def beam_decode(params: Dict, cfg: dec_mod.DecoderConfig,
                encoder_outputs: jax.Array, beam_width: int,
                max_len: int, use_pallas_topk: bool = False,
                unroll: int = 2, early_exit: bool = False,
                length_cutoff_margin: Optional[int] = None,
                interpret: bool = False) -> BeamResult:
    """Batched beam search (reference: eval.py:36-120), width K, one scan.

    Semantics are the reference's exactly (oracle-parity-tested); the
    implementation is restructured for the TPU (measured ~2× end-to-end on
    v5e vs the round-1 flat-``top_k`` version, each piece ablated):

    1. loop-invariant input matmuls hoisted out of the scan
       (models.decoder.hoisted_decode_tables): ~2.3× fewer FLOPs per step;
    2. per-beam top-K of the raw logits instead of a flat top-K over K·V —
       valid because ``log(sigmoid(·))`` is monotonic and the beam's
       penalized score is constant within the beam, so any member of the
       global top-K is necessarily in its own beam's top-K. The per-beam
       top-K runs as K rounds of (max, argmax, mask) — XLA fuses these far
       better than its sort-based ``top_k`` — and first-occurrence argmax
       reproduces ``top_k``'s stable tie order. ``log_sigmoid`` + the
       length penalty then touch only the K² survivors. Logits are clamped
       at ``log_sigmoid``'s flush-to-zero saturation point (−log(f32 tiny)
       ≈ 87.3, where exp(−x) underflows the normal range — reachable only
       by untrained or pathologically scaled models) BEFORE ranking:
       saturated distinct logits thus become exact ties and first-occurrence
       argmax reproduces the flat form's word-index tie-break instead of
       silently ranking by raw logit (the round-2 known edge, now guarded
       and pinned by tests/test_decoding.py::test_beam_saturated_logits);
    3. the attention score contraction runs on the VPU (tanh fused into the
       reduction) instead of materializing the (B, K, F, A) activation for
       an MXU matmul;
    4. a GRU decoder (the flagship config) carries no cell state — the
       reference's dummy LSTM-shaped ``c`` would cost a (B, K, H) gather
       per step;
    5. the beam regather of the hidden state is a K-deep select chain
       (take_along_axis lowers poorly on TPU for this shape).

    ``use_pallas_topk=True`` swaps the projection+top-K for the fused
    Pallas kernel (ops.pallas.topk_proj): logits never leave VMEM, f32
    token-exact vs the XLA path (bf16 differs at rounding level — the
    kernel's f32 logits are higher fidelity; see the kernel docstring).

    ``early_exit=True`` replaces the fixed scan with a ``lax.while_loop``
    stopping at the first all-<PAD> step (the reference's break,
    eval.py:116-117) — identical output, fewer steps executed when trained
    captions end before max_len (the common serving case).

    ``length_cutoff_margin`` (implies ``early_exit``) additionally stops
    the loop once EVERY candidate of every batch row carries a FIRST
    <EOS> and the current step is ``margin`` past the latest first-EOS
    position. (First, not the reference's last-EOS length-penalty
    register: trained captioners keep re-emitting EOS after the first,
    so last_eos never settles — pinned by
    test_beam_length_cutoff_engages_on_eos_repeater.) The all-<PAD> stop
    rarely triggers in practice, so this is the serving-oriented cutoff.
    It is an APPROXIMATION: beams keep accumulating penalized score
    after EOS (the reference semantics), so the top slot can reorder
    after the cutoff point — measured on a fixture-trained model at
    B=2048/beam-5: 1.94x device speedup at margin 2, with 28% of
    sentences differing from the exact search (margin-insensitive;
    benchmarks/profile_beam_cutoff.py). The returned sentence is always
    a complete EOS-terminated candidate. OFF by default everywhere;
    evaluation always uses the exact scan/while forms.
    """
    # the cutoff lives in the while_loop's cond — a margin without
    # early_exit would otherwise be silently ignored by the scan path
    early_exit = early_exit or (length_cutoff_margin is not None)
    B, F, E = encoder_outputs.shape
    K = beam_width
    V = cfg.vocab_size
    T = max_len + 1
    dtype = encoder_outputs.dtype
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    # uv computed once on (B, F, A) — the encoder is SHARED across beams
    # (the reference re-runs the decoder per beam with the same enc,
    # eval.py:47-48; replicating enc K× would read it K× per step)
    uv = attn_ops.precompute_uv(params["attention"], encoder_outputs)
    a = params["attention"]
    hoist = cfg.n_layers == 1
    if hoist:
        pre_table, encW, b_ih = dec_mod.hoisted_decode_tables(
            params, cfg, encoder_outputs)
    is_gru = cfg.cell_type == "GRU" and hoist

    def compute_scores(query):
        wh = query @ a["W"]                                       # (B, K, A)
        return jnp.sum(
            jnp.tanh(wh[:, :, None, :] + uv[:, None, :, :] + a["b"])
            * a["w"][:, 0], -1)                                   # (B, K, F)

    def compute_gi(tokens, scores):
        return (pre_table[tokens]
                + jnp.einsum("bkf,bfg->bkg", scores, encW) / F
                + b_ih).reshape(B * K, -1)

    def beam_decoder_step(tokens, h, c):
        """decoder_step (models/decoder.py:45-70, eval mode) with the
        attention batched over (B, K) against the shared encoder, and the
        loop-invariant input matmuls hoisted (hoisted_decode_tables).
        h: (B, K, H) when hoisted else (B, K, L, H). Returns flat (B*K, H)
        output plus new (h, c)."""
        if hoist:
            query = h                                             # (B, K, H)
        else:
            query = h[:, :, -1]
        scores = compute_scores(query)
        if hoist:
            gi = compute_gi(tokens, scores)
            if is_gru:
                nh = rnn_ops.gru_cell_pre(params["rnn"][0], gi,
                                          h.reshape(B * K, -1))
                return nh, nh.reshape(B, K, -1), c
            nh, nc = rnn_ops.lstm_cell_pre(
                params["rnn"][0], gi,
                (h.reshape(B * K, -1), c.reshape(B * K, -1)))
            return nh, nh.reshape(B, K, -1), nc.reshape(B, K, -1)
        emb = params["embedding"][tokens] * cfg.embedding_scale   # (B, K, E)
        ctx = jnp.einsum("bkf,bfe->bke", scores, encoder_outputs) / F
        x = jnp.concatenate([emb, ctx], axis=-1).reshape(B * K, -1)
        flat_state = (
            jnp.moveaxis(h.reshape(B * K, cfg.n_layers, -1), 1, 0),
            jnp.moveaxis(c.reshape(B * K, cfg.n_layers, -1), 1, 0))
        out, (nh, nc) = dec_mod._multilayer_rnn(
            cfg, params["rnn"], x, flat_state, None, False)
        unflat = lambda s: jnp.moveaxis(s, 0, 1).reshape(
            B, K, cfg.n_layers, -1)
        return out, unflat(nh), unflat(nc)

    # log_sigmoid's saturation point: for x >= sat, log_sigmoid(x) is
    # exactly 0 once exp(-x) leaves the f32 normal range (TPUs flush
    # subnormals). Clamping here makes saturated logits exact ties, so the
    # per-beam argmax tie-breaks by word index like the flat top-K would.
    logsig_sat = jnp.asarray(-np.log(np.finfo(np.float32).tiny), dtype)

    def per_beam_topk(out):
        """Exact top-K of ``out @ out_w + out_b`` per row (see docstring)."""
        if use_pallas_topk:
            from recnet_tpu.ops.pallas.topk_proj import outproj_topk
            vals, idxs = outproj_topk(out, params["out_w"], params["out_b"],
                                      k=K, interpret=interpret)
            # the kernel ranks raw logits in-VMEM; clamp the returned vals
            # so the downstream scores match the flat form (slot order
            # within a fully saturated tie group remains raw-logit order —
            # scores are identical, so the final beam choice can differ
            # from the XLA path only between score-tied candidates)
            return jnp.minimum(vals.astype(dtype), logsig_sat), idxs
        logits = out @ params["out_w"] + params["out_b"]         # (B*K, V)
        work = jnp.minimum(logits, logsig_sat)
        vals, idxs = [], []
        for _ in range(K):
            m = jnp.max(work, axis=-1)
            i = jnp.argmax(work, axis=-1)
            vals.append(m)
            idxs.append(i)
            work = jnp.where(
                jax.nn.one_hot(i, V, dtype=jnp.bool_), neg_inf, work)
        return jnp.stack(vals, -1), jnp.stack(idxs, -1).astype(jnp.int32)

    def gather_state(x, src):
        """Regather (B, K, ...) rows by per-(batch, slot) source beam."""
        if hoist:
            # K-deep select chain: measured faster than take_along_axis
            res = jnp.broadcast_to(x[:, :1], x.shape)
            for s in range(1, K):
                res = jnp.where((src == s)[:, :, None], x[:, s:s + 1], res)
            return res
        return jnp.take_along_axis(
            x, src.reshape((B, K) + (1,) * (x.ndim - 2)), axis=1)

    def step(carry, t):
        (h, c, tokens, cum_prob, last_eos, first_eos, history, done,
         n_steps) = carry
        # h: (B, K, H) hoisted / (B, K, L, H); c likewise (dummy (1,1,1)
        # for GRU); tokens, cum_prob, last_eos, first_eos: (B, K);
        # history: (B, K, T). last_eos is the reference's length-penalty
        # register (tracks the LATEST EOS, eval.py:51-58); first_eos is
        # sticky — the position each candidate's SENTENCE terminates at —
        # and exists for the serving length cutoff (trained models keep
        # re-emitting EOS after the first, so last_eos never settles).

        # --- decoder step for all beams at once (shared encoder) ---
        out, nh, nc = beam_decoder_step(tokens, h, c)
        pb_val, pb_idx = per_beam_topk(out)                      # (B*K, K)

        # --- length-penalized cumulative score (eval.py:51-63) ---
        seq_len = jnp.where(last_eos >= 0, last_eos + 1, t + 1).astype(dtype)
        penalized = cum_prob / seq_len ** 0.7                    # (B, K)
        cand = (penalized.reshape(B * K, 1)
                + jax.nn.log_sigmoid(pb_val)).reshape(B, K * K)
        top_val, top_i = jax.lax.top_k(cand, K)                  # (B, K)
        src = (top_i // K).astype(jnp.int32)
        word = jnp.take_along_axis(
            pb_idx.reshape(B, K * K), top_i, axis=1).astype(jnp.int32)

        new_h = gather_state(nh, src)
        new_c = c if is_gru else gather_state(nc, src)
        new_hist = jnp.take_along_axis(
            history, src[:, :, None], axis=1).at[:, :, t].set(word)
        new_last_eos = jnp.where(word == cfg.eos_token, t,
                                 jnp.take_along_axis(last_eos, src, axis=1))
        inherited_first = jnp.take_along_axis(first_eos, src, axis=1)
        new_first_eos = jnp.where(
            inherited_first >= 0, inherited_first,
            jnp.where(word == cfg.eos_token, t, -1))

        new_done = done | jnp.all(word == cfg.pad_token)
        n_steps = jnp.where(done, n_steps, t + 1)

        # freeze the OUTPUT-bearing state once done (the reference's loop
        # break); h/c need no freeze — nothing after `done` is read
        keep = lambda n, o: jnp.where(done, o, n)
        carry = (new_h, new_c, keep(word, tokens),
                 keep(top_val, cum_prob), keep(new_last_eos, last_eos),
                 keep(new_first_eos, first_eos),
                 keep(new_hist, history), new_done, n_steps)
        return carry, None

    L, H = cfg.n_layers, cfg.hidden_size
    init_cum = jnp.full((B, K), neg_inf).at[:, 0].set(0.0)  # 1 live beam at t=0
    state_shape = (B, K, H) if hoist else (B, K, L, H)
    h0 = jnp.zeros(state_shape, dtype)
    c0 = jnp.zeros((1, 1, 1), dtype) if is_gru else jnp.zeros(
        state_shape, dtype)
    init = (
        h0, c0,
        jnp.full((B, K), cfg.sos_token, jnp.int32),
        init_cum,
        jnp.full((B, K), -1, jnp.int32),     # last_eos (length penalty)
        jnp.full((B, K), -1, jnp.int32),     # first_eos (serving cutoff)
        jnp.full((B, K, T), cfg.pad_token, jnp.int32),
        jnp.asarray(False), jnp.zeros([], jnp.int32),
    )
    if early_exit:
        def cond(carry):
            t, c = carry
            keep_going = jnp.logical_not(c[7])       # c[7] = done
            if length_cutoff_margin is not None:
                first_eos = c[5]                     # (B, K), sticky
                all_ended = jnp.all(first_eos >= 0)
                cut = all_ended & (
                    t >= jnp.max(first_eos) + 1 + length_cutoff_margin)
                keep_going &= jnp.logical_not(cut)
            return (t < T) & keep_going

        def body(carry):
            t, c = carry
            c, _ = step(c, t)
            return t + 1, c

        _, (h, c, tokens, cum_prob, last_eos, first_eos, history, done,
            n_steps) = \
            jax.lax.while_loop(cond, body, (jnp.zeros([], jnp.int32), init))
        return BeamResult(history[:, 0, :], n_steps, cum_prob)
    (h, c, tokens, cum_prob, last_eos, first_eos, history, done,
     n_steps) = jax.lax.scan(step, init, jnp.arange(T), unroll=unroll)[0]
    return BeamResult(history[:, 0, :], n_steps, cum_prob)


@partial(jax.jit, static_argnames=("cfg", "max_len", "top_k"))
def sample_decode(params: Dict, cfg: dec_mod.DecoderConfig,
                  encoder_outputs: jax.Array, max_len: int,
                  rng: jax.Array, temperature: float = 1.0,
                  top_k: int = 0) -> GreedyResult:
    """Stochastic decoding: temperature / top-k sampling over the softmax.

    New capability (the reference only has greedy + beam, eval.py:19-120);
    useful for caption diversity. Same fixed-shape scan + freeze-on-all-PAD
    semantics as greedy_decode.
    """
    B = encoder_outputs.shape[0]
    T = max_len + 1
    uv = attn_ops.precompute_uv(params["attention"], encoder_outputs)
    init_token = jnp.full((B,), cfg.sos_token, jnp.int32)
    step_logits = _make_step_logits(params, cfg, encoder_outputs, uv)

    def step(carry, t):
        state, token, done, n_steps = carry
        logits, new_state = step_logits(token, state)
        logits = logits / jnp.maximum(temperature, 1e-6)
        if top_k > 0:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        out = jax.random.categorical(
            jax.random.fold_in(rng, t), logits, axis=-1).astype(jnp.int32)
        out = jnp.where(done, jnp.int32(cfg.pad_token), out)
        new_done = done | jnp.all(out == cfg.pad_token)
        n_steps = jnp.where(done, n_steps, t + 1)
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(done, o, n), new_state, state)
        return (state, out, new_done, n_steps), out

    init = (dec_mod.zero_state(cfg, B, encoder_outputs.dtype), init_token,
            jnp.asarray(False), jnp.zeros([], jnp.int32))
    (_, _, _, n_steps), tokens = jax.lax.scan(step, init, jnp.arange(T))
    return GreedyResult(tokens, n_steps)


def tokens_to_sentences(idxs, idx2word, eos_token: int):
    """(T, B) or (B, T)→list[str]; cut at first EOS (reference: utils.py:11-20).

    Accepts time-major (T, B) like the reference's convert_idxs_to_sentences
    (which transposes internally).
    """
    import numpy as np

    arr = np.asarray(idxs).T  # -> (B, T) rows
    sentences = []
    for row in arr:
        words = []
        for idx in row:
            if int(idx) == eos_token:
                break
            words.append(idx2word[int(idx)])
        sentences.append(" ".join(words))
    return sentences
