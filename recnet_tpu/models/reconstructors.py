"""Global & local feature reconstructors — fixed-shape scan rebuilds.

Reference: models/global_reconstructor.py, models/local_reconstructor.py and
their driving loops train.py:78-131. Both regenerate the encoder features from
the decoder's hidden states (the cycle-consistency auxiliary loss of RecNet).

Faithful quirks preserved:
* global: mean-pool of decoder hiddens over (time, layers) rescaled by
  caption_max_len / T_eff (global_reconstructor.py:31-37); loss divided by
  T_eff (train.py:101-102);
* local: *unnormalized* additive attention over decoder hiddens, mean over the
  T axis (local_reconstructor.py:44-49); loss NOT divided by step count
  (train.py:127-130).

TPU-first: the global mean-pool is constant across reconstructor steps, so it
is hoisted out of the scan (the reference recomputes it every step); the local
attention's U·h projection over decoder hiddens is likewise precomputed.
T_eff (the reference's dynamic number of executed decoder steps) enters as a
traced scalar with masks, keeping shapes static.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from recnet_tpu.ops import attention as attn_ops
from recnet_tpu.ops import rnn as rnn_ops


class ReconstructorConfig(NamedTuple):
    kind: str = "global"              # ["global", "local"]
    cell_type: str = "LSTM"
    n_layers: int = 1
    decoder_hidden_size: int = 512
    hidden_size: int = 1536
    attn_size: int = 128              # local only
    dropout: float = 0.5              # inter-layer RNN dropout (no-op at 1 layer)
    decoder_dropout: float = 0.5      # on the pooled/attended decoder input
    caption_max_len: int = 30         # global rescale factor
    encoder_output_len: int = 28      # local step count


def init_reconstructor_params(key: jax.Array, cfg: ReconstructorConfig,
                              dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 3 + cfg.n_layers)
    bound = 1.0 / (cfg.hidden_size ** 0.5)
    if cfg.kind == "global":
        in_size0 = cfg.decoder_hidden_size * 2   # global_reconstructor.py:23
    else:
        in_size0 = cfg.decoder_hidden_size       # local_reconstructor.py:30
    rnn_layers = []
    for li in range(cfg.n_layers):
        in_size = in_size0 if li == 0 else cfg.hidden_size
        rnn_layers.append(rnn_ops.init_rnn_params(
            keys[3 + li], cfg.cell_type, in_size, cfg.hidden_size, dtype))
    params = {
        "rnn": rnn_layers,
        "out_w": jax.random.uniform(
            keys[0], (cfg.hidden_size, cfg.hidden_size), dtype, -bound, bound),
        "out_b": jax.random.uniform(
            keys[1], (cfg.hidden_size,), dtype, -bound, bound),
    }
    if cfg.kind == "local":
        params["attention"] = attn_ops.init_attention_params(
            keys[2], cfg.hidden_size, cfg.decoder_hidden_size, cfg.attn_size,
            dtype)
    return params


def _dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _multilayer_rnn(cfg: ReconstructorConfig, params_layers, x, state,
                    rng, train):
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


def _zero_state(cfg: ReconstructorConfig, batch: int, dtype):
    z = jnp.zeros((cfg.n_layers, batch, cfg.hidden_size), dtype)
    return (z, z)


def global_reconstruct(params: Dict, cfg: ReconstructorConfig,
                       decoder_hiddens: jax.Array, step_mask: jax.Array,
                       t_eff: jax.Array, rng: Optional[jax.Array] = None,
                       train: bool = False) -> jax.Array:
    """Run the global reconstructor over T steps; return outputs (T, B, hid).

    decoder_hiddens: (T, L, B, Hdec); step_mask: (T,) 1.0 for executed steps;
    t_eff: scalar = Σ step_mask (the reference's batch_specific_len,
    global_reconstructor.py:31).
    """
    T, L, B, Hd = decoder_hiddens.shape
    dtype = decoder_hiddens.dtype

    # Masked mean over (T, L), rescaled by caption_max_len / T_eff
    # (global_reconstructor.py:33-37). Hoisted: constant across steps.
    masked = decoder_hiddens * step_mask[:, None, None, None]
    mean_pooled = masked.sum(axis=(0, 1)) / (t_eff * L)         # (B, Hd)
    mean_pooled = mean_pooled / t_eff * cfg.caption_max_len
    if rng is not None:
        rng, r_dd = jax.random.split(rng)
        # Reference applies decoder_dropout inside each step forward
        # (global_reconstructor.py:38) — per-step fresh masks.
        per_step_dd = jax.random.split(r_dd, T)
    else:
        per_step_dd = None

    if cfg.n_layers == 1:
        # TPU fast path: EVERY step input is known before the scan (the
        # mean-pool is constant, the per-step decoder hiddens are the
        # scanned xs, and the per-step dropout masks are key-indexed), so
        # the input-side gate matmul x@W_ih and the output projection
        # hoist out of the loop into two (T·B)-row matmuls. Besides the
        # MXU batching win, this removes the (in, gates) W_ih-gradient
        # accumulator from the backward scan's carry — measured ~17% of
        # the whole train step's HBM time at B=100 (DESIGN.md §4c).
        # Semantics identical to the general path below (same draws:
        # per_step_dd[t] masks, fold_in(rng, t) is only consumed by
        # inter-layer dropout, which doesn't exist at one layer).
        if per_step_dd is not None:
            mp_all = jax.vmap(
                lambda k: _dropout(mean_pooled, cfg.decoder_dropout, k,
                                   train))(per_step_dd)          # (T, B, Hd)
        else:
            mp_all = jnp.broadcast_to(mean_pooled[None], (T, B, Hd))
        x_all = jnp.concatenate([decoder_hiddens[:, 0], mp_all], -1)
        p0 = params["rnn"][0]
        gi_all = x_all @ p0["w_ih"] + p0["b_ih"]                 # (T, B, G)
        z = jnp.zeros((B, cfg.hidden_size), dtype)
        # custom-VJP rollout: W_hh's gradient is contracted outside the
        # backward scan instead of riding its carry (ops/rnn.py)
        outs = rnn_ops.rnn_rollout_pre(cfg.cell_type, p0, gi_all, z, z)
        return outs @ params["out_w"] + params["out_b"]

    def step(state, xs):
        t, h_t = xs
        mp = mean_pooled
        if per_step_dd is not None:
            mp = _dropout(mp, cfg.decoder_dropout, per_step_dd[t], train)
        # input = concat(decoder_hiddens[t][0], mean_pooled)
        # (global_reconstructor.py:40 takes input[0] = first layer)
        x = jnp.concatenate([h_t[0], mp], axis=-1)
        r = None if rng is None else jax.random.fold_in(rng, t)
        out, new_state = _multilayer_rnn(cfg, params["rnn"], x, state, r, train)
        y = out @ params["out_w"] + params["out_b"]
        return new_state, y

    init = _zero_state(cfg, B, dtype)
    _, outputs = jax.lax.scan(step, init, (jnp.arange(T), decoder_hiddens))
    return outputs                                               # (T, B, hid)


def global_recon_loss(params: Dict, cfg: ReconstructorConfig,
                      decoder_hiddens: jax.Array, encoder_outputs: jax.Array,
                      step_mask: jax.Array, t_eff: jax.Array,
                      rng: Optional[jax.Array] = None,
                      train: bool = False) -> jax.Array:
    """MSE(mean_t outputs, mean_f enc) / T_eff (train.py:92-102)."""
    outputs = global_reconstruct(params, cfg, decoder_hiddens, step_mask,
                                 t_eff, rng, train)
    out_mean = (outputs * step_mask[:, None, None]).sum(0) / t_eff   # (B, hid)
    enc_mean = encoder_outputs.mean(axis=1)                          # (B, enc)
    loss = jnp.mean(jnp.square(out_mean - enc_mean))
    return loss / t_eff


def local_reconstruct(params: Dict, cfg: ReconstructorConfig,
                      decoder_hiddens: jax.Array, step_mask: jax.Array,
                      t_eff: jax.Array, rng: Optional[jax.Array] = None,
                      train: bool = False) -> jax.Array:
    """Run the local reconstructor for encoder_output_len steps.

    decoder_hiddens: (T, L, B, Hdec) with L == 1 (the reference's local path
    feeds the layer axis to the RNN as a length-1 sequence,
    local_reconstructor.py:49-52 — only meaningful at one layer).
    Returns outputs (F, B, hid).
    """
    T, L, B, Hd = decoder_hiddens.shape
    assert L == 1, "local reconstructor requires decoder_n_layers == 1"
    dtype = decoder_hiddens.dtype
    hs = decoder_hiddens[:, 0]                                   # (T, B, Hd)
    hs_btv = jnp.transpose(hs, (1, 0, 2))                        # (B, T, Hd)
    uv = attn_ops.precompute_uv(params["attention"], hs_btv)     # (B, T, A)
    mask_bt = jnp.broadcast_to(step_mask[None, :], (B, T))

    # NOTE (measured, v5e, B=100): a custom-VJP rollout of this fused
    # attention+cell step (out-of-scan weight-gradient contractions, like
    # the decoder's _tf_attn_rollout) was implemented, verified
    # gradient-exact, and A/B'd at 12.3 vs 11.2 ms/step — 10% SLOWER than
    # plain scan-autodiff, because the d(hs) (B, T, Hd) cotangent must
    # ride the backward carry here (the attention VALUES are themselves
    # an upstream activation) and the attention activation recompute per
    # backward step outweighs the saved accumulator traffic. Tried and
    # reverted; the scan below is the fast path.

    def step(state, t):
        query = state[0][-1]                                     # (B, hid)
        x = attn_ops.attend_mean(params["attention"], query, hs_btv, uv,
                                 mask=mask_bt, denom=t_eff)
        r = None if rng is None else jax.random.fold_in(rng, t)
        if r is not None:
            r, r_dd = jax.random.split(r)
            x = _dropout(x, cfg.decoder_dropout, r_dd, train)
        out, new_state = _multilayer_rnn(cfg, params["rnn"], x, state, r, train)
        return new_state, out

    init = _zero_state(cfg, B, dtype)
    _, outs = jax.lax.scan(step, init, jnp.arange(cfg.encoder_output_len))
    # output projection hoisted out of the scan: one (F·B)-row matmul, and
    # out_w's gradient no longer accumulates in the backward carry
    return outs @ params["out_w"] + params["out_b"]              # (F, B, hid)


def local_recon_loss(params: Dict, cfg: ReconstructorConfig,
                     decoder_hiddens: jax.Array, encoder_outputs: jax.Array,
                     step_mask: jax.Array, t_eff: jax.Array,
                     rng: Optional[jax.Array] = None,
                     train: bool = False) -> jax.Array:
    """MSE(outputs^T, enc) — NOT divided by steps (train.py:127-130)."""
    outputs = local_reconstruct(params, cfg, decoder_hiddens, step_mask,
                                t_eff, rng, train)
    pred = jnp.transpose(outputs, (1, 0, 2))                     # (B, F, hid)
    return jnp.mean(jnp.square(pred - encoder_outputs))


def recon_loss(params: Dict, cfg: ReconstructorConfig,
               decoder_hiddens: jax.Array, encoder_outputs: jax.Array,
               step_mask: jax.Array, t_eff: jax.Array,
               rng: Optional[jax.Array] = None, train: bool = False):
    if cfg.kind == "global":
        return global_recon_loss(params, cfg, decoder_hiddens, encoder_outputs,
                                 step_mask, t_eff, rng, train)
    elif cfg.kind == "local":
        return local_recon_loss(params, cfg, decoder_hiddens, encoder_outputs,
                                step_mask, t_eff, rng, train)
    raise ValueError(f"Unknown reconstructor kind: {cfg.kind}")


def config_from_train(tc) -> ReconstructorConfig:
    return ReconstructorConfig(
        kind=tc.reconstructor_type,
        cell_type=tc.reconstructor_model,
        n_layers=tc.reconstructor_n_layers,
        decoder_hidden_size=tc.decoder_hidden_size,
        hidden_size=tc.reconstructor_hidden_size,
        attn_size=tc.reconstructor_attn_size,
        dropout=tc.reconstructor_dropout,
        decoder_dropout=tc.reconstructor_decoder_dropout,
        caption_max_len=tc.caption_max_len,
        encoder_output_len=tc.encoder_output_len,
    )
