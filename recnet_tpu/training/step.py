"""The jitted train/val step — the whole of reference train.py:241-273 as one
compiled XLA program.

One call = decoder rollout (lax.scan) + reconstructor rollout (lax.scan) +
joint loss + grads + clip + two optimizer updates. No host round-trips inside;
metrics come back as device scalars.

Loss semantics (all reference quirks preserved, see ops/losses.py and
models/reconstructors.py):
  total = [Σ_t mean-CE_t / Σ tokens + 0.001·Σ‖θ_dec‖]
        + λ_recon · [recon_mse + 0.01·Σ‖θ_rec‖]
Teacher forcing is one Bernoulli draw per iteration (train.py:37-38).
Gradient clip (global-norm 50) applies to the decoder grads only
(train.py:269-270).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from recnet_tpu.config import TrainConfig
from recnet_tpu.models import decoder as dec_mod
from recnet_tpu.models import reconstructors as rec_mod
from recnet_tpu.ops.losses import step_mean_ce, l2_norm_sum
from recnet_tpu.training.optim import torch_adam, clip_by_global_norm


class TrainState(NamedTuple):
    step: jax.Array
    dec_params: Any
    dec_opt: Any
    rec_params: Any = None
    rec_opt: Any = None


def init_train_state(key: jax.Array, tc: TrainConfig, vocab_size: int
                     ) -> Tuple[TrainState, dec_mod.DecoderConfig,
                                Optional[rec_mod.ReconstructorConfig]]:
    dcfg = dec_mod.config_from_train(tc, vocab_size)
    rcfg = rec_mod.config_from_train(tc) if tc.use_recon else None

    def make(key):
        k_dec, k_rec = jax.random.split(key)
        dec_params = dec_mod.init_decoder_params(k_dec, dcfg)
        dec_tx = torch_adam(tc.decoder_learning_rate,
                            tc.decoder_weight_decay,
                            amsgrad=tc.decoder_use_amsgrad)
        state = TrainState(
            step=jnp.zeros([], jnp.int32),
            dec_params=dec_params,
            dec_opt=dec_tx.init(dec_params),
        )
        if rcfg is not None:
            rec_params = rec_mod.init_reconstructor_params(k_rec, rcfg)
            rec_tx = torch_adam(tc.reconstructor_learning_rate,
                                tc.reconstructor_weight_decay,
                                amsgrad=tc.reconstructor_use_amsgrad)
            state = state._replace(rec_params=rec_params,
                                   rec_opt=rec_tx.init(rec_params))
        return state

    # ONE jitted program instead of ~40 eager ops: on a tunneled link each
    # eager random/zeros op pays a dispatch round-trip, making eager init
    # 13-25 s of warm-start cost at the flagship config; the fused program
    # is one dispatch (eager 23.8 s -> 3.2 s measured). Values: measured
    # bit-identical to the eager path on TPU (65/65 leaves, flagship
    # config); on CPU the fused program FMA-contracts random.uniform's
    # affine rescale, shifting uniform-initialized leaves by 1-2 ulp vs
    # eager — determinism and the ulp bound are pinned by
    # tests/test_train_step.py::test_jit_init_matches_eager.
    return jax.jit(make)(key), dcfg, rcfg


def _forward(dec_params, rec_params, dcfg, rcfg, tc_pad, lambda_recon,
             dec_lambda_reg, rec_lambda_reg, videos, captions,
             use_tf, rng, train, always_tf: bool = False,
             compute_dtype=None):
    """Joint forward; returns (total, aux).

    always_tf=True takes the specialized rollout with the vocab projection
    hoisted out of the scan (valid when teacher forcing is statically on).
    compute_dtype (e.g. bf16) casts params + activations for the rollouts;
    the regularizers stay on the master-precision params and the losses
    reduce in f32 (ops/losses.py)."""
    # regularizers are about the master parameters' magnitudes
    dec_reg = dec_lambda_reg * l2_norm_sum(dec_params)
    rec_reg = (rec_lambda_reg * l2_norm_sum(rec_params)
               if rec_params is not None else None)
    if compute_dtype is not None:
        cast = lambda tree: jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)
        dec_params = cast(dec_params)
        rec_params = cast(rec_params) if rec_params is not None else None
        videos = videos.astype(compute_dtype)
    mask = (captions > tc_pad)                                    # (T, B)
    if rng is not None:
        rng_d, rng_r = jax.random.split(rng)
    else:
        rng_d = rng_r = None

    if always_tf:
        rollout = dec_mod.teacher_forced_rollout_fast(
            dec_params, dcfg, videos, captions, rng_d, train)
    else:
        rollout = dec_mod.teacher_forced_rollout(
            dec_params, dcfg, videos, captions, use_tf, rng_d, train)
    ce, n_tok = step_mean_ce(rollout.logits, captions, mask)
    dec_loss = ce + dec_reg

    aux = {"n_tokens": n_tok, "greedy_tokens": rollout.greedy_tokens}
    if rec_params is None:
        aux["dec_loss"] = dec_loss
        aux["rec_loss"] = jnp.zeros([], dec_loss.dtype)
        return dec_loss, aux

    fmask = mask.astype(rollout.logits.dtype)
    step_mask = (jnp.sum(fmask, axis=1) > 0).astype(rollout.logits.dtype)
    t_eff = jnp.maximum(jnp.sum(step_mask), 1.0)
    rec = rec_mod.recon_loss(rec_params, rcfg, rollout.hiddens, videos,
                             step_mask, t_eff, rng_r, train)
    rec_loss = rec + rec_reg
    total = dec_loss + lambda_recon * rec_loss
    aux["dec_loss"] = dec_loss
    aux["rec_loss"] = rec_loss
    return total, aux


def build_train_step(tc: TrainConfig, dcfg: dec_mod.DecoderConfig,
                     rcfg: Optional[rec_mod.ReconstructorConfig]):
    """Returns jitted fn(state, videos, captions, rng) -> (state, metrics)."""
    return jax.jit(_make_step_fn(tc, dcfg, rcfg), donate_argnums=(0,))


def build_train_multi_step(tc: TrainConfig, dcfg: dec_mod.DecoderConfig,
                           rcfg: Optional[rec_mod.ReconstructorConfig],
                           k: int):
    """k train steps per device dispatch, as one jitted ``lax.scan``.

    fn(state, videos (k,B,F,E), captions (k,T,B), rng)
      -> (state, metrics with a leading (k,) axis)

    Bit-identical to k sequential :func:`build_train_step` calls with the
    same ``rng`` (the per-iteration randomness folds ``state.step``, which
    the scan advances exactly as the outer loop would — pinned by
    tests/test_train_step.py). Rationale: the per-step program is already
    one fused XLA computation, but each dispatch still pays the host
    round-trip (~1-4 ms through remote links, and a non-trivial enqueue
    even locally); at the reference recipe (B=100, 9 ms device step) that
    overhead is the gap between device-bound and dispatch-bound wall time.
    The reference has no analogue — it syncs every iteration
    (train.py:275-277)."""
    step_fn = _make_step_fn(tc, dcfg, rcfg)

    def multi_fn(state: TrainState, videos, captions, rng):
        def body(s, xs):
            v, c = xs
            return step_fn(s, v, c, rng)

        return jax.lax.scan(body, state, (videos, captions), length=k)

    return jax.jit(multi_fn, donate_argnums=(0,))


def build_train_step_cached(tc: TrainConfig, dcfg: dec_mod.DecoderConfig,
                            rcfg: Optional[rec_mod.ReconstructorConfig]):
    """Device-feature-cache variant (config.device_feature_cache).

    fn(state, cache (V,F,E), vid_rows (B,) int32, captions, rng)
      -> (state, metrics)

    The whole train feature set stays resident in HBM and each step gathers
    its batch with one on-device ``jnp.take`` — the host sends only row
    indices + caption tokens (~12 KB vs ~17 MB at the reference recipe), so
    training is never host->device bandwidth bound.  Bit-identical to
    :func:`build_train_step` on the same batches (the gather reproduces the
    exact f32 rows; tests/test_train_step.py pins it).  The cache is an
    ARGUMENT, not a closure: jit-closing over a 200 MB array would ship it
    with the compile request (NOTES.md environment lessons).

    The cache may be stored half-width (config.feature_cache_dtype); the
    gather casts rows back to f32 so downstream compute is unchanged.
    """
    step_fn = _make_step_fn(tc, dcfg, rcfg)

    def fn(state: TrainState, cache, vid_rows, captions, rng):
        videos = _gather_f32(cache, vid_rows)
        return step_fn(state, videos, captions, rng)

    return jax.jit(fn, donate_argnums=(0,))


def _gather_f32(cache, vid_rows):
    """On-device row gather that undoes half-width cache storage
    (config.feature_cache_dtype): gather in the storage dtype (half the
    HBM read for bf16/f16), then widen to f32 for compute. No-op cast for
    the default f32 cache, preserving its bit-identity contract."""
    videos = jnp.take(cache, vid_rows, axis=0)
    if videos.dtype != jnp.float32:
        videos = videos.astype(jnp.float32)
    return videos


def build_train_multi_step_cached(tc: TrainConfig,
                                  dcfg: dec_mod.DecoderConfig,
                                  rcfg: Optional[rec_mod.ReconstructorConfig],
                                  k: int):
    """k cached steps per dispatch: fn(state, cache, vid_rows (k,B),
    captions (k,T,B), rng); the cache rides outside the scan carry."""
    step_fn = _make_step_fn(tc, dcfg, rcfg)

    def multi_fn(state: TrainState, cache, vid_rows, captions, rng):
        def body(s, xs):
            rows, c = xs
            return step_fn(s, _gather_f32(cache, rows), c, rng)

        return jax.lax.scan(body, state, (vid_rows, captions), length=k)

    return jax.jit(multi_fn, donate_argnums=(0,))


def _make_step_fn(tc: TrainConfig, dcfg: dec_mod.DecoderConfig,
                  rcfg: Optional[rec_mod.ReconstructorConfig]):
    dec_tx = torch_adam(tc.decoder_learning_rate, tc.decoder_weight_decay,
                        amsgrad=tc.decoder_use_amsgrad)
    rec_tx = torch_adam(tc.reconstructor_learning_rate,
                        tc.reconstructor_weight_decay,
                        amsgrad=tc.reconstructor_use_amsgrad) if tc.use_recon \
        else None
    pad = tc.init_word2idx_dict["<PAD>"]

    # Static specialization: ratio >= 1.0 means the per-iteration Bernoulli
    # (train.py:37-38, random.random() <= ratio) is always True, so the
    # fast TF rollout applies unconditionally.
    always_tf = tc.decoder_teacher_forcing_ratio >= 1.0
    if tc.train_precision not in ("float32", "bfloat16"):
        raise ValueError(
            f"Unknown train_precision {tc.train_precision!r}; "
            "expected 'float32' or 'bfloat16'")
    compute_dtype = (jnp.bfloat16 if tc.train_precision == "bfloat16"
                     else None)

    def step_fn(state: TrainState, videos, captions, rng):
        rng_tf, rng_fwd = jax.random.split(jax.random.fold_in(rng, state.step))
        # One Bernoulli per iteration for the whole batch (train.py:37-38).
        use_tf = (jax.random.uniform(rng_tf) <=
                  tc.decoder_teacher_forcing_ratio)

        def loss_fn(dec_params, rec_params):
            return _forward(dec_params, rec_params, dcfg, rcfg, pad,
                            tc.lambda_recon, tc.decoder_lambda_reg,
                            tc.reconstructor_lambda_reg, videos, captions,
                            use_tf, rng_fwd, train=True, always_tf=always_tf,
                            compute_dtype=compute_dtype)

        if tc.use_recon:
            (total, aux), (dec_g, rec_g) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    state.dec_params, state.rec_params)
        else:
            (total, aux), dec_g = jax.value_and_grad(
                loss_fn, argnums=0, has_aux=True)(state.dec_params, None)
            rec_g = None

        gnorm = jnp.zeros([], total.dtype)
        if tc.use_gradient_clip:
            dec_g, gnorm = clip_by_global_norm(dec_g, tc.gradient_clip)

        dec_updates, dec_opt = dec_tx.update(dec_g, state.dec_opt,
                                             state.dec_params)
        dec_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.dec_params, dec_updates)

        rec_params, rec_opt = state.rec_params, state.rec_opt
        if tc.use_recon:
            rec_updates, rec_opt = rec_tx.update(rec_g, state.rec_opt,
                                                 state.rec_params)
            rec_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.rec_params, rec_updates)

        new_state = TrainState(state.step + 1, dec_params, dec_opt,
                               rec_params, rec_opt)
        metrics = {
            "loss": total,
            "dec_loss": aux["dec_loss"],
            "rec_loss": aux["rec_loss"],
            "grad_norm": gnorm,
            "n_tokens": aux["n_tokens"],
        }
        return new_state, metrics

    return step_fn


def build_val_step(tc: TrainConfig, dcfg: dec_mod.DecoderConfig,
                   rcfg: Optional[rec_mod.ReconstructorConfig]):
    """Eval-mode forward with teacher forcing OFF (reference calls
    forward_decoder with the default ratio 0 at train.py:327-328) — the
    decoder feeds its own argmax. Returns losses + greedy token chain."""
    pad = tc.init_word2idx_dict["<PAD>"]

    def val_fn(dec_params, rec_params, videos, captions):
        total, aux = _forward(
            dec_params, rec_params, dcfg, rcfg, pad, tc.lambda_recon,
            tc.decoder_lambda_reg, tc.reconstructor_lambda_reg,
            videos, captions, use_tf=jnp.asarray(False), rng=None, train=False)
        return {
            "loss": total,
            "dec_loss": aux["dec_loss"],
            "rec_loss": aux["rec_loss"],
            "greedy_tokens": aux["greedy_tokens"],
        }

    return jax.jit(val_fn)


def build_val_step_cached(tc: TrainConfig, dcfg: dec_mod.DecoderConfig,
                          rcfg: Optional[rec_mod.ReconstructorConfig]):
    """Device-feature-cache variant of :func:`build_val_step`:
    fn(dec_params, rec_params, cache (V,F,E), vid_rows (B,), captions).
    The val pass re-visits every (video, caption) pair — ~40 pairs per
    video at MSVD scale — so the cached gather saves a ~0.7 GB host
    upload per validation at the reference recipe."""
    pad = tc.init_word2idx_dict["<PAD>"]

    def val_fn(dec_params, rec_params, cache, vid_rows, captions):
        videos = _gather_f32(cache, vid_rows)
        total, aux = _forward(
            dec_params, rec_params, dcfg, rcfg, pad, tc.lambda_recon,
            tc.decoder_lambda_reg, tc.reconstructor_lambda_reg,
            videos, captions, use_tf=jnp.asarray(False), rng=None, train=False)
        return {
            "loss": total,
            "dec_loss": aux["dec_loss"],
            "rec_loss": aux["rec_loss"],
            "greedy_tokens": aux["greedy_tokens"],
        }

    return jax.jit(val_fn)
