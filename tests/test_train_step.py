"""Jitted train step: compiles once, loss decreases, works for all configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recnet_tpu.config import TrainConfig
from recnet_tpu.training.step import (
    init_train_state, build_train_step, build_val_step)


def _tiny_tc(**overrides):
    kw = dict(
        caption_max_len=8, batch_size=4, embedding_size=12,
        encoder_output_size=20, encoder_output_len=6,
        decoder_hidden_size=16, decoder_attn_size=8,
        reconstructor_hidden_size=20, reconstructor_attn_size=8,
        decoder_learning_rate=1e-2, reconstructor_learning_rate=1e-3,
    )
    kw.update(overrides)
    return TrainConfig(**kw)


def _batch(rng, tc, vocab_size):
    T = tc.caption_max_len + 1
    videos = rng.standard_normal(
        (tc.batch_size, tc.encoder_output_len, tc.encoder_output_size)
    ).astype(np.float32)
    targets = np.zeros((T, tc.batch_size), np.int32)
    for b in range(tc.batch_size):
        L = int(rng.integers(2, T))
        targets[: L - 1, b] = rng.integers(3, vocab_size, L - 1)
        targets[L - 1, b] = 2
    return jnp.asarray(videos), jnp.asarray(targets)


@pytest.mark.parametrize("recon", [None, "global", "local"])
def test_jit_init_matches_eager(recon):
    """init_train_state fuses the ~40 init ops into ONE jitted program
    (each eager op pays a dispatch round-trip on tunneled links — 24 s vs
    3 s measured at the flagship config). Contract: the fused program is
    deterministic (same seed -> bit-identical state across calls), and it
    matches the op-by-op eager path bit-for-bit ON TPU (measured 65/65
    leaves at the flagship config). On CPU, XLA contracts random.uniform's
    affine rescale into an FMA inside the fused program, so eager vs jit
    may differ by 1-2 ulp on the uniform-initialized leaves — pinned here
    to a strict 4-ulp bound rather than exact equality."""
    tc = _tiny_tc(use_recon=recon is not None,
                  reconstructor_type=recon or "global")
    key = jax.random.PRNGKey(tc.seed)
    st_jit, _, _ = init_train_state(key, tc, vocab_size=23)
    st_jit2, _, _ = init_train_state(key, tc, vocab_size=23)
    leaves_j = jax.tree_util.tree_leaves(st_jit)
    leaves_j2 = jax.tree_util.tree_leaves(st_jit2)
    for a, b in zip(leaves_j, leaves_j2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with jax.disable_jit():
        st_eager, _, _ = init_train_state(key, tc, vocab_size=23)
    leaves_e = jax.tree_util.tree_leaves(st_eager)
    assert len(leaves_e) == len(leaves_j)
    for a, b in zip(leaves_e, leaves_j):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape
        if a.dtype == np.float32:
            # the FMA contraction's rounding error is absolute at the
            # scale of the affine intermediate (u * (max-min)), so bound
            # by ulps of the LEAF's magnitude, not of each element —
            # near-zero elements legitimately carry the full ~1.5e-8
            scale = max(np.abs(a).max(), np.abs(b).max(), 1e-30)
            tol = 4 * np.spacing(np.float32(scale))
            assert np.all(np.abs(a - b) <= tol), \
                f"leaf differs beyond 4 ulp of {scale}: " \
                f"max {np.abs(a - b).max()}"
        else:
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("setup", [
    ("GRU", False, None),
    ("GRU", True, "global"),
    ("LSTM", True, "local"),
])
def test_train_step_runs_and_learns(setup, rng):
    cell, use_recon, rkind = setup
    tc = _tiny_tc(decoder_model=cell, use_recon=use_recon,
                  reconstructor_type=rkind or "global")
    V = 25
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    step = build_train_step(tc, dcfg, rcfg)

    videos, captions = _batch(rng, tc, V)
    key = jax.random.PRNGKey(42)
    losses = []
    for i in range(30):
        state, metrics = step(state, videos, captions, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses[0]} -> {losses[-1]}"
    assert int(state.step) == 30


def test_val_step_deterministic(rng):
    tc = _tiny_tc(use_recon=True, reconstructor_type="global")
    V = 25
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    val = build_val_step(tc, dcfg, rcfg)
    videos, captions = _batch(rng, tc, V)
    m1 = val(state.dec_params, state.rec_params, videos, captions)
    m2 = val(state.dec_params, state.rec_params, videos, captions)
    assert float(m1["loss"]) == float(m2["loss"])  # no dropout in eval
    assert m1["greedy_tokens"].shape == (tc.caption_max_len + 1, tc.batch_size)


def test_teacher_forcing_ratio_zero_uses_greedy_feed(rng):
    """With ratio 0.0 the rollout must differ from ratio 1.0 (greedy chain)."""
    tc1 = _tiny_tc(decoder_teacher_forcing_ratio=1.0)
    tc0 = _tiny_tc(decoder_teacher_forcing_ratio=0.0)
    V = 25
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc1, V)
    videos, captions = _batch(rng, tc1, V)

    from recnet_tpu.models.decoder import teacher_forced_rollout
    r_tf = teacher_forced_rollout(state.dec_params, dcfg, videos, captions,
                                  jnp.asarray(True))
    r_gr = teacher_forced_rollout(state.dec_params, dcfg, videos, captions,
                                  jnp.asarray(False))
    # logits at step 0 identical (same SOS input), diverge later
    np.testing.assert_allclose(np.asarray(r_tf.logits[0]),
                               np.asarray(r_gr.logits[0]), rtol=1e-6)
    assert not np.allclose(np.asarray(r_tf.logits[-1]),
                           np.asarray(r_gr.logits[-1]))


def test_bf16_mixed_precision_training(rng):
    """train_precision='bfloat16': f32 master weights, bf16 compute —
    runs, learns, and keeps the optimizer state/params in f32."""
    tc = _tiny_tc(use_recon=True, reconstructor_type="global",
                  train_precision="bfloat16", decoder_learning_rate=1e-2)
    V = 25
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    step = build_train_step(tc, dcfg, rcfg)
    videos, captions = _batch(rng, tc, V)
    key = jax.random.PRNGKey(42)
    losses = []
    for _ in range(30):
        state, metrics = step(state, videos, captions, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses[0]} -> {losses[-1]}"
    # master params stayed f32
    for leaf in jax.tree_util.tree_leaves(state.dec_params):
        assert leaf.dtype == jnp.float32


def test_bf16_close_to_f32_early_trajectory(rng):
    """First few bf16 steps track the f32 recipe loosely (sanity that the
    cast path computes the same model, not a different one)."""
    kw = dict(use_recon=True, reconstructor_type="global",
              embedding_dropout=0.0, decoder_dropout=0.0,
              decoder_out_dropout=0.0, reconstructor_dropout=0.0,
              reconstructor_decoder_dropout=0.0)
    V = 25
    videos = captions = None
    losses = {}
    for prec in ("float32", "bfloat16"):
        tc = _tiny_tc(train_precision=prec, **kw)
        state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
        step = build_train_step(tc, dcfg, rcfg)
        if videos is None:
            videos, captions = _batch(rng, tc, V)
        key = jax.random.PRNGKey(1)
        ls = []
        for _ in range(5):
            state, m = step(state, videos, captions, key)
            ls.append(float(m["loss"]))
        losses[prec] = np.asarray(ls)
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=0.05)


def test_invalid_train_precision_rejected():
    tc = _tiny_tc(train_precision="bf16")  # common typo for "bfloat16"
    V = 25
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    with pytest.raises(ValueError, match="train_precision"):
        build_train_step(tc, dcfg, rcfg)


@pytest.mark.parametrize("recon", [
    None, pytest.param("global", marks=pytest.mark.slow)])
def test_multi_step_matches_sequential(recon, rng):
    """build_train_multi_step(k): one scanned dispatch over k stacked
    batches must reproduce k sequential build_train_step calls with the
    same rng (the per-step randomness folds state.step, which the scan
    advances identically)."""
    from recnet_tpu.training.step import build_train_multi_step

    tc = _tiny_tc(use_recon=recon is not None,
                  reconstructor_type=recon or "global")
    V = 29
    k = 4
    state_a, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    state_b, _, _ = init_train_state(jax.random.PRNGKey(0), tc, V)

    batches = [_batch(rng, tc, V) for _ in range(k)]
    key = jax.random.PRNGKey(3)

    step = build_train_step(tc, dcfg, rcfg)
    metrics_seq = []
    for v, c in batches:
        state_a, m = step(state_a, v, c, key)
        metrics_seq.append(m)

    multi = build_train_multi_step(tc, dcfg, rcfg, k)
    videos_k = jnp.stack([v for v, _ in batches])
    caps_k = jnp.stack([c for _, c in batches])
    state_b, ms = multi(state_b, videos_k, caps_k, key)

    assert int(state_b.step) == int(state_a.step) == k
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(state_a.dec_params)[0],
            jax.tree_util.tree_flatten_with_path(state_b.dec_params)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(pa))
    for i, m in enumerate(metrics_seq):
        np.testing.assert_allclose(float(ms["loss"][i]), float(m["loss"]),
                                   rtol=1e-6)


def test_multi_step_loop_cadence_validation(tmp_path):
    """train() rejects steps_per_dispatch that does not divide a cadence."""
    from recnet_tpu.training.loop import train

    tc = _tiny_tc(steps_per_dispatch=3, log_every=500)  # 500 % 3 != 0
    with pytest.raises(ValueError, match="log_every"):
        train(tc)


@pytest.mark.parametrize("k", [1, pytest.param(3, marks=pytest.mark.slow)])
def test_cached_step_matches_uncached(k, rng=None):
    """build_train_step_cached (device feature cache) is bit-identical to
    the uncached step when the gathered rows equal the uploaded batch."""
    from recnet_tpu.training.step import (
        build_train_step_cached, build_train_multi_step,
        build_train_multi_step_cached)

    rng = np.random.default_rng(7)
    tc = _tiny_tc(use_recon=True, reconstructor_type="global")
    vocab_size = 30
    state_a, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc,
                                           vocab_size)
    state_b, _, _ = init_train_state(jax.random.PRNGKey(0), tc, vocab_size)
    key = jax.random.PRNGKey(3)

    # a cache of 10 videos; batches address rows (with repeats, like
    # multiple captions of one video landing in a batch)
    cache = jnp.asarray(rng.standard_normal(
        (10, tc.encoder_output_len, tc.encoder_output_size)
    ).astype(np.float32))
    steps = 4
    all_rows = rng.integers(0, 10, (steps, tc.batch_size)).astype(np.int32)
    caps = []
    for _ in range(steps):
        _, c = _batch(rng, tc, vocab_size)
        caps.append(c)

    if k == 1:
        plain = build_train_step(tc, dcfg, rcfg)
        cached = build_train_step_cached(tc, dcfg, rcfg)
        for s in range(steps):
            videos = jnp.take(cache, jnp.asarray(all_rows[s]), axis=0)
            state_a, ma = plain(state_a, videos, caps[s], key)
            state_b, mb = cached(state_b, cache, jnp.asarray(all_rows[s]),
                                 caps[s], key)
            assert float(ma["loss"]) == float(mb["loss"]), f"step {s}"
    else:
        plain = build_train_multi_step(tc, dcfg, rcfg, k)
        cached = build_train_multi_step_cached(tc, dcfg, rcfg, k)
        rows_k = jnp.asarray(all_rows[:k])
        caps_k = jnp.stack(caps[:k])
        videos_k = jnp.take(cache, rows_k.reshape(-1), axis=0).reshape(
            k, tc.batch_size, tc.encoder_output_len, tc.encoder_output_size)
        state_a, ma = plain(state_a, videos_k, caps_k, key)
        state_b, mb = cached(state_b, cache, rows_k, caps_k, key)
        np.testing.assert_array_equal(np.asarray(ma["loss"]),
                                      np.asarray(mb["loss"]))

    for a, b in zip(jax.tree_util.tree_leaves(state_a.dec_params),
                    jax.tree_util.tree_leaves(state_b.dec_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cached_step_halfwidth_cache_matches_prerounded():
    """A bfloat16 feature cache (config.feature_cache_dtype) is exactly
    the f32 path run on once-rounded features: gather-then-widen from the
    bf16 cache == widening the cache rows up front. Compute stays f32."""
    from recnet_tpu.training.step import build_train_step_cached

    rng = np.random.default_rng(11)
    tc = _tiny_tc(use_recon=True, reconstructor_type="global")
    vocab_size = 30
    state_a, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc,
                                           vocab_size)
    state_b, _, _ = init_train_state(jax.random.PRNGKey(0), tc, vocab_size)
    key = jax.random.PRNGKey(3)

    cache_f32 = jnp.asarray(rng.standard_normal(
        (10, tc.encoder_output_len, tc.encoder_output_size)
    ).astype(np.float32))
    cache_bf16 = cache_f32.astype(jnp.bfloat16)
    rows = jnp.asarray(rng.integers(0, 10, tc.batch_size).astype(np.int32))
    _, caps = _batch(rng, tc, vocab_size)

    plain = build_train_step(tc, dcfg, rcfg)
    cached = build_train_step_cached(tc, dcfg, rcfg)
    videos_rounded = jnp.take(cache_bf16, rows, axis=0).astype(jnp.float32)
    state_a, ma = plain(state_a, videos_rounded, caps, key)
    state_b, mb = cached(state_b, cache_bf16, rows, caps, key)
    assert float(ma["loss"]) == float(mb["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(state_a.dec_params),
                    jax.tree_util.tree_leaves(state_b.dec_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loop_rejects_unknown_feature_cache_dtype():
    from recnet_tpu.training.loop import train

    tc = _tiny_tc(device_feature_cache=True, feature_cache_dtype="int8")
    with pytest.raises(ValueError, match="feature_cache_dtype"):
        train(tc)


@pytest.mark.slow
def test_cached_loop_matches_uncached_loop(tmp_path):
    """The full training loop with device_feature_cache=True reproduces the
    uncached loop bit-for-bit (same fixture, same seeds)."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from fixtures import make_msvd_fixture, tiny_train_config
    from recnet_tpu.training.loop import train

    make_msvd_fixture(str(tmp_path), feat_dim=32)
    # validate/test cadences inside the run so the cached val step and the
    # device-resident score batches (evaluation.py) are exercised too
    base = dict(use_recon=True, reconstructor_type="global",
                n_iterations=4, log_every=2, validate_every=2,
                test_every=4, save_every=100)
    tc_a = tiny_train_config(str(tmp_path), **base)
    tc_b = tiny_train_config(str(tmp_path), device_feature_cache=True,
                             **base)
    state_a = train(tc_a, loss_only=False,
                    log_dir=str(tmp_path / "log_a"),
                    save_dir=str(tmp_path / "ck_a"))
    state_b = train(tc_b, loss_only=False,
                    log_dir=str(tmp_path / "log_b"),
                    save_dir=str(tmp_path / "ck_b"))
    for a, b in zip(jax.tree_util.tree_leaves(state_a.dec_params),
                    jax.tree_util.tree_leaves(state_b.dec_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cache_rejects_stochastic_sampling(tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from fixtures import make_msvd_fixture, tiny_train_config
    from recnet_tpu.training.loop import train

    make_msvd_fixture(str(tmp_path), feat_dim=32)
    tc = tiny_train_config(str(tmp_path), device_feature_cache=True,
                           frame_sampling_method="random", n_iterations=2)
    with pytest.raises(ValueError, match="uniform"):
        train(tc, loss_only=True, log_dir=str(tmp_path / "l"),
              save_dir=str(tmp_path / "c"))
