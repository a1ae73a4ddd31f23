"""End-to-end: fixture corpus → train loop → evaluate → checkpoint → resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recnet_tpu import checkpoint as ckpt
from recnet_tpu.data import Corpus
from recnet_tpu.evaluation import evaluate
from recnet_tpu.training.loop import train
from recnet_tpu.training.step import init_train_state, build_train_step

from fixtures import make_msvd_fixture, tiny_train_config


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("msvd_e2e"))
    make_msvd_fixture(root)
    return root


@pytest.mark.slow
def test_full_train_loop_with_eval_and_checkpoint(fixture_root, tmp_path):
    tc = tiny_train_config(
        fixture_root, n_iterations=6, log_every=3, validate_every=6,
        test_every=6, save_every=6,
        search_methods=("greedy", ("beam", 2)),
        decoder_learning_rate=1e-3)
    save_dir = str(tmp_path / "ckpts")
    log_dir = str(tmp_path / "logs")

    cwd = os.getcwd()
    os.chdir(str(tmp_path))  # predictions.txt lands here
    try:
        state = train(tc, debug=False, loss_only=False,
                      save_dir=save_dir, log_dir=log_dir)
    finally:
        os.chdir(cwd)

    assert int(state.step) == 6
    # checkpoint written
    step = ckpt.latest_step(save_dir)
    assert step == 6
    # metrics jsonl written
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))
    # predictions written by the test pass
    assert os.path.exists(str(tmp_path / "predictions.txt"))


def test_checkpoint_roundtrip_and_resume(fixture_root, tmp_path):
    tc = tiny_train_config(fixture_root, n_iterations=3)
    corpus = Corpus(tc)
    state, dcfg, rcfg = init_train_state(
        jax.random.PRNGKey(0), tc, corpus.vocab.n_vocabs)
    step_fn = build_train_step(tc, dcfg, rcfg)

    _, videos, captions = next(iter(corpus.train_batcher))
    rng = jax.random.PRNGKey(9)
    for _ in range(2):
        state, _ = step_fn(state, jnp.asarray(videos), jnp.asarray(captions),
                           rng)

    d = ckpt.save_checkpoint(str(tmp_path / "ck"), int(state.step), state,
                             tc, corpus.vocab)
    # fresh state, then restore
    state2, _, _ = init_train_state(
        jax.random.PRNGKey(1), tc, corpus.vocab.n_vocabs)
    restored, meta = ckpt.load_checkpoint(d, state2)
    assert meta["step"] == 2

    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # config + vocab round-trip
    tc2, vocab2 = ckpt.load_config_and_vocab(d)
    assert tc2.to_dict() == tc.to_dict()
    assert vocab2.word2idx == corpus.vocab.word2idx

    # one more step from restored state must be identical to continuing
    cont, m1 = step_fn(state, jnp.asarray(videos), jnp.asarray(captions), rng)
    resumed, m2 = step_fn(restored, jnp.asarray(videos),
                          jnp.asarray(captions), rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_structure_mismatch_rejected(fixture_root, tmp_path):
    tc = tiny_train_config(fixture_root)
    corpus = Corpus(tc)
    state, _, _ = init_train_state(jax.random.PRNGKey(0), tc,
                                   corpus.vocab.n_vocabs)
    d = ckpt.save_checkpoint(str(tmp_path / "ck2"), 0, state, tc, corpus.vocab)

    tc_other = tiny_train_config(fixture_root, use_recon=False)
    other, _, _ = init_train_state(jax.random.PRNGKey(0), tc_other,
                                   corpus.vocab.n_vocabs)
    with pytest.raises(ValueError):
        ckpt.load_checkpoint(d, other)


def test_evaluate_greedy_and_beam(fixture_root, tmp_path):
    tc = tiny_train_config(fixture_root)
    corpus = Corpus(tc)
    state, dcfg, _ = init_train_state(jax.random.PRNGKey(0), tc,
                                      corpus.vocab.n_vocabs)
    for sm in ("greedy", ("beam", 2)):
        scores = evaluate(tc, corpus, state.dec_params, dcfg, sm,
                          predictions_fpath=str(tmp_path / "pred.txt"),
                          n_test=2)
        assert set(tc.scores) <= set(scores.keys())
        for v in scores.values():
            assert np.isfinite(v)


@pytest.mark.slow
def test_train_loop_with_mesh(fixture_root, tmp_path):
    """use_mesh=True on the virtual 8-device CPU mesh end-to-end."""
    tc = tiny_train_config(
        fixture_root, batch_size=8, n_iterations=3, log_every=3,
        validate_every=100, test_every=100, save_every=100,
        mesh_shape=(("data", 4), ("model", 2)))
    state = train(tc, debug=False, loss_only=True, use_mesh=True,
                  save_dir=str(tmp_path / "c"), log_dir=str(tmp_path / "l"))
    assert int(state.step) == 3


@pytest.mark.slow
def test_checkpoint_retention(fixture_root, tmp_path):
    tc = tiny_train_config(fixture_root)
    corpus = Corpus(tc)
    state, _, _ = init_train_state(jax.random.PRNGKey(0), tc,
                                   corpus.vocab.n_vocabs)
    d = str(tmp_path / "ret")
    for step in (1, 2, 3, 4):
        ckpt.save_checkpoint(d, step, state, tc, corpus.vocab)
    ckpt.prune_old(d, keep_last_k=2)
    assert sorted(int(x) for x in os.listdir(d) if x.isdigit()) == [3, 4]
    assert ckpt.latest_step(d) == 4


@pytest.mark.slow
def test_train_loop_without_reconstructor(fixture_root, tmp_path):
    """README.md:77 config: wo. reconstructor, full loop incl. val + test."""
    tc = tiny_train_config(
        fixture_root, use_recon=False, n_iterations=4, log_every=2,
        validate_every=4, test_every=4, save_every=4,
        search_methods=("greedy",))
    cwd = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        state = train(tc, debug=False, loss_only=False,
                      save_dir=str(tmp_path / "c"),
                      log_dir=str(tmp_path / "l"))
    finally:
        os.chdir(cwd)
    assert int(state.step) == 4
    assert state.rec_params is None
    assert ckpt.latest_step(str(tmp_path / "c")) == 4


def test_orbax_backend_roundtrip(fixture_root, tmp_path):
    """backend='orbax' (sync and async) round-trips the TrainState exactly
    and loads through the same format-detecting load_checkpoint."""
    pytest.importorskip("orbax.checkpoint")
    tc = tiny_train_config(fixture_root, n_iterations=2)
    corpus = Corpus(tc)
    state, dcfg, rcfg = init_train_state(
        jax.random.PRNGKey(0), tc, corpus.vocab.n_vocabs)
    step_fn = build_train_step(tc, dcfg, rcfg)
    _, videos, captions = next(iter(corpus.train_batcher))
    state, _ = step_fn(state, jnp.asarray(videos), jnp.asarray(captions),
                       jax.random.PRNGKey(1))

    d = ckpt.save_checkpoint(str(tmp_path / "ck"), int(state.step), state,
                             tc, corpus.vocab, backend="orbax")
    example, _, _ = init_train_state(
        jax.random.PRNGKey(7), tc, corpus.vocab.n_vocabs)
    restored, meta = ckpt.load_checkpoint(d, example)
    assert meta["backend"] == "orbax"
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # async save: returns immediately, readable after the barrier
    d2 = ckpt.save_checkpoint(str(tmp_path / "ck2"), int(state.step), state,
                              tc, corpus.vocab, backend="orbax",
                              async_save=True)
    ckpt.wait_for_async_saves()
    restored2, _ = ckpt.load_checkpoint(d2, example)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_save_requires_orbax(fixture_root, tmp_path):
    tc = tiny_train_config(fixture_root)
    corpus = Corpus(tc)
    state, _, _ = init_train_state(jax.random.PRNGKey(0), tc,
                                   corpus.vocab.n_vocabs)
    with pytest.raises(ValueError, match="async_save"):
        ckpt.save_checkpoint(str(tmp_path / "ck"), 1, state, tc,
                             corpus.vocab, backend="npz", async_save=True)


@pytest.mark.slow
def test_nan_failure_detection_saves_emergency_checkpoint(fixture_root,
                                                          tmp_path):
    """Non-finite loss aborts training with an emergency checkpoint
    (failure-detection aux capability, SURVEY §5 — the reference crashes or
    trains through NaNs silently)."""
    tc = tiny_train_config(fixture_root, n_iterations=4,
                           log_every=1, validate_every=100, test_every=100,
                           save_every=100,
                           decoder_learning_rate=1e38)  # guaranteed blow-up
    save_dir = str(tmp_path / "ck")
    with pytest.raises(FloatingPointError, match="non-finite"):
        train(tc, loss_only=True, save_dir=save_dir,
              log_dir=str(tmp_path / "logs"))
    step = ckpt.latest_step(save_dir)
    assert step is not None
    import json
    with open(os.path.join(save_dir, str(step), "meta.json")) as f:
        meta = json.load(f)
    assert meta.get("emergency") is True


@pytest.mark.slow
def test_profile_dir_writes_trace(fixture_root, tmp_path):
    """--profile_dir captures a jax.profiler trace over the configured
    iteration window (tracing aux capability, SURVEY §5)."""
    import glob
    tc = tiny_train_config(fixture_root, n_iterations=6,
                           log_every=100, validate_every=100, test_every=100,
                           save_every=100)
    prof = str(tmp_path / "trace")
    train(tc, loss_only=True, profile_dir=prof,
          profile_window=(2, 4),
          save_dir=str(tmp_path / "ck"), log_dir=str(tmp_path / "logs"))
    assert glob.glob(os.path.join(prof, "**", "*.xplane.pb"),
                     recursive=True), "no xplane trace written"


@pytest.mark.slow
def test_train_loop_multi_step_dispatch_matches_k1(fixture_root, tmp_path):
    """steps_per_dispatch=2: the scanned-dispatch loop must produce the
    same final parameters as the step-per-dispatch loop (same seed, same
    batch stream), with cadences firing on dispatch boundaries."""
    common = dict(n_iterations=4, log_every=2, validate_every=4,
                  test_every=4, save_every=4,
                  decoder_learning_rate=1e-3)
    tc1 = tiny_train_config(fixture_root, **common)
    tc2 = tiny_train_config(fixture_root, steps_per_dispatch=2, **common)

    s1 = train(tc1, loss_only=True, save_dir=str(tmp_path / "c1"),
               log_dir=str(tmp_path / "l1"))
    s2 = train(tc2, loss_only=True, save_dir=str(tmp_path / "c2"),
               log_dir=str(tmp_path / "l2"))
    assert int(s1.step) == int(s2.step) == 4
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(s1.dec_params)[0],
            jax.tree_util.tree_flatten_with_path(s2.dec_params)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(p))
    # both wrote a final checkpoint at step 4
    assert ckpt.latest_step(str(tmp_path / "c1")) == 4
    assert ckpt.latest_step(str(tmp_path / "c2")) == 4


@pytest.mark.slow
def test_train_loop_multi_step_on_mesh(fixture_root, tmp_path):
    """steps_per_dispatch=2 with use_mesh: the stacked (k,) leading axis
    shifts the batch-sharded dim right by one — the loop must shard
    videos on axis 1 and captions on axis 2."""
    tc = tiny_train_config(
        fixture_root, batch_size=8, n_iterations=4, log_every=2,
        validate_every=4, test_every=4, save_every=4,
        steps_per_dispatch=2, mesh_shape=(("data", 4), ("model", 2)))
    state = train(tc, debug=False, loss_only=True, use_mesh=True,
                  save_dir=str(tmp_path / "c"), log_dir=str(tmp_path / "l"))
    assert int(state.step) == 4
