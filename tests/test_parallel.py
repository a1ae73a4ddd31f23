"""Mesh sharding tests on the 8-virtual-device CPU platform:
data-parallel and dp×tp training steps compile, run, and match the
single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from recnet_tpu.config import TrainConfig
from recnet_tpu.parallel import mesh as mesh_lib
from recnet_tpu.training.step import init_train_state, build_train_step


def _tiny_tc(**overrides):
    kw = dict(
        caption_max_len=6, batch_size=8, embedding_size=8,
        encoder_output_size=16, encoder_output_len=4,
        decoder_hidden_size=8, decoder_attn_size=4,
        reconstructor_hidden_size=16, reconstructor_attn_size=4,
        use_recon=True, reconstructor_type="global",
        decoder_learning_rate=1e-3,
    )
    kw.update(overrides)
    return TrainConfig(**kw)


def _batch(rng, tc, V):
    T = tc.caption_max_len + 1
    videos = rng.standard_normal(
        (tc.batch_size, tc.encoder_output_len, tc.encoder_output_size)
    ).astype(np.float32)
    targets = np.zeros((T, tc.batch_size), np.int32)
    for b in range(tc.batch_size):
        L = int(rng.integers(2, T))
        targets[: L - 1, b] = rng.integers(3, V, L - 1)
        targets[L - 1, b] = 2
    return videos, targets


def test_eight_devices_available():
    assert jax.device_count() == 8


@pytest.mark.parametrize("mesh_shape", [
    (("data", 8),),
    pytest.param((("data", 4), ("model", 2)), marks=pytest.mark.slow),
    pytest.param((("data", 2), ("model", 4)), marks=pytest.mark.slow),
])
def test_sharded_step_matches_single_device(mesh_shape, rng):
    tc = _tiny_tc(mesh_shape=mesh_shape)
    V = 32
    state, dcfg, rcfg = init_train_state(jax.random.PRNGKey(0), tc, V)
    step = build_train_step(tc, dcfg, rcfg)
    videos, captions = _batch(rng, tc, V)
    key = jax.random.PRNGKey(5)

    # single-device run
    s1, m1 = step(state, jnp.asarray(videos), jnp.asarray(captions), key)
    s1, m1b = step(s1, jnp.asarray(videos), jnp.asarray(captions), key)

    # sharded run
    state2, _, _ = init_train_state(jax.random.PRNGKey(0), tc, V)
    mesh = mesh_lib.make_mesh(mesh_shape)
    state2 = mesh_lib.shard_state(state2, mesh)
    vs = jax.device_put(jnp.asarray(videos), mesh_lib.batch_sharding(mesh, 0))
    cs = jax.device_put(jnp.asarray(captions), mesh_lib.batch_sharding(mesh, 1))
    s2, m2 = step(state2, vs, cs, key)
    s2, m2b = step(s2, vs, cs, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1b["loss"]), float(m2b["loss"]),
                               rtol=1e-5)
    # params equal after 2 steps
    for a, b in zip(jax.tree_util.tree_leaves(s1.dec_params),
                    jax.tree_util.tree_leaves(s2.dec_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_tp_rules_shard_vocab_matrices():
    tc = _tiny_tc(mesh_shape=(("data", 2), ("model", 4)))
    V = 32
    state, _, _ = init_train_state(jax.random.PRNGKey(0), tc, V)
    mesh = mesh_lib.make_mesh(tc.mesh_shape)
    shardings = mesh_lib.state_shardings(state, mesh)
    assert shardings.dec_params["out_w"].spec == P(None, "model")
    assert shardings.dec_params["embedding"].spec == P("model", None)
    assert shardings.dec_params["out_b"].spec == P("model")
    # RNN weights replicated
    assert shardings.dec_params["rnn"][0]["w_ih"].spec == P()
    # optimizer moments follow the same rules (moment trees mirror params)
    opt_specs = [s.spec for s in jax.tree_util.tree_leaves(
        shardings.dec_opt, is_leaf=lambda x: hasattr(x, "spec"))]
    assert P(None, "model") in opt_specs
    assert P("model", None) in opt_specs


def test_dp_batch_actually_distributed(rng):
    tc = _tiny_tc(mesh_shape=(("data", 8),))
    mesh = mesh_lib.make_mesh(tc.mesh_shape)
    videos, _ = _batch(rng, tc, 32)
    vs = jax.device_put(jnp.asarray(videos), mesh_lib.batch_sharding(mesh, 0))
    assert len(vs.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in vs.addressable_shards}
    assert shard_shapes == {(1, tc.encoder_output_len, tc.encoder_output_size)}


@pytest.mark.slow
def test_cached_loop_on_mesh_matches_single_device(tmp_path):
    """The device-feature-cache training path (replicated cache + batch-
    sharded row indices) over a dp x tp mesh equals the unsharded cached
    run bit-for-bit."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from fixtures import make_msvd_fixture, tiny_train_config
    from recnet_tpu.training.loop import train

    make_msvd_fixture(str(tmp_path), feat_dim=32)
    base = dict(use_recon=True, reconstructor_type="global",
                device_feature_cache=True, n_iterations=4, log_every=2,
                validate_every=100, test_every=100, save_every=100,
                mesh_shape=(("data", 4), ("model", 2)))
    tc = tiny_train_config(str(tmp_path), **base)
    state_single = train(tc, loss_only=True,
                         log_dir=str(tmp_path / "log_s"),
                         save_dir=str(tmp_path / "ck_s"))
    state_mesh = train(tc, loss_only=True, use_mesh=True,
                       log_dir=str(tmp_path / "log_m"),
                       save_dir=str(tmp_path / "ck_m"))
    # sharded reductions reorder float sums — rounding-level tolerance,
    # same contract as test_sharded_step_matches_single_device
    for a, b in zip(jax.tree_util.tree_leaves(state_single.dec_params),
                    jax.tree_util.tree_leaves(state_mesh.dec_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
