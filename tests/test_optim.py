"""torch_adam vs torch.optim.Adam parity (coupled weight decay, amsgrad),
plus gradient clipping vs torch.nn.utils.clip_grad_norm_."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from recnet_tpu.training.optim import torch_adam, clip_by_global_norm


@pytest.mark.parametrize("amsgrad", [False, True])
@pytest.mark.parametrize("weight_decay", [0.0, 1e-2])
def test_torch_adam_parity(amsgrad, weight_decay, rng):
    """Run 20 steps on a quadratic; trajectories must match torch exactly."""
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    target = rng.standard_normal((4, 3)).astype(np.float32)
    lr = 1e-2

    # torch side
    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([pt], lr=lr, weight_decay=weight_decay,
                           amsgrad=amsgrad)
    for _ in range(20):
        opt.zero_grad()
        loss = ((pt - torch.from_numpy(target)) ** 2).sum()
        loss.backward()
        opt.step()

    # jax side
    tx = torch_adam(lr, weight_decay, amsgrad=amsgrad)
    params = {"p": jnp.asarray(p0)}
    state = tx.init(params)

    def loss_fn(params):
        return jnp.sum(jnp.square(params["p"] - jnp.asarray(target)))

    for _ in range(20):
        g = jax.grad(loss_fn)(params)
        updates, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["p"]), pt.detach().numpy(),
                               rtol=1e-5, atol=1e-5)


def test_clip_by_global_norm_matches_torch(rng):
    grads = {"a": jnp.asarray(rng.standard_normal((5, 5)).astype(np.float32) * 10),
             "b": jnp.asarray(rng.standard_normal((3,)).astype(np.float32) * 10)}
    max_norm = 1.5

    ta = torch.from_numpy(np.asarray(grads["a"]).copy())
    tb = torch.from_numpy(np.asarray(grads["b"]).copy())
    pa = torch.nn.Parameter(torch.zeros(5, 5)); pa.grad = ta
    pb = torch.nn.Parameter(torch.zeros(3)); pb.grad = tb
    torch.nn.utils.clip_grad_norm_([pa, pb], max_norm)

    clipped, gnorm = clip_by_global_norm(grads, max_norm)
    np.testing.assert_allclose(np.asarray(clipped["a"]), pa.grad.numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(clipped["b"]), pb.grad.numpy(),
                               rtol=1e-5, atol=1e-7)


def test_clip_noop_below_threshold():
    grads = {"a": jnp.ones((2, 2)) * 0.1}
    clipped, gnorm = clip_by_global_norm(grads, 50.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]),
                               np.asarray(grads["a"]))


@pytest.mark.parametrize("wd,amsgrad", [(1e-5, True), (1e-5, False),
                                        (0.0, True), (0.0, False)])
def test_fused_adam_matches_legacy_chain_bitwise(wd, amsgrad):
    """The round-3 fused torch_adam must (a) keep the optimizer-state
    pytree TREEDEF of the legacy add_decayed_weights -> scale_by ->
    scale chain (checkpoint.load_checkpoint fingerprints the treedef, so
    old checkpoints must restore), and (b) produce bit-identical
    parameter trajectories."""
    import optax
    from recnet_tpu.training.optim import scale_by_torch_adam, torch_adam

    params = {"w": jnp.asarray(
        np.random.default_rng(0).standard_normal(257).astype(np.float32))}
    legacy = optax.chain(*(
        ([optax.add_decayed_weights(wd)] if wd else [])
        + [scale_by_torch_adam(amsgrad=amsgrad), optax.scale(-1e-3)]))
    fused = torch_adam(1e-3, wd, amsgrad=amsgrad)

    s_l, s_f = legacy.init(params), fused.init(params)
    assert (jax.tree_util.tree_structure(s_l)
            == jax.tree_util.tree_structure(s_f))

    rng = np.random.default_rng(1)
    p_l = p_f = params
    for _ in range(10):
        g = {"w": jnp.asarray(rng.standard_normal(257).astype(np.float32))}
        u_l, s_l = legacy.update(g, s_l, p_l)
        u_f, s_f = fused.update(g, s_f, p_f)
        p_l = optax.apply_updates(p_l, u_l)
        p_f = optax.apply_updates(p_f, u_f)
        np.testing.assert_array_equal(np.asarray(p_l["w"]),
                                      np.asarray(p_f["w"]))
