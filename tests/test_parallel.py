"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    img, aux = jax.jit(fn)(*args)
    img = np.asarray(img)
    assert img.shape == (32, 32, 4)
    assert np.isfinite(img).all()


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(n):
    import __graft_entry__ as ge
    ge.dryrun_multichip(n)


def test_sharded_training_matches_single_device():
    """Gradient math must be sharding-invariant."""
    import jax.numpy as jnp
    from rt_octree_tpu.models.guidance_net import (
        GuidanceNetConfig, GuidanceNet, init_params)
    from rt_octree_tpu.parallel.mesh import make_mesh, make_sharded_train_step
    from rt_octree_tpu.ops.filtering import guided_filter_batch
    from rt_octree_tpu.train.metrics import smape_loss
    import optax

    cfg = GuidanceNetConfig(in_channels=8, mid_channels=8, num_layers=2,
                            num_branches=2, kernel_levels=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, H, W = 4, 16, 16
    aux = jnp.asarray(rng.random((B, 8, H, W)), jnp.float32)
    img_in = jnp.asarray(rng.random((B, H, W, 4)), jnp.float32)
    img_gt = jnp.asarray(rng.random((B, H, W, 4)), jnp.float32)

    mesh = make_mesh(4)
    step, optimizer = make_sharded_train_step(mesh, cfg)
    opt_state = optimizer.init(params)
    _, _, loss_sharded = step(params, opt_state, aux, img_in, img_gt)

    model = GuidanceNet(cfg)

    def loss_of(p):
        nhwc = jnp.moveaxis(aux, 1, -1)
        w, g = model.apply({"params": p}, nhwc)
        out = guided_filter_batch(w, g, img_in)
        return smape_loss(out[..., :3], img_gt[..., :3])

    loss_single = loss_of(params)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=2e-5)
