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


def test_sharded_frame_renderer_matches_single():
    import jax.numpy as jnp
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import synthetic
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.parallel.mesh import make_mesh, make_sharded_frame_renderer
    from rt_octree_tpu.render.renderer import FrozenOptions, Renderer
    from rt_octree_tpu.utils.rng import Pcg32

    tree = synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4)
    dt = upload_tree(tree, lut_levels=0, brick=False)
    cam = Camera(width=16, height=16, fx=30.0, fy=30.0)
    opt = RenderOptions(spp=2, denoise=False)
    mesh = make_mesh(8)
    frame = make_sharded_frame_renderer(
        mesh, dt, 16, 16, 30.0, 30.0, FrozenOptions.from_options(opt),
        max_steps=256)
    rng = Pcg32(20230418)
    img, aux = frame(jnp.asarray(cam.transform),
                     jnp.uint32(rng.state >> 32),
                     jnp.uint32(rng.state & 0xFFFFFFFF))
    r = Renderer(dt, 16, 16, 30.0, 30.0, options=opt, n_chunks=1)
    img1, aux1 = r.render(cam.transform)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux), np.asarray(aux1), atol=4e-5)


def test_sharded_frame_denoise_brick_matches_single():
    """The flagship multi-chip pipeline: brick-march shards + the fused
    spatially-sharded GuidanceNet denoiser in ONE jit (the reference's
    single-stream render->denoise frame, cuda_renderer.cpp:96-156), vs
    the single-device renderer."""
    import jax.numpy as jnp
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import synthetic
    from rt_octree_tpu.models.guidance_net import (
        GuidanceNetConfig, compact_params, init_params)
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.parallel.mesh import (
        make_mesh, make_sharded_frame_renderer)
    from rt_octree_tpu.render.renderer import FrozenOptions, Renderer
    from rt_octree_tpu.utils.rng import Pcg32

    tree = synthetic.make_synthetic_tree("shell", depth=4, basis_dim=4)
    dt = upload_tree(tree, lut_levels=4)  # full depth => bricks live
    assert dt.brick_levels > 0
    cfg = GuidanceNetConfig(in_channels=8, mid_channels=8, num_layers=2,
                            num_branches=2, kernel_levels=2)
    params = compact_params(cfg, init_params(cfg, jax.random.PRNGKey(0)))
    cam = Camera(width=16, height=16, fx=30.0, fy=30.0)
    opt = RenderOptions(spp=2, denoise=True)
    # schedule with a compaction into a brick stage, exercised per shard
    schedule = ((2, 1.0, "thin"), (0, 2.0, "brick"))
    mesh = make_mesh(8)
    frame = make_sharded_frame_renderer(
        mesh, dt, 16, 16, 30.0, 30.0, FrozenOptions.from_options(opt),
        max_steps=256, schedule=schedule, net_cfg=cfg, net_params=params)
    rng = Pcg32(20230418)
    img, aux = frame(jnp.asarray(cam.transform),
                     jnp.uint32(rng.state >> 32),
                     jnp.uint32(rng.state & 0xFFFFFFFF))
    r = Renderer(dt, 16, 16, 30.0, 30.0, options=opt, n_chunks=1,
                 schedule=schedule, max_steps=256)
    r.set_denoiser(cfg, params)
    img1, aux1 = r.render(cam.transform)
    np.testing.assert_allclose(np.asarray(aux), np.asarray(aux1),
                               atol=4e-5)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img1),
                               atol=2e-4)


def test_sharded_fast_mode_matches_single():
    """Fast mode (render_scale<1: inner-res march + joint upsample
    through the fused denoise) must be sharding-invariant: the
    multi-chip renderer at scale 0.5 matches the single-device fast
    path bit-near.  The inner 16x16 ray grid shards 8 ways."""
    import jax.numpy as jnp
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import synthetic
    from rt_octree_tpu.models.guidance_net import (
        GuidanceNetConfig, compact_params, init_params)
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.parallel.mesh import (
        make_mesh, make_sharded_frame_renderer)
    from rt_octree_tpu.render.renderer import FrozenOptions, Renderer
    from rt_octree_tpu.utils.rng import Pcg32

    tree = synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4)
    dt = upload_tree(tree, lut_levels=0, brick=False)
    cfg = GuidanceNetConfig(in_channels=8, mid_channels=8, num_layers=2,
                            num_branches=2, kernel_levels=2)
    params = compact_params(cfg, init_params(cfg, jax.random.PRNGKey(0)))
    cam = Camera(width=32, height=32, fx=60.0, fy=60.0)
    opt = RenderOptions(spp=2, denoise=True)
    mesh = make_mesh(8)
    frame = make_sharded_frame_renderer(
        mesh, dt, 32, 32, 60.0, 60.0, FrozenOptions.from_options(opt),
        max_steps=256, net_cfg=cfg, net_params=params, render_scale=0.5)
    rng = Pcg32(20230418)
    img, aux = frame(jnp.asarray(cam.transform),
                     jnp.uint32(rng.state >> 32),
                     jnp.uint32(rng.state & 0xFFFFFFFF))
    r = Renderer(dt, 32, 32, 60.0, 60.0, options=opt, n_chunks=1,
                 max_steps=256, render_scale=0.5)
    r.set_denoiser(cfg, params)
    img1, aux1 = r.render(cam.transform)
    assert np.asarray(img).shape == (32, 32, 4)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img1),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(aux), np.asarray(aux1),
                               atol=4e-5)
