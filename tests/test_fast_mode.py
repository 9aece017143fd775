"""Fast mode (sub-resolution march + joint-upsampled fused denoise).

Additive mode with no reference counterpart (the CUDA renderer always
traces one ray per output pixel, volrend.cu render_kernel); motivated by
the round-4 roofline: the canonical frame is gather-row bound, so the
measured speed knob at full output size is fewer rays.  These tests pin
the mode's semantics: scale=1 is the identity configuration, and a
scaled frame equals the manually-composed (inner render -> bilinear
upsample -> denoise) pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rt_octree_tpu.core.camera import Camera
from rt_octree_tpu.core.options import RenderOptions
from rt_octree_tpu.io import synthetic
from rt_octree_tpu.ops.traversal import upload_tree
from rt_octree_tpu.render.renderer import Renderer


@pytest.fixture(scope="module")
def dtree():
    tree = synthetic.make_synthetic_tree("shell", depth=4, basis_dim=1)
    return upload_tree(tree, lut_levels=3)


def _mk(dtree, scale, denoise=False, **kw):
    cam = Camera(width=24, height=16)
    opt = RenderOptions(spp=2, denoise=denoise)
    r = Renderer(dtree, cam.width, cam.height, cam.fx, cam.fy,
                 options=opt, render_scale=scale, **kw)
    return r, cam


def test_scale_one_is_identity_config(dtree):
    r, _ = _mk(dtree, 1.0)
    assert (r.inner_width, r.inner_height) == (r.width, r.height)


def test_bad_scale_rejected(dtree):
    cam = Camera(width=24, height=16)
    for s in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            Renderer(dtree, cam.width, cam.height, cam.fx, cam.fy,
                     render_scale=s)


def test_fast_equals_composed_pipeline(dtree):
    """scale=0.5 frame == render at half res (scaled focal), bilinear
    upsample -- bit-exact, same RNG protocol."""
    r, cam = _mk(dtree, 0.5)
    img, aux = r.render(cam.transform)
    assert img.shape == (16, 24, 4)
    assert aux.shape == (8, 16, 24)

    inner, _ = _mk(dtree, 1.0)
    inner_cam = Camera(width=12, height=8, fx=cam.fx * 0.5,
                       fy=cam.fy * 0.5)
    ri = Renderer(dtree, 12, 8, inner_cam.fx, inner_cam.fy,
                  options=RenderOptions(spp=2, denoise=False))
    img_i, _ = ri.render(inner_cam.transform)
    want = jax.image.resize(img_i, (16, 24, 4), "bilinear")
    np.testing.assert_allclose(np.asarray(img), np.asarray(want),
                               atol=1e-6)


def test_fast_mode_rng_advances_like_canonical(dtree):
    """Two frames differ (per-frame RNG advance is live) and a fresh
    renderer reproduces frame 1 exactly (protocol determinism)."""
    r, cam = _mk(dtree, 0.5)
    f1, _ = r.render(cam.transform)
    r.advance_rng()
    f2, _ = r.render(cam.transform)
    assert float(jnp.abs(f1 - f2).max()) > 0
    r2, _ = _mk(dtree, 0.5)
    g1, _ = r2.render(cam.transform)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(g1))


def test_fast_mode_denoise_runs_full_res(dtree):
    """With a denoiser attached, the fused fast frame still returns the
    full output resolution and finite values."""
    from rt_octree_tpu.models.guidance_net import (GuidanceNetCompact,
                                                   GuidanceNetConfig)
    cfg = GuidanceNetConfig(in_channels=8, mid_channels=4, num_layers=1,
                            num_branches=2, kernel_levels=2)
    params = GuidanceNetCompact(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 24, 8)))["params"]
    r, cam = _mk(dtree, 0.5, denoise=True)
    r.set_denoiser(cfg, params)
    img, _ = r.render(cam.transform)
    assert img.shape == (16, 24, 4)
    assert bool(jnp.isfinite(img).all())


def test_fast_mode_split_phase_matches_fused(dtree):
    """render_timed under fast mode produces the same image as the
    fused path (same upsample + denoise semantics)."""
    from rt_octree_tpu.render.renderer import render_timed
    from rt_octree_tpu.utils.timer import PhaseTimer
    from rt_octree_tpu.models.guidance_net import (GuidanceNetCompact,
                                                   GuidanceNetConfig)
    cfg = GuidanceNetConfig(in_channels=8, mid_channels=4, num_layers=1,
                            num_branches=2, kernel_levels=2)
    params = GuidanceNetCompact(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 24, 8)))["params"]
    r, cam = _mk(dtree, 0.5, denoise=True)
    r.set_denoiser(cfg, params)
    fused, _ = r.render(cam.transform)
    r2, _ = _mk(dtree, 0.5, denoise=True)
    r2.set_denoiser(cfg, params)
    split, _ = render_timed(r2, cam.transform, PhaseTimer())
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split),
                               atol=2e-5)


def test_lod_composes_with_fast_mode(dtree):
    """The bench's llff_interactive rung composes BOTH row-count levers:
    a depth-capped LOD tree marched at a sub-resolution with the fused
    denoise upsampling to the output size.  Pin the composition: finite
    output at the full output shape, and the LOD tree really is capped."""
    from rt_octree_tpu.io import synthetic as syn
    from rt_octree_tpu.io.lod import build_lod
    from rt_octree_tpu.models.guidance_net import (
        GuidanceNetConfig, compact_params, init_params)

    tree = syn.make_synthetic_tree("shell", depth=4, basis_dim=1)
    tl = build_lod(tree, 3)
    assert tl.max_depth <= 3
    dtl = upload_tree(tl, lut_levels=3)
    r, cam = _mk(dtl, 0.5, denoise=True)
    cfg = GuidanceNetConfig(in_channels=8, mid_channels=8, num_layers=2,
                            num_branches=2, kernel_levels=2,
                            identity_level=True)
    r.set_denoiser(cfg, compact_params(cfg, init_params(
        cfg, jax.random.PRNGKey(0))))
    img, aux = r.render(cam.transform)
    assert img.shape == (16, 24, 4)
    assert aux.shape == (8, 16, 24)
    assert np.isfinite(np.asarray(img)).all()
