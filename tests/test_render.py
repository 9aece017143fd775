"""Whole-image golden tests: XLA renderer vs the NumPy oracle.

Both sides consume the identical PCG32 stream, so images must agree to
float-reassociation tolerance (the oracle accumulates sequentially, XLA
may reorder reductions).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_octree_tpu.core.camera import Camera
from rt_octree_tpu.core.options import RenderOptions
from rt_octree_tpu.core.oracle import render_frame_oracle
from rt_octree_tpu.io import synthetic
from rt_octree_tpu.ops.traversal import upload_tree
from rt_octree_tpu.render.renderer import Renderer
from rt_octree_tpu.utils.rng import Pcg32


@pytest.fixture(scope="module")
def tree():
    return synthetic.make_synthetic_tree("shell", depth=4, basis_dim=4)


def make_camera(w=24, h=24):
    cam = Camera(width=w, height=h, fx=40.0, fy=40.0)
    # default pose looks at origin from (-3.55, 0, 3.55)
    return cam


@pytest.mark.parametrize("spp,lut_levels", [(2, 0), (6, 3)])
def test_render_matches_oracle(tree, spp, lut_levels):
    cam = make_camera()
    opt = RenderOptions(spp=spp, denoise=False, background_brightness=1.0)
    dt = upload_tree(tree, lut_levels=lut_levels)

    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt,
                 n_chunks=2)
    img, aux = r.render(cam.transform)
    img, aux = np.asarray(img), np.asarray(aux)

    rng = Pcg32(20230418)
    img_ref, aux_ref = render_frame_oracle(tree, cam, opt, rng)

    np.testing.assert_allclose(img, img_ref, atol=2e-5,
                               err_msg="image mismatch vs oracle")
    np.testing.assert_allclose(aux, aux_ref, atol=4e-5)
    # scene must actually be visible (not all background)
    assert aux[3].max() > 0.5


def test_frame_rng_advance_changes_noise(tree):
    cam = make_camera()
    opt = RenderOptions(spp=1, denoise=False)
    dt = upload_tree(tree, lut_levels=0)
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt)
    img1, _ = r.render(cam.transform)
    r.advance_rng()
    img2, _ = r.render(cam.transform)
    img1, img2 = np.asarray(img1), np.asarray(img2)
    assert not np.array_equal(img1, img2)

    # and the second frame matches the oracle at the advanced state
    rng = Pcg32(20230418)
    rng.advance()
    img2_ref, _ = render_frame_oracle(tree, cam, opt, rng)
    np.testing.assert_allclose(img2, img2_ref, atol=2e-5)


def test_empty_ray_is_background(tree):
    cam = make_camera(8, 8)
    opt = RenderOptions(spp=2, denoise=False, background_brightness=0.25)
    dt = upload_tree(tree)
    # camera looking away from the scene
    cam.v_back = np.array([0.7071068, 0.0, -0.7071068], np.float32)
    cam.update()
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt)
    img, aux = r.render(cam.transform)
    np.testing.assert_allclose(np.asarray(aux)[3], 0.0)
    np.testing.assert_allclose(np.asarray(img)[..., :3], 0.25)


def test_render_with_denoiser(tree):
    """Fused render+denoise: filtered output, aux stays noisy."""
    import jax
    from rt_octree_tpu.models.guidance_net import (
        GuidanceNetConfig, init_params, compact_params)
    cam = make_camera(16, 16)
    opt = RenderOptions(spp=2, denoise=True)
    dt = upload_tree(tree)
    cfg = GuidanceNetConfig(mid_channels=8, num_layers=2, num_branches=2,
                            kernel_levels=2)
    params = compact_params(cfg, init_params(cfg, jax.random.PRNGKey(0)))
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt)
    r.set_denoiser(cfg, params)
    img, aux = r.render(cam.transform)
    img, aux = np.asarray(img), np.asarray(aux)
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img[..., 3], 1.0)
    # aux carries the *noisy* image, not the filtered one
    assert not np.allclose(img[..., 0], aux[0])
    # want_aux=False elides only the [8,H,W] copy: identical image,
    # aux None, and the denoiser still ran on the full 8-ch statistics
    r.rng.seed(20230418, 1)
    img2, aux2 = r.render(cam.transform, want_aux=False)
    assert aux2 is None
    np.testing.assert_allclose(np.asarray(img2), img, atol=1e-6)
    # NHWC aux layout is the same data as CHW
    from rt_octree_tpu.render.renderer import (_render_noisy, FrozenOptions)
    fopt = FrozenOptions.from_options(RenderOptions(spp=2, denoise=False))
    kw = dict(width=cam.width, height=cam.height, fx=cam.fx, fy=cam.fy,
              opt=fopt, n_chunks=1, max_steps=512, inc=1)
    _, aux_chw = _render_noisy(dt, jnp.asarray(cam.transform),
                               jnp.uint32(0), jnp.uint32(1), **kw)
    _, aux_nhwc = _render_noisy(dt, jnp.asarray(cam.transform),
                                jnp.uint32(0), jnp.uint32(1),
                                aux_layout="nhwc", **kw)
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(aux_chw), 0, -1), np.asarray(aux_nhwc))


@pytest.mark.parametrize("compact_frac,phase1", [(4, 4), (256, 2)])
def test_compaction_paths_match_oracle(tree, compact_frac, phase1):
    """Exactness through compaction and through the overflow fallback
    (compact_frac=256 forces a tiny cap -> full-width fallback)."""
    cam = make_camera(16, 16)
    opt = RenderOptions(spp=2, denoise=False)
    dt = upload_tree(tree, lut_levels=3)
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt,
                 n_chunks=1, phase1_steps=phase1, compact_frac=compact_frac)
    img, aux = r.render(cam.transform)
    rng = Pcg32(20230418)
    img_ref, aux_ref = render_frame_oracle(tree, cam, opt, rng)
    np.testing.assert_allclose(np.asarray(img), img_ref, atol=2e-5)


def test_spp32_unpacked_records_match_oracle(tree):
    """spp=32 exceeds the 5-bit packed-record count budget, forcing the
    unpacked [R, 2*spp] recording state (renderer._recs_write /
    _march_body_brick fallback branches); both march bodies and the
    compaction bundle must stay oracle-exact in that representation."""
    from rt_octree_tpu.render import renderer as RR
    cam = make_camera(12, 12)
    opt = RenderOptions(spp=32, denoise=False, background_brightness=1.0)
    dt = upload_tree(tree, lut_levels=3)
    assert not RR._recs_packed(dt, 32)
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt,
                 n_chunks=1)
    img, aux = r.render(cam.transform)
    rng = Pcg32(20230418)
    img_ref, aux_ref = render_frame_oracle(tree, cam, opt, rng)
    np.testing.assert_allclose(np.asarray(img), img_ref, atol=4e-5)


def test_ndc_render_matches_oracle(tree):
    """LLFF NDC warp end-to-end vs oracle."""
    tree2 = synthetic.make_synthetic_tree("shell", depth=4, basis_dim=4)
    tree2.use_ndc = True
    tree2.ndc_width = 1008.0
    tree2.ndc_height = 756.0
    tree2.ndc_focal = 800.0
    cam = Camera(width=16, height=16, fx=60.0, fy=60.0)
    # forward-facing pose looking down -z from near origin
    cam.center = np.array([0.02, 0.01, 0.3], np.float32)
    cam.v_back = np.array([0.0, 0.0, 1.0], np.float32)
    cam.v_world_up = np.array([0.0, 1.0, 0.0], np.float32)
    cam.update()
    opt = RenderOptions(spp=2, denoise=False)
    dt = upload_tree(tree2, lut_levels=3)
    assert dt.ndc is not None
    r = Renderer(dt, 16, 16, cam.fx, cam.fy, options=opt, n_chunks=1)
    img, _ = r.render(cam.transform)
    rng = Pcg32(20230418)
    img_ref, _ = render_frame_oracle(tree2, cam, opt, rng)
    np.testing.assert_allclose(np.asarray(img), img_ref, atol=3e-5)


def test_rgba_format_tree():
    """RGBA trees (basis_dim < 0) skip basis evaluation."""
    from rt_octree_tpu.io.n3tree import BasisFormat, DataFormat
    tree2 = synthetic.make_synthetic_tree("shell", depth=4, basis_dim=1)
    # reinterpret as RGBA: data_dim stays 4 = [r, g, b, sigma]
    tree2.data_format = DataFormat(BasisFormat.RGBA, -1)
    cam = make_camera(12, 12)
    opt = RenderOptions(spp=2, denoise=False)
    dt = upload_tree(tree2, lut_levels=0)
    assert dt.basis_dim == -1
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt,
                 n_chunks=1)
    img, _ = r.render(cam.transform)
    rng = Pcg32(20230418)
    img_ref, _ = render_frame_oracle(tree2, cam, opt, rng)
    np.testing.assert_allclose(np.asarray(img), img_ref, atol=2e-5)


def test_sg_basis_parity(np_rng):
    import jax.numpy as jnp
    from rt_octree_tpu.core.sh_np import eval_sg_basis_np, eval_asg_basis_np
    from rt_octree_tpu.ops.sh import eval_sg_basis, eval_asg_basis
    dirs = np_rng.standard_normal((32, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    extra_sg = np_rng.standard_normal(4 * 4).astype(np.float32)
    got = np.asarray(eval_sg_basis(4, jnp.asarray(extra_sg),
                                   jnp.asarray(dirs)))
    ref = eval_sg_basis_np(4, extra_sg, dirs)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    extra_asg = np_rng.standard_normal(11 * 2).astype(np.float32)
    got = np.asarray(eval_asg_basis(2, jnp.asarray(extra_asg),
                                    jnp.asarray(dirs)))
    ref = eval_asg_basis_np(2, extra_asg, dirs)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_sh_basis_max_degree(np_rng):
    import jax.numpy as jnp
    from rt_octree_tpu.core.sh_np import eval_sh_basis_np
    from rt_octree_tpu.ops.sh import eval_sh_basis
    dirs = np_rng.standard_normal((16, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for bd in (1, 4, 9, 16, 25):
        got = np.asarray(eval_sh_basis(bd, jnp.asarray(dirs)))
        np.testing.assert_allclose(got, eval_sh_basis_np(bd, dirs),
                                   atol=1e-5)


def test_render_timed_phases(tree):
    from rt_octree_tpu.render.renderer import render_timed
    from rt_octree_tpu.utils.timer import PhaseTimer
    import jax
    from rt_octree_tpu.models.guidance_net import (
        GuidanceNetConfig, init_params, compact_params)
    cam = make_camera(16, 16)
    dt = upload_tree(tree)
    r = Renderer(dt, 16, 16, cam.fx, cam.fy,
                 options=RenderOptions(spp=2, denoise=True))
    cfg = GuidanceNetConfig(mid_channels=8, num_layers=2, num_branches=2,
                            kernel_levels=2)
    r.set_denoiser(cfg, compact_params(cfg, init_params(
        cfg, jax.random.PRNGKey(0))))
    timer = PhaseTimer()
    img, aux = render_timed(r, cam.transform, timer)
    assert timer.cnt == 1
    assert all(s > 0 for s in timer.sum)  # all three phases ran
    report = timer.report()
    assert "render" in report and "FPS" in report
    # split-phase output must equal the fused path
    img2, _ = r.render(cam.transform)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-6)


def test_classic_estimator_matches_oracle(tree):
    """Classic exponential-transmittance marcher (rt.frag:222-327) vs its
    scalar oracle; deterministic, so exact up to f32 reassociation."""
    from rt_octree_tpu.core.oracle import render_frame_classic_oracle

    cam = make_camera()
    opt = RenderOptions(spp=1, denoise=False, estimator="classic",
                        stop_thresh=1e-2)
    dt = upload_tree(tree, lut_levels=3)
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt,
                 n_chunks=2)
    img, aux = r.render(cam.transform)
    img = np.asarray(img)
    img_ref = render_frame_classic_oracle(tree, cam, opt)
    np.testing.assert_allclose(img, img_ref, atol=3e-5)
    assert np.asarray(aux)[3].max() > 0.5


def test_classic_stop_thresh_early_out(tree):
    """stop_thresh must have a live semantic: with an aggressive threshold
    rays terminate saturated (alpha == 1) where the volume is dense, and
    the renormalized color still matches the oracle."""
    from rt_octree_tpu.core.oracle import render_frame_classic_oracle

    cam = make_camera(16, 16)
    opt = RenderOptions(spp=1, denoise=False, estimator="classic",
                        stop_thresh=0.5)
    dt = upload_tree(tree, lut_levels=0)
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt)
    img, aux = r.render(cam.transform)
    img_ref = render_frame_classic_oracle(tree, cam, opt)
    np.testing.assert_allclose(np.asarray(img), img_ref, atol=3e-5)
    assert np.asarray(aux)[3].max() >= 1.0 - 1e-6


def test_empty_space_skip_is_exact(tree):
    """The Chebyshev empty-space jump must reproduce the plain march: the
    per-leaf epsilon never accumulates (each step lands at geometric
    boundary + one epsilon), so skipping all-empty cell cubes is exact."""
    from rt_octree_tpu.core.oracle import build_skip_grid

    cam = make_camera()
    opt = RenderOptions(spp=4, denoise=False)

    # full-depth LUT => device skip active (traversal.upload_tree)
    dt = upload_tree(tree, lut_levels=tree.max_depth, brick=False)
    assert dt.skip_cap > 0
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt)
    img, _ = r.render(cam.transform)

    rng = Pcg32(20230418)
    skip = build_skip_grid(tree, tree.max_depth)
    img_skip_oracle, _ = render_frame_oracle(tree, cam, opt, rng.copy(),
                                             skip=skip)
    img_plain_oracle, _ = render_frame_oracle(tree, cam, opt, rng.copy())

    # oracle skip vs oracle plain: the exactness claim itself
    np.testing.assert_allclose(img_skip_oracle, img_plain_oracle, atol=2e-5)
    # device skip march vs the plain oracle
    np.testing.assert_allclose(np.asarray(img), img_plain_oracle, atol=2e-5)


def test_mesh_depth_clip_matches_oracle(tree):
    """tmax_bg (mesh-depth clipping) must convert world depth to the
    tree-space ray parameter by DIVIDING by delta_scale
    (rt_core.cuh:208); regression test for the device path."""
    from rt_octree_tpu.core.camera import camera_rays
    from rt_octree_tpu.core.oracle import trace_ray
    from rt_octree_tpu.render.renderer import make_sorted_dst, trace_rays
    from rt_octree_tpu.core.options import RenderOptions as RO
    from rt_octree_tpu.render.renderer import FrozenOptions
    import jax.numpy as jnp

    cam = make_camera(12, 12)
    opt = RO(spp=2, denoise=False)
    dt = upload_tree(tree, lut_levels=0, brick=False)
    dirs, origin = camera_rays(cam)
    R = dirs.shape[0]
    # clip every ray at a depth that cuts through the shell
    depth = np.linspace(4.2, 5.2, R).astype(np.float32)

    rng = Pcg32(20230418)
    outs = np.zeros((R, 4), np.float32)
    for i in range(R):
        r = rng.copy()
        r.advance(i * opt.spp)
        cen = tree.offset + tree.scale * origin
        outs[i] = trace_ray(tree, dirs[i], dirs[i], cen, opt,
                            float(depth[i]), r, opt.spp)

    uniforms = np.zeros((R, opt.spp), np.float32)
    for i in range(R):
        r = rng.copy()
        r.advance(i * opt.spp)
        uniforms[i] = [r.next_float() for _ in range(opt.spp)]
    dst = make_sorted_dst(jnp.asarray(uniforms))
    out_dev = np.asarray(trace_rays(
        dt, jnp.asarray(dirs), jnp.asarray(dirs),
        jnp.asarray(np.tile(origin, (R, 1))), dst,
        FrozenOptions.from_options(opt),
        tmax_bg=jnp.asarray(depth), max_steps=512))
    np.testing.assert_allclose(out_dev, outs, atol=2e-5)
    # the clip must actually bite somewhere (else the test is vacuous)
    r2 = rng.copy()
    full = np.zeros((R, 4), np.float32)
    for i in range(R):
        r = r2.copy()
        r.advance(i * opt.spp)
        cen = tree.offset + tree.scale * origin
        full[i] = trace_ray(tree, dirs[i], dirs[i], cen, opt, 1e9, r,
                            opt.spp)
    assert np.abs(full - outs).max() > 1e-3


def test_dead_cap_overflow_falls_back_dense(tree):
    """Shade-on-death: a dead-ray cap of 1 at every boundary forces the
    dense at-width fallback in _death_boundary; the image must still
    match the oracle exactly."""
    cam = make_camera(16, 16)
    opt = RenderOptions(spp=2, denoise=False)
    dt = upload_tree(tree, lut_levels=3)
    sched = ((2, 1.0, "thin", 4, 1 << 30),
             (0, 4.0, "brick", 4, 1 << 30))
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt,
                 n_chunks=1, schedule=sched)
    img, aux = r.render(cam.transform)
    rng = Pcg32(20230418)
    img_ref, aux_ref = render_frame_oracle(tree, cam, opt, rng)
    np.testing.assert_allclose(np.asarray(img), img_ref, atol=2e-5)


def test_sbuf_overflow_falls_back_dense(tree):
    """Shade-on-death: a 1-slot side buffer (shade_cap_div >= R) forces
    every boundary AND the final drain onto the dense fallback; the
    image must still match the oracle exactly."""
    cam = make_camera(16, 16)
    opt = RenderOptions(spp=2, denoise=False)
    dt = upload_tree(tree, lut_levels=3)
    r = Renderer(dt, cam.width, cam.height, cam.fx, cam.fy, options=opt,
                 n_chunks=1, shade_cap_div=10_000)
    img, aux = r.render(cam.transform)
    rng = Pcg32(20230418)
    img_ref, aux_ref = render_frame_oracle(tree, cam, opt, rng)
    np.testing.assert_allclose(np.asarray(img), img_ref, atol=2e-5)
