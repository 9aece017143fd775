"""Per-scene schedule auto-tuning + overflow-fallback behavior."""

import numpy as np
import pytest

from rt_octree_tpu.core.camera import Camera
from rt_octree_tpu.core.options import RenderOptions
from rt_octree_tpu.io import synthetic
from rt_octree_tpu.ops.traversal import upload_tree


@pytest.fixture(scope="module")
def scene():
    tree = synthetic.make_synthetic_tree("shell", depth=4, basis_dim=4)
    dt = upload_tree(tree, lut_levels=4)
    return tree, dt


def test_probe_and_derive(scene):
    from rt_octree_tpu.render.schedule import (
        CHECKPOINTS, auto_schedule, derive_schedule, probe_survivors)

    tree, dt = scene
    cam = Camera(width=64, height=64, fx=80.0, fy=80.0)
    opt = RenderOptions(spp=2, denoise=False)
    fracs = probe_survivors(dt, [cam.transform[:3]], opt, 80.0, 80.0,
                            64, 64, probe_res=32)
    n = len(CHECKPOINTS)
    # checkpoint survivors + cumulative dead-with-hits + hit upper bound
    assert fracs.shape == (2 * n + 1,)
    # survivor fraction is monotone nonincreasing and sane
    assert np.all(np.diff(fracs[:n]) <= 1e-9)
    # cumulative dead-with-hits is monotone nondecreasing
    assert np.all(np.diff(fracs[n:2 * n]) >= -1e-9)
    assert fracs[0] <= 1.0 and fracs[-1] <= 1.0

    sched = derive_schedule(fracs)
    assert sched[0][1] == 1.0
    # probed schedules carry explicit shade-on-death dead_div caps
    assert all(len(s) == 5 for s in sched)
    divs = [s[1] for s in sched]
    assert all(b >= a for a, b in zip(divs, divs[1:]))  # monotone
    # the DP's boundary caps hold the measured survivors with margin:
    # walk cumulative thin-equivalent steps and compare with the probed
    # curve (brick stages deliver >= steps/1.5... mapped conservatively)
    cum = 0.0
    for (steps, div, kind, t_in, _dd), (nsteps, ndiv, *_r) in zip(
            sched, sched[1:]):
        cum += steps if kind == "thin" else steps / t_in * 1.5
        # survivor frac at the nearest probed checkpoint <= cum
        idx = max([i for i, cp in enumerate(CHECKPOINTS) if cp <= cum],
                  default=0)
        assert fracs[idx] <= 1.0 / ndiv + 1e-6
    assert sched[-1][0] == 0 and sched[-1][3] in (4, 8)  # drain stage

    sched2 = auto_schedule(dt, cam.transform, opt, 80.0, 80.0, 64, 64,
                           probe_res=32)
    assert sched2[-1][0] == 0


def test_auto_schedule_render_matches_default(scene):
    """The tuned schedule changes PERFORMANCE only: output must be
    bit-near the default-schedule render (exactness is never traded)."""
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.render.schedule import auto_schedule

    tree, dt = scene
    W = H = 40
    cam = Camera(width=W, height=H, fx=50.0, fy=50.0)
    opt = RenderOptions(spp=2, denoise=False)
    sched = auto_schedule(dt, cam.transform, opt, 50.0, 50.0, W, H,
                          probe_res=24)
    r_def = Renderer(dt, W, H, 50.0, 50.0, options=opt, max_steps=512)
    r_tuned = Renderer(dt, W, H, 50.0, 50.0, options=opt, max_steps=512,
                       schedule=sched)
    img0 = np.asarray(r_def.render(cam.transform)[0])
    img1 = np.asarray(r_tuned.render(cam.transform)[0])
    np.testing.assert_allclose(img1, img0, atol=2e-6)


def test_overflow_pose_correct_and_bounded(scene):
    """A pose engineered to overflow the early stage caps (camera inside
    the shell: every ray starts occupied) must fall back to the
    at-width drain, stay oracle-exact, and terminate via the while-loop
    early exit (cost ~ the rays actually marched, not max_steps)."""
    import time

    from rt_octree_tpu.core.oracle import render_frame_oracle
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.utils.rng import Pcg32

    tree, dt = scene
    W = H = 24
    # aggressive divisors so the engineered pose overflows stage 1
    tight = ((2, 1.0, "thin"), (4, 64.0, "thin"), (0, 128.0, "brick"))
    opt = RenderOptions(spp=2, denoise=False)
    cam = Camera(width=W, height=H, fx=30.0, fy=30.0,
                 center=np.array([0.05, 0.0, 0.0], np.float32))
    r = Renderer(dt, W, H, 30.0, 30.0, options=opt, schedule=tight,
                 max_steps=4096)
    img = np.asarray(r.render(cam.transform)[0])  # includes jit compile
    t0 = time.time()
    img = np.asarray(r.render(cam.transform)[0])
    wall = time.time() - t0
    ref, _ = render_frame_oracle(tree, cam, opt, Pcg32(20230418))
    np.testing.assert_allclose(img, ref, atol=2e-5)
    # generous CI-safe bound: the while-loop early exit must keep the
    # fallback drain at ~the rays actually marched, nowhere near
    # max_steps x width (which would take minutes on CPU)
    assert wall < 60.0


def test_shade_cap_div_matches_default(scene):
    """The probed shade cap changes performance only; an overflowing cap
    falls back to dense shading -- output identical either way."""
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.render.schedule import derive_shade_div

    tree, dt = scene
    W = H = 32
    cam = Camera(width=W, height=H, fx=40.0, fy=40.0)
    opt = RenderOptions(spp=2, denoise=False)
    imgs = []
    for div in (4, 8, 64):  # 64 overflows -> dense branch
        r = Renderer(dt, W, H, 40.0, 40.0, options=opt, max_steps=512,
                     shade_cap_div=div)
        imgs.append(np.asarray(r.render(cam.transform)[0]))
    np.testing.assert_allclose(imgs[1], imgs[0], atol=2e-6)
    np.testing.assert_allclose(imgs[2], imgs[0], atol=2e-6)
    assert derive_shade_div(0.11) == 7
    assert derive_shade_div(0.5) == 1
    assert derive_shade_div(0.001) == 16


def test_auto_schedule_with_shade_div(scene):
    from rt_octree_tpu.render.schedule import auto_schedule

    tree, dt = scene
    cam = Camera(width=48, height=48, fx=60.0, fy=60.0)
    opt = RenderOptions(spp=2, denoise=False)
    sched, div = auto_schedule(dt, cam.transform, opt, 60.0, 60.0, 48, 48,
                               probe_res=24, with_shade_div=True)
    assert 1 <= div <= 16
    assert sched[-1][:4] == (0, sched[-1][1], "brick", 4)


def test_entry_cull_boundary_for_small_projection(scene):
    """When the tree projects onto a minority of the frame (real capture
    poses with margins), checkpoint 0 (the pre-march bbox hit mask,
    rt_core.cuh:208-214) lets the DP compact at ENTRY -- and the culled
    render stays bit-near the default-schedule one."""
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.render.schedule import auto_schedule

    tree, dt = scene
    W = H = 48
    # pulled far back: the unit cube covers a small center patch
    cam = Camera(width=W, height=H, fx=40.0, fy=40.0,
                 center=np.array([12.0, 0.0, 0.0], np.float32),
                 v_back=np.array([1.0, 0.0, 0.0], np.float32))
    opt = RenderOptions(spp=2, denoise=False)
    sched, shade_div = auto_schedule(dt, cam.transform, opt, 40.0, 40.0,
                                     W, H, probe_res=32,
                                     with_shade_div=True)
    # the first marching stage must already run compacted
    assert sched[0][1] > 1.0, sched
    r_def = Renderer(dt, W, H, 40.0, 40.0, options=opt, max_steps=512)
    r_tuned = Renderer(dt, W, H, 40.0, 40.0, options=opt, max_steps=512,
                       schedule=sched, shade_cap_div=shade_div)
    img0 = np.asarray(r_def.render(cam.transform)[0])
    img1 = np.asarray(r_tuned.render(cam.transform)[0])
    np.testing.assert_allclose(img1, img0, atol=2e-6)


def test_long_tail_curve_selects_wide_t_in():
    """A probed survivor curve that still carries rays past checkpoint
    100 (the LLFF/NDC regime) must select t_in=8 brick rounds -- the
    round-4 A/B measured 1560/1102/1544 ms at t_in 4/8/12 there
    (tools/round4_llff_tin.py); orbit-style fast-decay curves keep the
    measured-best t_in=4."""
    from rt_octree_tpu.render.schedule import CHECKPOINTS, derive_schedule

    cps = np.asarray(CHECKPOINTS, np.float64)
    tail = np.exp(-cps / 140.0)  # ~10% alive at cp 100
    s_tail = derive_schedule(np.concatenate([tail, 1 - tail, [0.9]]))
    assert all(t == 8 for _, _, k, t, *_ in s_tail if k == "brick"), s_tail
    fast = np.exp(-cps / 20.0)  # ~0.7% alive at cp 100
    s_fast = derive_schedule(np.concatenate([fast, 1 - fast, [0.3]]))
    assert all(t == 4 for _, _, k, t, *_ in s_fast if k == "brick"), s_fast


def test_t_in_8_schedule_render_exact(scene):
    """t_in changes how many brick sub-steps share one gathered brick --
    never the step semantics: a handmade t_in=8 schedule must render
    bit-near the default."""
    from rt_octree_tpu.render.renderer import Renderer

    tree, dt = scene
    W = H = 40
    cam = Camera(width=W, height=H, fx=50.0, fy=50.0)
    opt = RenderOptions(spp=2, denoise=False)
    wide = ((4, 1.0, "thin"), (8, 1.5, "thin"), (16, 2.0, "brick", 8),
            (0, 3.0, "brick", 8))
    r_def = Renderer(dt, W, H, 50.0, 50.0, options=opt, max_steps=512)
    r_wide = Renderer(dt, W, H, 50.0, 50.0, options=opt, max_steps=512,
                      schedule=wide)
    img0 = np.asarray(r_def.render(cam.transform)[0])
    img1 = np.asarray(r_wide.render(cam.transform)[0])
    np.testing.assert_allclose(img1, img0, atol=2e-6)
