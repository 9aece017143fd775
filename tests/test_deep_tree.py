"""Real-scale tree support: sparse/indirect bricks for deep trees and
the explicit 2^27-pointer fallback (SURVEY R4; reference loads any depth
without caveats, n3tree.cpp:270-277)."""

import numpy as np
import pytest

from rt_octree_tpu.core.camera import Camera
from rt_octree_tpu.core.options import RenderOptions
from rt_octree_tpu.io import synthetic
from rt_octree_tpu.ops import traversal
from rt_octree_tpu.ops.traversal import upload_tree


@pytest.fixture(scope="module")
def tree6():
    return synthetic.make_synthetic_tree("shell", depth=6, basis_dim=4)


def _render(dt, tree, schedule, spp=2, size=32):
    from rt_octree_tpu.render.renderer import Renderer
    cam = Camera(width=size, height=size, fx=40.0, fy=40.0)
    opt = RenderOptions(spp=spp, denoise=False)
    r = Renderer(dt, size, size, 40.0, 40.0, options=opt,
                 schedule=schedule, max_steps=1024)
    return np.asarray(r.render(cam.transform)[0]), cam, opt


def test_sparse_brick_table_built(tree6):
    dt = upload_tree(tree6, lut_levels=4, force_sparse_brick=True)
    assert dt.brick_indirect and dt.brick_levels == 4
    assert dt.lut_levels == 4
    assert dt.brick.shape[0] > 0 and dt.brick.shape[1] == 128
    assert dt.skip_cap > 0  # skip works through the indirect scheme


def test_sparse_brick_march_matches_dense(tree6):
    """The sparse/indirect brick march must be bit-identical to the
    dense-brick march (same leaves, same order)."""
    sched = ((2, 1.0, "thin"), (4, 2.0, "brick"), (0, 4.0, "brick"))
    dt_dense = upload_tree(tree6, lut_levels=6)  # full depth, dense
    dt_sparse = upload_tree(tree6, lut_levels=4,
                            force_sparse_brick=True)
    assert not dt_dense.brick_indirect and dt_sparse.brick_indirect
    img_d, _, _ = _render(dt_dense, tree6, sched)
    img_s, _, _ = _render(dt_sparse, tree6, sched)
    np.testing.assert_allclose(img_s, img_d, atol=2e-6)


def test_sparse_brick_matches_oracle(tree6):
    from rt_octree_tpu.core.oracle import render_frame_oracle
    from rt_octree_tpu.utils.rng import Pcg32

    sched = ((2, 1.0, "thin"), (4, 2.0, "brick"), (0, 4.0, "brick", 12))
    dt = upload_tree(tree6, lut_levels=4, force_sparse_brick=True)
    img, cam, opt = _render(dt, tree6, sched)
    ref, _ = render_frame_oracle(tree6, cam, opt, Pcg32(20230418))
    np.testing.assert_allclose(img, ref, atol=2e-5)


def test_deep_tree_depth10_auto_sparse():
    """max_depth > 9 automatically gets the sparse table at
    lut_levels = max_depth - 2 and stays oracle-exact."""
    from rt_octree_tpu.core.oracle import render_frame_oracle
    from rt_octree_tpu.utils.rng import Pcg32

    tree = synthetic.make_deep_chain_tree(depth=10, basis_dim=1)
    dt = upload_tree(tree, lut_levels=9, skip_cap=0)
    assert dt.brick_indirect and dt.lut_levels == 8
    sched = ((2, 1.0, "thin"), (6, 2.0, "thin"), (0, 4.0, "brick", 12))
    img, cam, opt = _render(dt, tree, sched, size=24)
    ref, _ = render_frame_oracle(tree, cam, opt, Pcg32(20230418))
    np.testing.assert_allclose(img, ref, atol=2e-5)


def test_ptr_overflow_explicit_fallback(tree6, monkeypatch, capsys):
    """Sub-pointer counts beyond the packed-LUT limit must fall back
    explicitly (stderr note) to descent marching and stay exact."""
    from rt_octree_tpu.core.oracle import render_frame_oracle
    from rt_octree_tpu.utils.rng import Pcg32

    monkeypatch.setattr(traversal, "LUT_PTR_BITS", 8)  # limit = 256
    dt = upload_tree(tree6, lut_levels=6)
    assert dt.lut_levels == 0 and dt.brick_levels == 0
    err = capsys.readouterr().err
    assert "sub-pointers" in err
    img, cam, opt = _render(dt, tree6, ((4, 1.0, "thin"), (0, 4.0, "thin")))
    ref, _ = render_frame_oracle(tree6, cam, opt, Pcg32(20230418))
    np.testing.assert_allclose(img, ref, atol=2e-5)


def test_refine_tree_deepens_and_renders_exact():
    """refine_tree: depth-4 shell -> depth-6 at occupied leaves; the
    refined tree renders oracle-exact through the sparse brick path."""
    from rt_octree_tpu.core.oracle import render_frame_oracle
    from rt_octree_tpu.utils.rng import Pcg32

    base = synthetic.make_synthetic_tree("shell", depth=4, basis_dim=4)
    res = 2 ** 4
    thickness = max(3.0 / res, 0.02)
    tree = synthetic.refine_tree(
        base,
        lambda p: synthetic.shell_sigma(p, thickness=thickness,
                                        amplitude=4.0 / thickness),
        synthetic.position_color, levels=2)
    assert tree.max_depth == 6
    assert tree.capacity > base.capacity
    dt = upload_tree(tree, lut_levels=4, force_sparse_brick=True)
    assert dt.brick_indirect
    sched = ((2, 1.0, "thin"), (4, 2.0, "brick"), (0, 4.0, "brick"))
    img, cam, opt = _render(dt, tree, sched, size=24)
    ref, _ = render_frame_oracle(tree, cam, opt, Pcg32(20230418))
    np.testing.assert_allclose(img, ref, atol=2e-5)
