"""LOD tree construction (io/lod.py): pooling semantics + render parity.

The reference has no LOD mechanism; this is the TPU build's additive
answer to the LLFF roofline (PERF.md round 4: forward-facing frames are
row-count-bound, so speed there must come from coarser trees)."""

import numpy as np
import pytest

from rt_octree_tpu.core.camera import Camera
from rt_octree_tpu.core.options import RenderOptions
from rt_octree_tpu.core.oracle import render_frame_oracle
from rt_octree_tpu.io import n3tree, synthetic
from rt_octree_tpu.io.lod import build_lod, node_depths
from rt_octree_tpu.utils.rng import Pcg32


@pytest.fixture(scope="module")
def tree():
    return synthetic.make_synthetic_tree("shell", depth=4, basis_dim=1)


def test_node_depths(tree):
    d = node_depths(tree.child.reshape(-1).astype(np.int64), tree.N3)
    assert d[0] == 0
    assert d.max() == tree.max_depth - 1  # deepest NODE level
    assert (d >= 0).all()  # synthetic trees have no unreachable nodes


def test_full_depth_roundtrip(tree):
    """An LOD at the tree's own depth is the identity (same topology,
    same data)."""
    out = build_lod(tree, tree.max_depth)
    assert out.n_nodes == tree.n_nodes
    np.testing.assert_array_equal(out.child, tree.child.reshape(-1))
    np.testing.assert_allclose(np.asarray(out.data, np.float32),
                               np.asarray(tree.data, np.float32),
                               atol=1e-3)


def test_monotonic_node_count(tree):
    counts = [build_lod(tree, d).n_nodes
              for d in range(1, tree.max_depth + 1)]
    assert counts[0] == 1  # root only
    assert all(a <= b for a, b in zip(counts, counts[1:]))


def test_pooling_semantics():
    """Hand-built 2-level tree: the depth-1 cap pools each internal
    subcell's children with sigma-weighted color + mean sigma."""
    N3 = 8
    # root (node 0) with one internal subcell -> node 1; node 1's 8
    # subcells are leaves with known (color, sigma)
    child = np.zeros(2 * N3, np.int32)
    child[0] = 1  # root subcell 0 -> node 1 (skip in node units)
    data = np.zeros((2 * N3, 4), np.float16)
    rng = np.random.default_rng(0)
    colors = rng.uniform(0.1, 0.9, (N3, 3)).astype(np.float32)
    sigmas = rng.uniform(0.0, 5.0, N3).astype(np.float32)
    sigmas[2] = 0.0  # an empty child contributes no color
    data[N3:, :3] = colors
    data[N3:, 3] = sigmas
    from rt_octree_tpu.io.n3tree import DataFormat
    tree = n3tree.N3Tree(
        data=data, child=child, offset=np.zeros(3, np.float32),
        scale=np.ones(3, np.float32), N=2, data_dim=4,
        data_format=DataFormat.parse("RGBA"), capacity=2, max_depth=2)
    out = build_lod(tree, 1)
    assert out.n_nodes == 1
    got = np.asarray(out.data, np.float32)
    w = np.clip(sigmas, 0, None) + 1e-12
    want_color = (colors * w[:, None]).sum(0) / w.sum()
    np.testing.assert_allclose(got[0, :3], want_color, atol=2e-3)
    np.testing.assert_allclose(got[0, 3], sigmas.mean(), atol=2e-3)
    # untouched leaf subcells of the root copy through exactly
    np.testing.assert_allclose(got[1:, :], data[1:N3].astype(np.float32),
                               atol=2e-3)


def test_lod_renders_and_degrades_gracefully(tree, tmp_path):
    """A depth-capped tree saves, reloads, and renders through the
    normal pipeline; its render is a coarse approximation (finite PSNR
    well above random) and deeper caps approximate better."""
    cam = Camera(width=20, height=20)
    opt = RenderOptions(spp=2, denoise=False)

    def render(t):
        img, _ = render_frame_oracle(t, cam, opt, Pcg32(20230418))
        return np.asarray(img, np.float32)

    ref = render(tree)
    psnr = {}
    for d in (2, 3):
        path = str(tmp_path / f"lod{d}.npz")
        synthetic.save_npz(build_lod(tree, d), path)
        lod = n3tree.load(path)
        assert lod.max_depth == d
        got = render(lod)
        mse = float(np.mean((got - ref) ** 2))
        psnr[d] = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr[3] >= psnr[2] - 1.0  # deeper cap approximates no worse
    assert psnr[2] > 10.0  # coarse but recognizable, not noise


def test_lod_cli(tree, tmp_path):
    from rt_octree_tpu.apps.cli import main as cli_main
    src = str(tmp_path / "in.npz")
    dst_p = str(tmp_path / "out.npz")
    synthetic.save_npz(tree, src)
    assert cli_main(["lod", src, "-d", "2", "-o", dst_p]) == 0
    out = n3tree.load(dst_p)
    assert out.max_depth == 2
