"""Native C++ runtime helpers must agree exactly with the NumPy fallbacks."""

import numpy as np
import pytest

from rt_octree_tpu.io import n3tree, synthetic
from rt_octree_tpu.native import api as native


@pytest.fixture(scope="module")
def tree():
    return synthetic.make_synthetic_tree("blobs", depth=5, basis_dim=4)


def _numpy_lut(tree, levels):
    """Direct call to the NumPy fallback path (bypassing native)."""
    import unittest.mock as mock
    with mock.patch.object(native, "build_jump_lut", lambda *a, **k: None):
        return n3tree.build_jump_lut(tree, levels)


def test_native_available():
    assert native.get_lib() is not None, "native build failed"


def test_max_depth_matches(tree):
    import unittest.mock as mock
    with mock.patch.object(native, "tree_max_depth", lambda *a, **k: None):
        ref = n3tree.compute_max_depth(tree.child, tree.N3)
    got = native.tree_max_depth(tree.child, tree.N3)
    assert got == ref == tree.max_depth


def test_jump_lut_matches(tree):
    ref = _numpy_lut(tree, 4)
    got = n3tree.build_jump_lut(tree, 4)
    np.testing.assert_array_equal(got.ptr, ref.ptr)
    np.testing.assert_array_equal(got.depth, ref.depth)


def test_quant_decode_matches(np_rng):
    capacity, N, n_basis = 2, 2, 3
    N3 = N ** 3
    n_child = capacity * N3
    data_dim = 3 * n_basis + 1
    n_retain = 1
    n_q = n_basis - n_retain
    npz = {
        "data_dim": np.int64(data_dim),
        "data_format": np.str_(f"SH{n_basis}"),
        "invradius": np.float64(1.0),
        "offset": np.zeros(3, np.float32),
        "child": np.zeros((capacity, N, N, N), np.int32),
        "quant_colors": np_rng.standard_normal(
            (n_q, 65536, 3)).astype(np.float16),
        "quant_map": np_rng.integers(0, 65536, (n_q, n_child)).astype(
            np.uint16),
        "sigma": np_rng.standard_normal(n_child).astype(np.float16),
        "data_retained": np_rng.standard_normal(
            (n_retain, n_child, 3)).astype(np.float16),
    }
    t_native = n3tree.from_npz_dict(dict(npz))
    import unittest.mock as mock
    with mock.patch.object(native, "decode_quant", lambda *a, **k: None):
        t_numpy = n3tree.from_npz_dict(dict(npz))
    np.testing.assert_array_equal(t_native.data, t_numpy.data)


def test_npz_fast_matches_np_load(tmp_path, tree):
    from rt_octree_tpu.io.npz_fast import load_npz_fast
    path = str(tmp_path / "t.npz")
    synthetic.save_npz(tree, path)
    fast = load_npz_fast(path)
    with np.load(path) as f:
        ref = {k: f[k] for k in f.files}
    assert set(fast) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(fast[k]), np.asarray(ref[k]))

    # compressed variant
    path2 = str(tmp_path / "t2.npz")
    np.savez_compressed(path2, **synthetic.tree_to_npz_dict(tree))
    fast2 = load_npz_fast(path2)
    np.testing.assert_array_equal(np.asarray(fast2["child"]), ref["child"])
