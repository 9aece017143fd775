"""Octree construction, loading, query and LUT tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_octree_tpu.io import n3tree, synthetic
from rt_octree_tpu.core.oracle import query_single_from_root
from rt_octree_tpu.ops.traversal import upload_tree, tree_query


@pytest.fixture(scope="module")
def tree():
    return synthetic.make_synthetic_tree("shell", depth=5, basis_dim=4)


def test_synthetic_tree_valid(tree):
    N3 = tree.N3
    n_nodes = tree.child.shape[0] // N3
    child = tree.child.reshape(n_nodes, N3)
    # child links must point forward and in range
    nz_nodes, nz_slots = np.nonzero(child)
    tgt = nz_nodes + child[nz_nodes, nz_slots]
    assert (tgt > nz_nodes).all()
    assert (tgt < n_nodes).all()
    assert tree.max_depth == 5


def test_npz_roundtrip(tmp_path, tree):
    path = str(tmp_path / "tree.npz")
    synthetic.save_npz(tree, path)
    tree2 = n3tree.load(path)
    np.testing.assert_array_equal(tree2.child, tree.child)
    np.testing.assert_array_equal(tree2.data, tree.data)
    np.testing.assert_allclose(tree2.scale, tree.scale)
    assert tree2.data_format.basis_dim == tree.data_format.basis_dim
    assert tree2.max_depth == tree.max_depth


def test_legacy_format_inference(tree):
    d = synthetic.tree_to_npz_dict(tree)
    del d["data_format"]
    t2 = n3tree.from_npz_dict(d)
    assert t2.data_format.format == n3tree.BasisFormat.SH
    assert t2.data_format.basis_dim == (tree.data_dim - 1) // 3


def test_quantized_decode():
    # build a tiny quantized tree and check codebook expansion layout
    rng = np.random.default_rng(0)
    capacity, N, n_basis = 3, 2, 4
    N3 = N ** 3
    n_child = capacity * N3
    data_dim = 3 * n_basis + 1
    n_retain = 1
    n_q = n_basis - n_retain

    quant_colors = rng.standard_normal((n_q, 65536, 3)).astype(np.float16)
    quant_map = rng.integers(0, 65536, (n_q, n_child)).astype(np.uint16)
    sigma = rng.standard_normal(n_child).astype(np.float16)
    retained = rng.standard_normal((n_retain, n_child, 3)).astype(np.float16)

    npz = {
        "data_dim": np.int64(data_dim),
        "data_format": np.str_(f"SH{n_basis}"),
        "invradius": np.float64(1.0),
        "offset": np.zeros(3, np.float32),
        "child": np.zeros((capacity, N, N, N), np.int32),
        "quant_colors": quant_colors,
        "quant_map": quant_map,
        "sigma": sigma,
        "data_retained": retained,
    }
    t = n3tree.from_npz_dict(npz)
    assert t.data.shape == (n_child, data_dim)
    # channel c coefficient j (j >= n_retain) comes from codebook j-n_retain
    for i in [0, 5, n_child - 1]:
        for j in range(n_q):
            cid = int(quant_map[j, i])
            for k in range(3):
                assert t.data[i, n_retain + j + k * n_basis] == \
                    quant_colors[j, cid, k]
        for k in range(3):
            assert t.data[i, 0 + k * n_basis] == retained[0, i, k]
        assert t.data[i, data_dim - 1] == sigma[i]


@pytest.mark.parametrize("lut_levels", [0, 3])
def test_device_query_matches_oracle(tree, lut_levels, np_rng):
    dt = upload_tree(tree, lut_levels=lut_levels)
    assert dt.lut_levels == lut_levels
    pos = np_rng.random((512, 3)).astype(np.float32)
    sub, cube, local = tree_query(dt, jnp.asarray(pos))
    sub, cube, local = map(np.asarray, (sub, cube, local))
    for i in range(len(pos)):
        e_sub, e_cube, e_local = query_single_from_root(tree, pos[i].copy())
        assert sub[i] == e_sub, f"pos {pos[i]}"
        assert cube[i] == e_cube
        np.testing.assert_allclose(local[i], e_local, atol=1e-5)


def test_jump_lut_consistency(tree):
    lut = n3tree.build_jump_lut(tree, levels=3)
    res = lut.res
    # every cell center must agree with a root descent
    idx = np.arange(res ** 3)
    x = (idx // (res * res) + 0.5) / res
    y = ((idx // res) % res + 0.5) / res
    z = (idx % res + 0.5) / res
    for i in np.random.default_rng(1).choice(res ** 3, 64, replace=False):
        pos = np.array([x[i], y[i], z[i]], np.float32)
        sub, cube, _ = query_single_from_root(tree, pos.copy())
        d = int(lut.depth[i])
        if d != n3tree.JumpLut.SENTINEL:
            assert int(lut.ptr[i]) == sub
            assert float(tree.N) ** d == cube
        else:
            assert cube > tree.N ** lut.levels


@pytest.mark.parametrize("lut_levels", [0, 3])
def test_query_full_sigma(tree, lut_levels, np_rng):
    from rt_octree_tpu.ops.traversal import tree_query_full
    dt = upload_tree(tree, lut_levels=lut_levels)
    pos = np_rng.random((256, 3)).astype(np.float32)
    sub, cube, local, sigma = map(
        np.asarray, tree_query_full(dt, jnp.asarray(pos)))
    expected = tree.data[sub, tree.data_dim - 1].astype(np.float32)
    np.testing.assert_array_equal(sigma, expected)
