"""fast_nonzero vs jnp.nonzero semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from rt_octree_tpu.ops.compaction import (exclusive_rank, fast_nonzero,
                                          fast_nonzero_rank)


@pytest.mark.parametrize("n,size,p", [(4096, 1024, 0.1), (4096, 512, 0.5),
                                      (8192, 8192, 0.9), (512, 64, 0.2),
                                      (100, 32, 0.3)])
def test_fast_nonzero_matches_jnp(np_rng, n, size, p):
    mask = jnp.asarray(np_rng.random(n) < p)
    ref = jnp.nonzero(mask, size=size, fill_value=-7)[0]
    out = fast_nonzero(mask, size=size, fill_value=-7)
    k = int(jnp.sum(mask))
    m = min(k, size)
    # packed prefix must match exactly; beyond that, fill
    np.testing.assert_array_equal(np.asarray(out)[:m], np.asarray(ref)[:m])
    np.testing.assert_array_equal(np.asarray(out)[m:],
                                  np.full(size - m, -7, np.int32))


def test_fast_nonzero_empty_and_full():
    mask = jnp.zeros(2048, bool)
    out = fast_nonzero(mask, size=16, fill_value=99)
    np.testing.assert_array_equal(np.asarray(out), np.full(16, 99))
    mask = jnp.ones(2048, bool)
    out = fast_nonzero(mask, size=2048, fill_value=99)
    np.testing.assert_array_equal(np.asarray(out), np.arange(2048))


@pytest.mark.parametrize("n,p", [(4096, 0.3), (512, 0.5), (100, 0.2),
                                 (2048, 0.0), (2048, 1.0)])
def test_exclusive_rank(np_rng, n, p):
    mask = np.asarray(np_rng.random(n) < p)
    ref = np.cumsum(mask) - mask
    out = np.asarray(exclusive_rank(jnp.asarray(mask)))
    # rank is only contractual where mask is True
    np.testing.assert_array_equal(out[mask], ref[mask])


@pytest.mark.parametrize("n,size,p", [(4096, 1024, 0.1), (4096, 4096, 0.6)])
def test_fast_nonzero_rank_inverse(np_rng, n, size, p):
    """idx[rank[i]] == i for every active i with rank[i] < size (the
    gather-merge contract used at march compaction boundaries)."""
    mask = np.asarray(np_rng.random(n) < p)
    idx, rank = fast_nonzero_rank(jnp.asarray(mask), size, n)
    idx, rank = np.asarray(idx), np.asarray(rank)
    np.testing.assert_array_equal(
        idx, np.asarray(fast_nonzero(jnp.asarray(mask), size, n)))
    act = np.nonzero(mask)[0]
    act = act[rank[act] < size]
    np.testing.assert_array_equal(idx[rank[act]], act)


@pytest.mark.parametrize("n,cap_f,cap_s,pf,ps", [
    (4096, 1024, 512, 0.15, 0.08),   # both fit
    (4096, 128, 128, 0.3, 0.2),      # both overflow (entries dropped)
    (2048, 512, 64, 0.0, 0.0),       # empty masks
    (512, 512, 512, 0.5, 0.5),       # overlap: first wins
])
def test_partition_indices(np_rng, n, cap_f, cap_s, pf, ps):
    """Both packed lists match fast_nonzero over their (disjointed)
    masks -- the one-scatter fusion used at shade-on-death boundaries."""
    from rt_octree_tpu.ops.compaction import partition_indices
    first = np.asarray(np_rng.random(n) < pf)
    second = np.asarray(np_rng.random(n) < ps)
    idx_f, idx_s = partition_indices(
        jnp.asarray(first), jnp.asarray(second), cap_f, cap_s, n)
    ref_f = np.asarray(fast_nonzero(jnp.asarray(first), cap_f, n))
    ref_s = np.asarray(
        fast_nonzero(jnp.asarray(second & ~first), cap_s, n))
    np.testing.assert_array_equal(np.asarray(idx_f), ref_f)
    np.testing.assert_array_equal(np.asarray(idx_s), ref_s)
