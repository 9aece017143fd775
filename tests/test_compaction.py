"""fast_nonzero vs jnp.nonzero semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from rt_octree_tpu.ops.compaction import fast_nonzero


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
