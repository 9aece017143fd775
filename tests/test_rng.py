"""PCG32 bit-exactness tests against the C++ reference semantics.

Oracle: pure-Python Pcg32 implements pcg32.h line-for-line semantics in
exact integer arithmetic; the vectorized device path must match it bit for
bit, including the per-pixel advance(idx*spp) stream-splitting protocol of
renderer/src/cuda/volrend.cu:157.
"""

import numpy as np
import jax.numpy as jnp

from rt_octree_tpu.utils.rng import (
    Pcg32,
    RENDER_CONTEXT_SEED,
    frame_uniforms,
    pcg32_uniforms_at,
)


def test_seed_known_values():
    # pcg32(42, 54) first outputs, cross-checked with the canonical PCG
    # reference implementation (pcg32_srandom_r / pcg32_random_r).
    r = Pcg32(42, 54)
    expected = [0xA15C02B7, 0x7B47F409, 0xBA1D3330, 0x83D2F293, 0xBFA4784B]
    got = [r.next_uint() for _ in range(5)]
    assert got == expected


def test_advance_matches_sequential():
    r1 = Pcg32(RENDER_CONTEXT_SEED)
    r2 = Pcg32(RENDER_CONTEXT_SEED)
    for _ in range(1000):
        r1.next_uint()
    r2.advance(1000)
    assert r1.state == r2.state
    assert r1.next_uint() == r2.next_uint()


def test_advance_default_2_32():
    r = Pcg32(RENDER_CONTEXT_SEED)
    s0 = r.state
    r.advance()
    # advancing back must return to the original state
    r.advance(-(1 << 32))
    assert r.state == s0


def test_next_float_range():
    r = Pcg32(RENDER_CONTEXT_SEED)
    vals = [r.next_float() for _ in range(100)]
    assert all(0.0 <= v < 1.0 for v in vals)


def test_device_uniforms_match_host_stream():
    base = Pcg32(RENDER_CONTEXT_SEED)
    n = 257
    # Host oracle: value at position p is next_float() after advance(p).
    expected = []
    for p in range(n):
        r = base.copy()
        r.advance(p)
        expected.append(r.next_float())
    expected = np.array(expected, np.float32)

    got = np.asarray(
        pcg32_uniforms_at(
            jnp.uint32(base.state >> 32),
            jnp.uint32(base.state & 0xFFFFFFFF),
            jnp.arange(n, dtype=jnp.uint32),
            inc=base.inc,
            nbits=10,
        )
    )
    np.testing.assert_array_equal(got, expected)


def test_frame_uniforms_match_per_pixel_protocol():
    # Reference protocol: per pixel idx, rng.advance(idx*SPP) then SPP draws.
    base = Pcg32(RENDER_CONTEXT_SEED)
    base.advance()  # pretend one frame has passed
    n_pixels, spp = 31, 6
    expected = np.zeros((n_pixels, spp), np.float32)
    for idx in range(n_pixels):
        r = base.copy()
        r.advance(idx * spp)
        for j in range(spp):
            expected[idx, j] = r.next_float()

    got = np.asarray(frame_uniforms(base, n_pixels, spp))
    np.testing.assert_array_equal(got, expected)


def test_large_offsets():
    base = Pcg32(RENDER_CONTEXT_SEED)
    offs = np.array([0, 1, 2**20, 2**24 + 12345, 2**30 - 1], np.uint32)
    expected = []
    for p in offs:
        r = base.copy()
        r.advance(int(p))
        expected.append(r.next_float())
    got = np.asarray(
        pcg32_uniforms_at(
            jnp.uint32(base.state >> 32),
            jnp.uint32(base.state & 0xFFFFFFFF),
            jnp.asarray(offs),
            inc=base.inc,
            nbits=31,
        )
    )
    np.testing.assert_array_equal(got, np.array(expected, np.float32))


def test_uniforms_range_matches_at():
    from rt_octree_tpu.utils.rng import pcg32_uniforms_range
    base = Pcg32(RENDER_CONTEXT_SEED)
    n = 300  # not a multiple of the 32 block
    got = np.asarray(pcg32_uniforms_range(
        jnp.uint32(base.state >> 32), jnp.uint32(base.state & 0xFFFFFFFF),
        n=n, inc=base.inc))
    expected = np.asarray(pcg32_uniforms_at(
        jnp.uint32(base.state >> 32), jnp.uint32(base.state & 0xFFFFFFFF),
        jnp.arange(n, dtype=jnp.uint32), inc=base.inc, nbits=10))
    np.testing.assert_array_equal(got, expected)
