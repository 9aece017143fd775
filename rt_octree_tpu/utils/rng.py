"""PCG32 random number generation, bit-exact with the reference renderer.

The reference (renderer/3rdparty/pcg32.h:39-201) uses PCG32-XSH-RR with
64-bit state.  The render kernel gives pixel ``idx`` its own stream by
``rng.advance(idx * SPP)`` and then draws SPP floats sequentially
(renderer/src/cuda/volrend.cu:157, rt_core.cuh:67-193), and the host
advances the base state by 2^32 between frames
(renderer/main_headless.cpp:506, render_context.hpp:16 seeds with 20230418).

Because every per-pixel draw is just "the base stream at absolute position
``idx*SPP + j``", a whole frame's worth of uniforms is one contiguous block
of the stream.  On TPU we evaluate the block *in parallel*: each lane
jump-aheads the base state by its own offset using the O(log n) advance
(Brown, "Random Number Generation with Arbitrary Stride") with
host-precomputed per-bit multiplier/increment tables, all in uint32-pair
arithmetic (TPUs have no native u64 multiply).

Host-side scalar class ``Pcg32`` (exact Python ints) reproduces the C++
semantics for seeding, per-frame advance, and for test oracles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PCG32_DEFAULT_STATE = 0x853C49E6748FEA9B
PCG32_DEFAULT_STREAM = 0xDA3E39CB94B95BDB
PCG32_MULT = 0x5851F42D4C957F2D

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1

# Seed used by the reference render context (render_context.hpp:16).
RENDER_CONTEXT_SEED = 20230418


class Pcg32:
    """Host-side exact PCG32 (mirrors renderer/3rdparty/pcg32.h)."""

    def __init__(self, initstate: int | None = None, initseq: int = 1):
        if initstate is None:
            self.state = PCG32_DEFAULT_STATE
            self.inc = PCG32_DEFAULT_STREAM
        else:
            self.seed(initstate, initseq)

    def seed(self, initstate: int, initseq: int = 1) -> None:
        self.state = 0
        self.inc = ((initseq << 1) | 1) & _M64
        self.next_uint()
        self.state = (self.state + initstate) & _M64
        self.next_uint()

    def next_uint(self) -> int:
        oldstate = self.state
        self.state = (oldstate * PCG32_MULT + self.inc) & _M64
        xorshifted = (((oldstate >> 18) ^ oldstate) >> 27) & _M32
        rot = oldstate >> 59
        return ((xorshifted >> rot) | (xorshifted << ((-rot) & 31))) & _M32

    def next_float(self) -> float:
        # [1,2) bit trick then subtract 1 (pcg32.h:103-112)
        u = (self.next_uint() >> 9) | 0x3F800000
        return float(np.uint32(u).view(np.float32)) - 1.0

    def advance(self, delta: int = 1 << 32) -> None:
        cur_mult = PCG32_MULT
        cur_plus = self.inc
        acc_mult = 1
        acc_plus = 0
        delta &= _M64
        while delta > 0:
            if delta & 1:
                acc_mult = (acc_mult * cur_mult) & _M64
                acc_plus = (acc_plus * cur_mult + cur_plus) & _M64
            cur_plus = ((cur_mult + 1) * cur_plus) & _M64
            cur_mult = (cur_mult * cur_mult) & _M64
            delta >>= 1
        self.state = (acc_mult * self.state + acc_plus) & _M64

    def copy(self) -> "Pcg32":
        out = Pcg32.__new__(Pcg32)
        out.state = self.state
        out.inc = self.inc
        return out


def _advance_tables(inc: int, nbits: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-bit (multiplier, increment) for jump-ahead: advancing by delta
    applies, for each set bit j of delta, state <- A_j*state + C_j with
    A_j = MULT^(2^j), C_j from the Brown recursion.  Returns uint32 arrays
    of shape [nbits, 2] as (hi, lo) pairs."""
    mults = np.zeros((nbits, 2), np.uint32)
    pluss = np.zeros((nbits, 2), np.uint32)
    cur_mult = PCG32_MULT
    cur_plus = inc & _M64
    for j in range(nbits):
        mults[j] = (cur_mult >> 32, cur_mult & _M32)
        pluss[j] = (cur_plus >> 32, cur_plus & _M32)
        cur_plus = ((cur_mult + 1) * cur_plus) & _M64
        cur_mult = (cur_mult * cur_mult) & _M64
    return mults, pluss


# ---------------------------------------------------------------------------
# uint32-pair 64-bit arithmetic (element-wise, works under jit / pallas)
# ---------------------------------------------------------------------------

def _mul64(ah, al, bh, bl):
    """(ah,al) * (bh,bl) mod 2^64 in uint32 pairs."""
    a0 = al & jnp.uint32(0xFFFF)
    a1 = al >> jnp.uint32(16)
    b0 = bl & jnp.uint32(0xFFFF)
    b1 = bl >> jnp.uint32(16)
    a0b0 = a0 * b0
    a0b1 = a0 * b1
    a1b0 = a1 * b0
    mid = (a0b0 >> jnp.uint32(16)) + (a0b1 & jnp.uint32(0xFFFF)) + (
        a1b0 & jnp.uint32(0xFFFF))
    lo = (mid << jnp.uint32(16)) | (a0b0 & jnp.uint32(0xFFFF))
    hi = a1 * b1 + (a0b1 >> jnp.uint32(16)) + (a1b0 >> jnp.uint32(16)) + (
        mid >> jnp.uint32(16))
    hi = hi + al * bh + ah * bl
    return hi, lo


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    hi = ah + bh + carry
    return hi, lo


def _pcg_output(hi, lo):
    """XSH-RR output function of the 64-bit pre-step state (pcg32.h:62-68)."""
    s18_lo = (lo >> jnp.uint32(18)) | (hi << jnp.uint32(14))
    s18_hi = hi >> jnp.uint32(18)
    x_lo = s18_lo ^ lo
    x_hi = s18_hi ^ hi
    xorshifted = (x_lo >> jnp.uint32(27)) | (x_hi << jnp.uint32(5))
    rot = hi >> jnp.uint32(27)  # == state >> 59
    return (xorshifted >> rot) | (
        xorshifted << ((jnp.uint32(32) - rot) & jnp.uint32(31)))


def _uint_to_unit_float(u):
    """uint32 -> float32 in [0,1) via the [1,2) mantissa trick."""
    bits = (u >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0


@functools.partial(jax.jit, static_argnames=("inc", "nbits"))
def pcg32_uniforms_at(state_hi, state_lo, offsets, *, inc: int, nbits: int = 31):
    """Uniforms of the PCG32 stream at absolute positions ``offsets``.

    ``state_hi/lo`` (uint32 scalars) is the stream's base state; position p
    is the value ``next_float()`` would return after ``advance(p)``.  ``inc``
    must be the static stream increment (odd).  ``offsets`` may be any shape
    of uint32 with values < 2^nbits.
    """
    mults, pluss = _advance_tables(inc, nbits)
    offsets = offsets.astype(jnp.uint32)

    acc_mh = jnp.full(offsets.shape, 0, jnp.uint32)
    acc_ml = jnp.full(offsets.shape, 1, jnp.uint32)
    acc_ph = jnp.zeros(offsets.shape, jnp.uint32)
    acc_pl = jnp.zeros(offsets.shape, jnp.uint32)
    for j in range(nbits):
        bit = ((offsets >> jnp.uint32(j)) & jnp.uint32(1)).astype(bool)
        mh = jnp.uint32(int(mults[j, 0]))
        ml = jnp.uint32(int(mults[j, 1]))
        ph = jnp.uint32(int(pluss[j, 0]))
        pl = jnp.uint32(int(pluss[j, 1]))
        nmh, nml = _mul64(acc_mh, acc_ml, mh, ml)
        tph, tpl = _mul64(acc_ph, acc_pl, mh, ml)
        nph, npl = _add64(tph, tpl, ph, pl)
        acc_mh = jnp.where(bit, nmh, acc_mh)
        acc_ml = jnp.where(bit, nml, acc_ml)
        acc_ph = jnp.where(bit, nph, acc_ph)
        acc_pl = jnp.where(bit, npl, acc_pl)

    sh, sl = _mul64(acc_mh, acc_ml, state_hi, state_lo)
    sh, sl = _add64(sh, sl, acc_ph, acc_pl)
    return _uint_to_unit_float(_pcg_output(sh, sl))


def _step_tables(inc: int, block: int) -> tuple[np.ndarray, np.ndarray]:
    """(A_j, C_j) such that advancing j sequential steps maps
    S -> A_j*S + C_j; shape [block, 2] uint32 (hi, lo) pairs."""
    A = np.zeros((block, 2), np.uint32)
    C = np.zeros((block, 2), np.uint32)
    a, c = 1, 0
    for j in range(block):
        A[j] = (a >> 32, a & _M32)
        C[j] = (c >> 32, c & _M32)
        c = (c * PCG32_MULT + inc) & _M64
        a = (a * PCG32_MULT) & _M64
    return A, C


@functools.partial(jax.jit, static_argnames=("n", "inc", "block"))
def pcg32_uniforms_range(state_hi, state_lo, *, n: int, inc: int,
                         block: int = 32):
    """Uniforms at stream positions 0..n-1, cheaply.

    Two-level jump-ahead: positions are i*block + j; the i-strides use the
    O(log) Brown advance on n/block lanes, the j-strides are a static
    unrolled affine expansion -- ~2 u64-multiplies per output instead of
    ~31, which matters because TPU u32 multiplies are emulated on the VPU.
    """
    nb = -(-n // block)
    base_offsets = jnp.arange(nb, dtype=jnp.uint32) * jnp.uint32(block)
    nbits = max(int(nb * block - 1).bit_length(), 1)

    mults, pluss = _advance_tables(inc, nbits)
    acc_mh = jnp.zeros((nb,), jnp.uint32)
    acc_ml = jnp.ones((nb,), jnp.uint32)
    acc_ph = jnp.zeros((nb,), jnp.uint32)
    acc_pl = jnp.zeros((nb,), jnp.uint32)
    for j in range(nbits):
        bit = ((base_offsets >> jnp.uint32(j)) & jnp.uint32(1)).astype(bool)
        mh = jnp.uint32(int(mults[j, 0]))
        ml = jnp.uint32(int(mults[j, 1]))
        ph = jnp.uint32(int(pluss[j, 0]))
        pl = jnp.uint32(int(pluss[j, 1]))
        nmh, nml = _mul64(acc_mh, acc_ml, mh, ml)
        tph, tpl = _mul64(acc_ph, acc_pl, mh, ml)
        nph, npl = _add64(tph, tpl, ph, pl)
        acc_mh = jnp.where(bit, nmh, acc_mh)
        acc_ml = jnp.where(bit, nml, acc_ml)
        acc_ph = jnp.where(bit, nph, acc_ph)
        acc_pl = jnp.where(bit, npl, acc_pl)
    bh, bl = _mul64(acc_mh, acc_ml, state_hi, state_lo)
    bh, bl = _add64(bh, bl, acc_ph, acc_pl)  # states at positions i*block

    A, C = _step_tables(inc, block)
    cols = []
    for j in range(block):
        ah = jnp.uint32(int(A[j, 0]))
        al = jnp.uint32(int(A[j, 1]))
        ch = jnp.uint32(int(C[j, 0]))
        cl = jnp.uint32(int(C[j, 1]))
        sh, sl = _mul64(ah, al, bh, bl)
        sh, sl = _add64(sh, sl, ch, cl)
        cols.append(_uint_to_unit_float(_pcg_output(sh, sl)))
    out = jnp.stack(cols, axis=-1).reshape(nb * block)
    return out[:n]


def frame_uniforms(rng: Pcg32, n_pixels: int, spp: int) -> jnp.ndarray:
    """All per-pixel uniforms for one frame, shape [n_pixels, spp].

    Pixel ``idx`` draw ``j`` equals the reference's
    ``rng.advance(idx*spp); next_float() x(j+1)`` (volrend.cu:157).
    """
    offsets = jnp.arange(n_pixels * spp, dtype=jnp.uint32).reshape(
        n_pixels, spp)
    nbits = max(1, int(n_pixels * spp - 1).bit_length()) if n_pixels * spp > 1 else 1
    u = pcg32_uniforms_at(
        jnp.uint32(rng.state >> 32),
        jnp.uint32(rng.state & _M32),
        offsets,
        inc=rng.inc,
        nbits=nbits,
    )
    return u
