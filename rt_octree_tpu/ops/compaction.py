"""Fast stream compaction (packed index extraction) for the wavefront march.

``jnp.nonzero(mask, size=k)`` lowers to a full-length cumsum on TPU, which
XLA implements as O(log n) shifted-add passes over the whole array -- the
measured cost is ~7 ms at 640k and ~21 ms at 3.2M elements, dominating the
march's compaction stages and the two-tier shade (tools/profile_march2.py).

``fast_nonzero`` replaces it with a two-level scan: per-block (lane-width)
counts, a tiny cumsum over block offsets, an in-block exclusive scan over
the last axis (cheap: lanes), and one scatter of the active indices into
their packed slots.  Semantics match jnp.nonzero(mask, size, fill_value):
ascending active indices, padded with ``fill_value``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BLOCK = 512


def exclusive_rank(mask: jax.Array) -> jax.Array:
    """Exclusive rank of each True entry among the True entries, [n] i32.

    ``rank[i] = #{j < i : mask[j]}`` -- only meaningful where ``mask`` is
    True (callers mask/clamp elsewhere).  Two-level scan, NOT a full-width
    ``jnp.cumsum`` (which XLA lowers to O(log n) whole-array passes,
    ~7 ms at 640k)."""
    n = mask.shape[0]
    if n % _BLOCK or n <= _BLOCK:
        mi = mask.astype(jnp.int32)
        return jnp.cumsum(mi) - mi
    m2 = mask.reshape(-1, _BLOCK)
    mi = m2.astype(jnp.int32)
    cnt = jnp.sum(mi, axis=1)  # [B]
    offs = jnp.cumsum(cnt) - cnt  # [B] exclusive
    within = jnp.cumsum(mi, axis=1) - mi  # [B, BLOCK] exclusive (lane scan)
    return (offs[:, None] + within).reshape(-1)


def fast_nonzero_rank(mask: jax.Array, size: int, fill_value: int):
    """``(fast_nonzero(mask, size, fill_value), exclusive_rank(mask))``
    sharing one rank pass.  ``idx`` and ``rank`` are inverse maps between
    the packed and the full layout: ``idx[rank[i]] == i`` for active ``i``
    with ``rank[i] < size`` -- the march's compaction boundaries use
    ``rank`` to merge child results back by GATHER instead of scatter
    (set-scatter measures ~4x a gather per row)."""
    n = mask.shape[0]
    rank = exclusive_rank(mask)
    if n % _BLOCK or n <= _BLOCK:
        return jnp.nonzero(mask, size=size, fill_value=fill_value)[0], rank
    # inactive lanes and overflow actives land in the sacrificial slot
    pos = jnp.where(mask, jnp.minimum(rank, size), size)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    out = jnp.full((size + 1,), fill_value, jnp.int32)
    out = out.at[pos].set(idx, mode="drop", unique_indices=False)
    return out[:size], rank


def fast_nonzero(mask: jax.Array, size: int, fill_value: int) -> jax.Array:
    """Packed ascending indices of True entries, shape [size] int32.

    Equivalent to ``jnp.nonzero(mask, size=size, fill_value=fill_value)[0]``
    for 1-D boolean ``mask``.  Entries beyond ``size`` actives are dropped
    (callers guard with a count check, as the march schedule does).
    """
    n = mask.shape[0]
    if n % _BLOCK or n <= _BLOCK:
        return jnp.nonzero(mask, size=size, fill_value=fill_value)[0]
    return fast_nonzero_rank(mask, size, fill_value)[0]


def partition_indices(first: jax.Array, second: jax.Array, cap_f: int,
                      cap_s: int, fill_value: int):
    """Packed ascending indices of TWO masks in ONE scatter pass.

    Returns ``(idx_f [cap_f], idx_s [cap_s])`` -- each equivalent to
    ``fast_nonzero`` over its mask (``second`` is taken as
    ``second & ~first``, so overlapping entries land in the first list).
    The scatter over the input rows is the cost floor of any packed-index
    extraction on TPU, so fusing both lists into one scatter makes the
    second list ~free -- the march's shade-on-death boundaries pack the
    surviving rays AND the just-died hit rays from the same pass.
    Entries beyond each cap are dropped (callers guard with count
    checks)."""
    n = first.shape[0]
    sec = second & ~first
    rank_f = exclusive_rank(first)
    rank_s = exclusive_rank(sec)
    # layout: [0, cap_f) first list | cap_f first-sacrificial |
    #         [cap_f+1, cap_f+1+cap_s) second list | shared sacrificial
    sacr = cap_f + 1 + cap_s
    pos = jnp.where(
        first, jnp.minimum(rank_f, cap_f),
        jnp.where(sec, cap_f + 1 + jnp.minimum(rank_s, cap_s), sacr))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    out = jnp.full((sacr + 1,), fill_value, jnp.int32)
    out = out.at[pos].set(idx, mode="drop", unique_indices=False)
    return out[:cap_f], out[cap_f + 1:cap_f + 1 + cap_s]
