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


def _fast_cumsum_ex(x: jax.Array) -> jax.Array:
    """Exclusive cumsum of a 1-D int32 array, block-scanned to avoid
    XLA's full-length log-pass lowering (cheap lane scans + a tiny
    cross-block cumsum)."""
    n = x.shape[0]
    if n % _BLOCK or n <= _BLOCK:
        return jnp.cumsum(x) - x
    x2 = x.reshape(-1, _BLOCK)
    within = jnp.cumsum(x2, axis=1) - x2
    bsum = jnp.sum(x2, axis=1)
    boffs = jnp.cumsum(bsum) - bsum
    return (boffs[:, None] + within).reshape(-1)


def _fast_cummax_inc(x: jax.Array) -> jax.Array:
    """Inclusive running max of a 1-D int32 array (block-scanned)."""
    n = x.shape[0]
    if n % _BLOCK or n <= _BLOCK:
        return jax.lax.cummax(x)
    x2 = x.reshape(-1, _BLOCK)
    within = jax.lax.cummax(x2, axis=1)
    bmax = within[:, -1]
    carry = jax.lax.cummax(bmax)
    carry = jnp.concatenate([jnp.full((1,), jnp.iinfo(jnp.int32).min,
                                      jnp.int32), carry[:-1]])
    return jnp.maximum(within, carry[:, None]).reshape(-1)


def packed_segments(counts: jax.Array, size: int):
    """Packed (owner, rank) pairs for per-row variable-length segments.

    ``counts`` [N] int32 >= 0; conceptually row i owns ``counts[i]``
    consecutive output items.  Returns (owner [size], rank [size], total):
    the packed list of (row index, position within row) in row order,
    padded with owner == N beyond ``total`` (or beyond ``size`` on
    overflow).  Replaces nonzero over the flattened [N, K] mask -- the
    scatter here is N rows instead of N*K (the mask version's cost is
    dominated by its full-length scatter), plus a running-max
    forward-fill over the packed side.

    Currently a tested building block without a production caller: the
    shade path that used it moved to a single hit-ray compaction
    (render/renderer.py _shade), but the primitive (and its block-scan
    helpers) is the planned mechanism for any future segment-packed
    gather stage.
    """
    n = counts.shape[0]
    offs = _fast_cumsum_ex(counts)
    total = offs[-1] + counts[-1]
    has = counts > 0
    pos = jnp.where(has, jnp.minimum(offs, size), size)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    starts = jnp.zeros((size + 1,), jnp.int32)
    starts = starts.at[pos].max(idx + 1, mode="drop")[:size]
    # forward-fill: packed slot p belongs to the latest row whose segment
    # started at or before p
    owner = _fast_cummax_inc(starts) - 1
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0).reshape(-1)
    owner = jnp.where(iota_p < jnp.minimum(total, size), owner, n)
    owner_c = jnp.clip(owner, 0, n - 1)
    rank = iota_p - jnp.take(offs, owner_c)
    return owner, rank, total


def fast_nonzero(mask: jax.Array, size: int, fill_value: int) -> jax.Array:
    """Packed ascending indices of True entries, shape [size] int32.

    Equivalent to ``jnp.nonzero(mask, size=size, fill_value=fill_value)[0]``
    for 1-D boolean ``mask``.  Entries beyond ``size`` actives are dropped
    (callers guard with a count check, as the march schedule does).
    """
    n = mask.shape[0]
    if n % _BLOCK or n <= _BLOCK:
        return jnp.nonzero(mask, size=size, fill_value=fill_value)[0]
    m2 = mask.reshape(-1, _BLOCK)
    mi = m2.astype(jnp.int32)
    cnt = jnp.sum(mi, axis=1)  # [B]
    offs = jnp.cumsum(cnt) - cnt  # [B] exclusive
    within = jnp.cumsum(mi, axis=1) - mi  # [B, BLOCK] exclusive (lane scan)
    pos = offs[:, None] + within  # [B, BLOCK]
    # inactive lanes and overflow actives land in the sacrificial slot
    pos = jnp.where(m2, jnp.minimum(pos, size), size).reshape(-1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(-1)
    out = jnp.full((size + 1,), fill_value, jnp.int32)
    out = out.at[pos].set(idx, mode="drop", unique_indices=False)
    return out[:size]
