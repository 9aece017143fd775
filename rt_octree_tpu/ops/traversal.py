"""Batched octree traversal on device.

Reference semantics: renderer/include/volrend/internal/n3tree_query.hpp:13-48
(stackless root-to-leaf descent).  TPU redesign: the per-thread pointer
chase becomes a fixed-depth vectorized descent over whole ray batches (one
[R]-shaped int gather per level), optionally short-circuited by a dense
jump LUT (io/n3tree.py JumpLut) that resolves the first ``lut_levels``
levels with a single gather -- leaves above that depth (all of empty
space) finish in one lookup.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..io.n3tree import JumpLut, N3Tree, build_jump_lut

LUT_PTR_BITS = 27
LUT_DEPTH_SENTINEL = (1 << 5) - 1  # depth field all-ones => internal node
# opt-in f16 pair-packed data layout; measured a net loss in the real
# shade path (see upload_tree) so it defaults off
PAIR_PACK_DATA = False


@flax.struct.dataclass
class DeviceTree:
    """Device-resident tree arrays + static metadata.

    Array fields are pytree leaves; metadata fields are static (hashable)
    so jit re-specializes per tree topology class.
    """

    # shading data rows; read through take_data_rows, never jnp.take
    # directly (the accessor owns the optional pair-packed layout,
    # see PAIR_PACK_DATA / upload_tree)
    data: jax.Array  # [M, data_dim] raw, or [M, P] f32 pair-packed
    child: jax.Array  # [M] i32
    sigma: jax.Array  # [M] f16 (compact copy of data[:, -1])
    # fused march rows: one 8-byte gather yields (link, sigma) --
    # chs[:, 0] = child skip, chs[:, 1] = f32 sigma bits
    chs: jax.Array  # [M, 2] i32
    offset: jax.Array  # [3] f32
    scale: jax.Array  # [3] f32
    extra: jax.Array  # [E] f32 (SG/ASG) or [0]
    # lut[:, 0] = packed (depth<<27 | ptr); lut[:, 1] = f32 sigma bits of
    # the shallow leaf (0 when the cell is still internal at lut_levels)
    lut: jax.Array  # [res^3, 2] i32, or [0, 2]
    # brick rows at level brick_levels (requires max_depth <= levels+2):
    # [header packed, header sigma, 64x subcell sigma, 64x subcell packed]
    brick: jax.Array  # [resL^3, 130] i32, or [0, 130]

    N: int = flax.struct.field(pytree_node=False)
    data_dim: int = flax.struct.field(pytree_node=False)
    basis_dim: int = flax.struct.field(pytree_node=False)
    fmt: int = flax.struct.field(pytree_node=False)  # BasisFormat.value
    max_depth: int = flax.struct.field(pytree_node=False)
    lut_levels: int = flax.struct.field(pytree_node=False)
    brick_levels: int = flax.struct.field(pytree_node=False, default=0)
    # Deep trees (max_depth > dense-brick capacity): the brick table is
    # SPARSE -- one row per LUT cell still internal at lut_levels, found
    # through the cell's LUT sigma lane (brick_idx + 1; the +1 keeps the
    # lane positive so the skip-distance transform treats internal cells
    # as occupied).  Shallow cells synthesize their brick from the LUT
    # row itself (a leaf covers the whole cell).
    brick_indirect: bool = flax.struct.field(pytree_node=False,
                                             default=False)
    # empty-space skip radius cap: when > 0, the LUT's sigma lane of empty
    # cells holds the Chebyshev distance (in cells, 1..cap) to the nearest
    # occupied cell, encoded as an f32 denormal (bits 1..255, ~1e-43).
    # The threshold test is untouched for any sigma_thresh > 0; at
    # exactly sigma_thresh == 0 the denormal compares greater, flipping
    # has_sigma true on empty cells -- harmless only because the induced
    # optical depth delta*sigma is ~1e-40 and crosses no threshold.
    skip_cap: int = flax.struct.field(pytree_node=False, default=0)
    # (width, height, focal) or None
    ndc: Optional[tuple] = flax.struct.field(pytree_node=False, default=None)
    # data rows are f16-pair-packed into f32 lanes (see ``data``)
    data_paired: bool = flax.struct.field(pytree_node=False, default=False)

    @property
    def N3(self) -> int:
        return self.N ** 3


def pack_lut(lut: JumpLut) -> Optional[np.ndarray]:
    """Pack (ptr, depth) into one int32; None if pointers don't fit."""
    if lut.ptr.max(initial=0) >= (1 << LUT_PTR_BITS):
        return None
    depth = np.where(lut.depth == JumpLut.SENTINEL,
                     np.int32(LUT_DEPTH_SENTINEL), lut.depth.astype(np.int32))
    return ((depth << LUT_PTR_BITS) | lut.ptr.astype(np.int32)).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("N", "N3", "levels",
                                              "n_chunks"))
def _device_lut_build(chs, *, N: int, N3: int, levels: int, n_chunks: int):
    """Build the packed jump LUT on device: a vectorized descent per cell
    of the res^3 grid.  Avoids uploading a GB-scale host-built LUT over
    slow host->device links (the chs table it derives from is ~10x
    smaller)."""
    res = N ** levels
    n_cells = res ** 3
    fN = float(N)

    def build_chunk(cell0):
        idx = cell0 + jnp.arange(n_cells // n_chunks, dtype=jnp.int32)
        z = idx % res
        y = (idx // res) % res
        x = idx // (res * res)
        node = jnp.zeros_like(idx)
        out_ptr = jnp.zeros_like(idx)
        out_depth = jnp.full_like(idx, LUT_DEPTH_SENTINEL)
        sig = jnp.zeros_like(idx)
        done = jnp.zeros(idx.shape, bool)
        for lev in range(levels):
            div = N ** (levels - 1 - lev)
            cx = (x // div) % N
            cy = (y // div) % N
            cz = (z // div) % N
            ci = (cx * N + cy) * N + cz
            sub = node * N3 + ci
            row = jnp.take(chs, jnp.where(done, 0, sub), axis=0)
            skip = row[:, 0]
            is_leaf = (skip == 0) & ~done
            out_ptr = jnp.where(is_leaf, sub, out_ptr)
            out_depth = jnp.where(is_leaf, lev + 1, out_depth)
            sig = jnp.where(is_leaf, row[:, 1], sig)
            done = done | is_leaf
            node = jnp.where(done, node, node + skip)
        out_ptr = jnp.where(done, out_ptr, node)
        packed = (out_depth << LUT_PTR_BITS) | out_ptr
        return jnp.stack([packed, sig], axis=-1)

    cell0s = jnp.arange(n_chunks, dtype=jnp.int32) * (n_cells // n_chunks)
    out = jax.lax.map(build_chunk, cell0s)
    return out.reshape(n_cells, 2)


def add_skip_distances_np(lut: np.ndarray, res: int, cap: int = 12):
    """NumPy twin of the device skip-distance build (for oracle parity
    tests): chamfer min-filter iterations computing the Chebyshev distance
    to the nearest occupied (sigma > 0) cell, stored into the sigma lane
    of empty cells as an integer in [1, cap]."""
    occ = (lut[:, 1] != 0).reshape(res, res, res)
    INF = np.int32(cap + 1)
    d = np.where(occ, 0, INF).astype(np.int32)
    for _ in range(cap):
        p = np.pad(d, 1, constant_values=INF)
        m = d
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    if dx == dy == dz == 0:
                        continue
                    m = np.minimum(
                        m, p[1 + dx:res + 1 + dx, 1 + dy:res + 1 + dy,
                             1 + dz:res + 1 + dz] + 1)
        d = np.minimum(d, m)
    d = np.minimum(d, cap).reshape(-1)
    out = lut.copy()
    empty = ~occ.reshape(-1)
    out[:, 1] = np.where(empty, d.astype(np.int32), lut[:, 1])
    return out


@functools.partial(jax.jit, static_argnames=("res", "cap"), donate_argnums=0)
def _add_skip_distances(lut, *, res: int, cap: int = 12):
    """Device Chebyshev distance transform folded into the LUT sigma lane.

    Exactness contract (consumed by the march's empty-space jump): a cell
    holding distance d guarantees every cell within Chebyshev radius d-1
    has leaf sigma <= 0, so a ray may advance to the boundary of that
    (2d-1)^3 cell cube in one step; the reference's per-leaf epsilon does
    not accumulate across steps (each step lands at geometric boundary +
    one epsilon), so the jump reproduces the reference t bit-near.
    """
    # occupancy from the INT bits, not the float: XLA flushes denormals
    # to zero, so a float compare would misread sub-255 integer lanes
    # (sparse-brick indices) as empty and clobber them with distances.
    # bits == 0 <=> sigma exactly +0.0f <=> nothing to witness.
    occ = (lut[:, 1] != 0).reshape(res, res, res)
    INF = jnp.int32(cap + 1)
    d = jnp.where(occ, 0, INF)

    def body(_, d):
        m = jax.lax.reduce_window(
            d, INF, jax.lax.min, (3, 3, 3), (1, 1, 1), "SAME")
        return jnp.minimum(d, m + 1)

    d = jax.lax.fori_loop(0, cap, body, d)
    d = jnp.minimum(d, cap).reshape(-1)
    empty = ~occ.reshape(-1)
    lane1 = jnp.where(empty, d, lut[:, 1])
    return jnp.stack([lut[:, 0], lane1], axis=-1)


def build_brick_table(chs_dev, N: int, N3: int, max_depth: int,
                      brick_levels: int):
    """Device-side brick build: regroup the full-depth LUT into cell-major
    4x4x4 blocks of (sigma, packed-leaf) pairs.

    Row layout [resL^3, 128]: lanes 0..63 = subcell sigma bits (subcell
    index (a*4+b)*4+c), lanes 64..127 = subcell packed (depth<<27 | ptr).
    Exactly 128 lanes = one TPU lane tile, no padding waste.  A row fully
    describes the leaves under the level-L cell because the full-depth
    LUT replicates leaves shallower than the grid into each covered cell.

    Built with a flat index-permutation gather (a multi-small-dim reshape
    would explode under TPU tile padding)."""
    assert max_depth - brick_levels == 2 and N == 2
    resF = N ** max_depth
    resL = N ** brick_levels
    n_chunks = 1
    while (resF ** 3) // n_chunks > (1 << 24):
        n_chunks *= 2
    lut_full = _device_lut_build(chs_dev, N=N, N3=N3, levels=max_depth,
                                 n_chunks=n_chunks)

    n_total = resL ** 3 * 64

    @functools.partial(jax.jit, static_argnames=("nc",))
    def regroup(lut_full, *, nc: int):
        def chunk(i0):
            idx = i0 + jnp.arange(n_total // nc, dtype=jnp.int32)
            cell = idx >> 6
            sub = idx & 63
            a, b, c = (sub >> 4) & 3, (sub >> 2) & 3, sub & 3
            z7 = cell % resL
            y7 = (cell // resL) % resL
            x7 = cell // (resL * resL)
            flatF = (((x7 * 4 + a) * resF + (y7 * 4 + b)) * resF +
                     (z7 * 4 + c))
            return jnp.take(lut_full, flatF, axis=0)  # [n/nc, 2]

        i0s = jnp.arange(nc, dtype=jnp.int32) * (n_total // nc)
        body = jax.lax.map(chunk, i0s).reshape(resL ** 3, 64, 2)
        return jnp.concatenate([body[:, :, 1], body[:, :, 0]], axis=1)

    nc = 1
    while n_total // nc > (1 << 24):
        nc *= 2
    out = regroup(lut_full, nc=nc)
    out.block_until_ready()
    del lut_full
    return out


@functools.partial(jax.jit, static_argnames=("K", "L"))
def _device_sparse_brick_build(chs, node_ptr, *, K: int, L: int):
    """Brick rows for K level-L cells that are still INTERNAL: descend
    the two remaining levels (L+1, L+2) for each of the 64 subcells from
    each cell's node pointer.  Row layout identical to the dense table
    (build_brick_table): lanes 0..63 sigma bits, 64..127 packed."""
    sub64 = jnp.arange(64, dtype=jnp.int32)[None, :]  # [1, 64]
    a, b, c = (sub64 >> 4) & 3, (sub64 >> 2) & 3, sub64 & 3
    d1 = ((a >> 1) * 2 + (b >> 1)) * 2 + (c >> 1)  # child digit at L+1
    d2 = ((a & 1) * 2 + (b & 1)) * 2 + (c & 1)     # child digit at L+2

    node = node_ptr[:, None]                        # [K, 1]
    sub1 = node * 8 + d1                            # [K, 64]
    row1 = jnp.take(chs, sub1.reshape(-1), axis=0).reshape(K, 64, 2)
    skip1 = row1[..., 0]
    leaf1 = skip1 == 0
    node2 = node + skip1
    sub2 = node2 * 8 + d2
    row2 = jnp.take(chs, jnp.where(leaf1, 0, sub2).reshape(-1),
                    axis=0).reshape(K, 64, 2)
    packed = jnp.where(
        leaf1, (jnp.int32(L + 1) << LUT_PTR_BITS) | sub1,
        (jnp.int32(L + 2) << LUT_PTR_BITS) | sub2)
    sig = jnp.where(leaf1, row1[..., 1], row2[..., 1])
    return jnp.concatenate([sig, packed], axis=1)  # [K, 128]


def upload_tree(tree: N3Tree, lut_levels: int = 7,
                device=None, lut_on_device: bool = True,
                brick: bool = True, skip_cap: int = 12,
                force_sparse_brick: bool = False) -> DeviceTree:
    """Host tree -> device arrays.  ``lut_levels=0`` disables the LUT;
    ``brick`` additionally builds the 4x4x4 leaf-block table used by the
    fast march: DENSE (anchored at max_depth-2, full-depth LUT
    semantics) for trees with max_depth <= 9, SPARSE/indirect (one row
    per internal LUT cell) for deeper trees up to max_depth ==
    lut_levels + 2 <= 11.  Trees deeper than 11, or with sub-pointer
    counts >= 2^27 (which the packed LUT cannot address), fall back
    EXPLICITLY (stderr warning) to partial-LUT marching with continued
    descent -- slower, never wrong (the reference accepts any depth,
    n3tree.cpp:270-277).  When the LUT witnesses full occupancy (full
    depth, or deep trees with indirect bricks), ``skip_cap > 0`` bakes
    Chebyshev empty-space skip distances into the LUT
    (see _add_skip_distances).  ``force_sparse_brick`` exercises the
    sparse path on shallow trees (tests)."""
    import sys as _sys

    sigma_np = np.ascontiguousarray(tree.data[:, tree.data_dim - 1])
    sigma_bits = sigma_np.astype(np.float32).view(np.int32)
    chs = np.stack([tree.child, sigma_bits], axis=-1)  # [M, 2] i32

    sparse_brick = brick and tree.N == 2 and tree.max_depth >= 3 and (
        tree.max_depth > 9 or force_sparse_brick)
    lut_arr = np.zeros((0, 2), np.int32)
    eff_levels = 0
    device_lut = None
    if lut_levels > 0 and tree.max_depth > 0:
        lut_levels = min(lut_levels, tree.max_depth)
        if sparse_brick:
            # anchor the LUT at the sparse-brick level (memory-capped)
            lut_levels = min(lut_levels, tree.max_depth - 2, 9)
            sparse_brick = lut_levels == tree.max_depth - 2
        max_ptr = max(tree.child.shape[0], 1)
        if max_ptr < (1 << LUT_PTR_BITS):
            if lut_on_device:
                device_lut = True
                eff_levels = lut_levels
            else:
                lut = build_jump_lut(tree, lut_levels)
                packed = pack_lut(lut)
                if packed is not None:
                    shallow = lut.depth != JumpLut.SENTINEL
                    lut_sigma = np.where(shallow, sigma_bits[lut.ptr], 0)
                    lut_arr = np.stack([packed, lut_sigma], axis=-1)
                    eff_levels = lut.levels
        else:
            print(f"[rt-octree] tree has {max_ptr} sub-pointers >= 2^"
                  f"{LUT_PTR_BITS}: packed jump LUT unavailable, "
                  "marching by per-level descent (slow path)",
                  file=_sys.stderr)
    if tree.max_depth > 11 and brick:
        print(f"[rt-octree] max_depth {tree.max_depth} > 11: no brick "
              "table (dense needs <= 9, sparse <= 11); marching "
              f"thin with a level-{eff_levels} LUT + descent",
              file=_sys.stderr)

    extra = tree.extra if tree.extra is not None else np.zeros(0, np.float32)
    ndc = None
    if tree.use_ndc and tree.ndc_width > 0:
        ndc = (float(tree.ndc_width), float(tree.ndc_height),
               float(tree.ndc_focal))

    put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
    chs_dev = put(chs)
    if device_lut:
        N3 = tree.N3
        n_cells = (tree.N ** eff_levels) ** 3
        n_chunks = 1
        while n_cells // n_chunks > (1 << 24):
            n_chunks *= 2
        lut_dev = _device_lut_build(chs_dev, N=tree.N, N3=N3,
                                    levels=eff_levels, n_chunks=n_chunks)
    else:
        lut_dev = put(lut_arr)

    brick_levels = 0
    brick_indirect = False
    brick_dev = jnp.zeros((0, 128), jnp.int32)
    can_ptr = tree.child.shape[0] < (1 << LUT_PTR_BITS)
    if (not sparse_brick and brick and tree.N == 2 and eff_levels > 0
            and 3 <= tree.max_depth <= 9 and can_ptr):
        # dense brick table: (2^(d-2))^3 * 512B -> cap at depth 9 (~1GB)
        bl = tree.max_depth - 2
        brick_dev = build_brick_table(chs_dev, tree.N, tree.N3,
                                      tree.max_depth, bl)
        brick_levels = bl
    elif sparse_brick and eff_levels > 0 and can_ptr:
        # sparse/indirect bricks: one row per LUT cell still internal at
        # lut_levels; the row index + 1 rides in that cell's sigma lane
        from .compaction import fast_nonzero
        n_cells = (tree.N ** eff_levels) ** 3
        depth_f = (lut_dev[:, 0] >> LUT_PTR_BITS) & LUT_DEPTH_SENTINEL
        flags = depth_f == LUT_DEPTH_SENTINEL
        K = int(jnp.sum(flags.astype(jnp.int32)))
        if K > 0:
            idx = fast_nonzero(flags, K, n_cells)
            node_ptrs = jnp.take(lut_dev[:, 0], idx) & (
                (1 << LUT_PTR_BITS) - 1)
            brick_dev = _device_sparse_brick_build(
                chs_dev, node_ptrs, K=K, L=eff_levels)
            lut_dev = lut_dev.at[idx, 1].set(
                jnp.arange(1, K + 1, dtype=jnp.int32))
            brick_levels = eff_levels
            brick_indirect = True

    # empty-space skip distances need the LUT to witness occupancy:
    # full depth, or a sparse-brick LUT (internal cells hold brick_idx+1
    # in the sigma lane, i.e. positive == occupied); runs AFTER the
    # brick-index write so internal cells are never treated as empty
    eff_skip = 0
    if skip_cap > 0 and eff_levels > 0 and (
            eff_levels == tree.max_depth or brick_indirect):
        lut_dev = _add_skip_distances(
            lut_dev, res=tree.N ** eff_levels, cap=skip_cap)
        eff_skip = skip_cap
    data_np = tree.data
    # Pair-packing f16 rows into f32 lanes makes the bare data gather
    # ~9% cheaper (tools/round4_gather2.py) but the in-path decode costs
    # more than it saves: the production _shade_sbuf measured 33.3 ms
    # raw vs 42.5 ms paired at bench widths (tools/round4_shade2.py).
    # Kept as an opt-in for future layouts where the decode can fuse.
    data_paired = PAIR_PACK_DATA and data_np.dtype == np.float16
    if data_paired:
        dd = data_np.shape[-1]
        if dd % 2:  # pad to an even lane count for the f32 pairing
            data_np = np.concatenate(
                [data_np, np.zeros((data_np.shape[0], 1), np.float16)],
                axis=1)
        data_np = np.ascontiguousarray(data_np).view(np.float32)
    return DeviceTree(
        data=put(data_np),
        child=put(tree.child),
        sigma=put(sigma_np),
        chs=chs_dev,
        offset=put(tree.offset),
        scale=put(tree.scale),
        extra=put(np.asarray(extra, np.float32)),
        lut=lut_dev,
        brick=brick_dev,
        N=tree.N,
        data_dim=tree.data_dim,
        basis_dim=tree.data_format.basis_dim,
        fmt=tree.data_format.format.value,
        max_depth=max(tree.max_depth, 1),
        lut_levels=eff_levels,
        brick_levels=brick_levels,
        brick_indirect=brick_indirect,
        skip_cap=eff_skip,
        ndc=ndc,
        data_paired=data_paired,
    )


def take_data_rows(tree: DeviceTree, idx) -> jnp.ndarray:
    """Gather shading data rows by leaf index -> [len(idx), data_dim]
    f32, decoding the opt-in f16-pair-packed layout when present
    (PAIR_PACK_DATA; off by default -- the decode measured a net loss
    in the production shade, tools/round4_shade2.py)."""
    rows = jnp.take(tree.data, idx, axis=0)
    if tree.data_paired:
        h = jax.lax.bitcast_convert_type(rows, jnp.float16)
        rows = h.reshape(rows.shape[0], -1)[:, :tree.data_dim]
    return rows.astype(jnp.float32)


def tree_query_full(tree: DeviceTree, pos: jnp.ndarray, active=None,
                    with_bits: bool = False):
    """Vectorized root-to-leaf query.

    pos: [R, 3] tree-space coordinates in [0, 1].
    Returns (sub_ptr [R] i32, cube_sz [R] f32, local [R,3] f32,
    sigma [R] f32) where ``local`` is the position inside the leaf cube in
    [0,1) -- the same in-place-mutated xyz the reference query leaves
    behind (n3tree_query.hpp:29-33), which rt_core.cuh:249 feeds to
    _dda_unit.  Sigma rides along from the fused (child, sigma) rows so
    the march needs no extra gather.
    """
    N = tree.N
    fN = float(N)
    N3 = tree.N3
    R = pos.shape[0]
    pos = jnp.clip(pos, 0.0, 1.0 - 1e-6)

    if active is None:
        active = jnp.ones(R, bool)

    if tree.lut_levels > 0:
        res = N ** tree.lut_levels
        cell = jnp.floor(pos * res).astype(jnp.int32)
        cell = jnp.clip(cell, 0, res - 1)
        flat = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
        flat = jnp.where(active, flat, 0)
        row = jnp.take(tree.lut, flat, axis=0)  # [R, 2]
        e = row[:, 0]
        sigma_bits = row[:, 1]
        depth = (e >> LUT_PTR_BITS) & LUT_DEPTH_SENTINEL
        ptr_e = e & ((1 << LUT_PTR_BITS) - 1)
        shallow = depth < LUT_DEPTH_SENTINEL

        done = shallow
        sub_ptr = jnp.where(shallow, ptr_e, 0)
        cube = jnp.where(shallow, jnp.exp2(depth.astype(jnp.float32) *
                                           np.log2(fN)), 0.0)
        # continued descent state for deep cells
        node_ptr = jnp.where(shallow, 0, ptr_e)
        xyz = pos * res - jnp.floor(pos * res)
        cur_cube = jnp.full((R,), float(N ** (tree.lut_levels + 1)),
                            jnp.float32)
        start_level = tree.lut_levels
    else:
        done = jnp.zeros(R, bool)
        sub_ptr = jnp.zeros(R, jnp.int32)
        cube = jnp.zeros(R, jnp.float32)
        node_ptr = jnp.zeros(R, jnp.int32)
        xyz = pos
        cur_cube = jnp.full((R,), fN, jnp.float32)
        start_level = 0
        sigma_bits = jnp.zeros(R, jnp.int32)

    for _ in range(tree.max_depth - start_level):
        xyzN = xyz * fN
        digit = jnp.floor(xyzN)
        index = ((digit[:, 0] * fN + digit[:, 1]) * fN +
                 digit[:, 2]).astype(jnp.int32)
        sub = node_ptr * N3 + index
        row = jnp.take(tree.chs, jnp.where(done | ~active, 0, sub), axis=0)
        skip = row[:, 0]
        is_leaf = (skip == 0) & ~done
        sub_ptr = jnp.where(is_leaf, sub, sub_ptr)
        cube = jnp.where(is_leaf, cur_cube, cube)
        sigma_bits = jnp.where(is_leaf, row[:, 1], sigma_bits)
        done = done | is_leaf
        node_ptr = jnp.where(done, node_ptr, node_ptr + skip)
        xyz = xyzN - digit
        cur_cube = cur_cube * fN

    # leaf-local coordinates: frac(pos * cube) (exact for N=2)
    local = pos * cube[:, None]
    local = local - jnp.floor(local)
    sigma = jax.lax.bitcast_convert_type(sigma_bits, jnp.float32)
    if with_bits:
        return sub_ptr, cube, local, sigma, sigma_bits
    return sub_ptr, cube, local, sigma


def tree_query(tree: DeviceTree, pos: jnp.ndarray, active=None):
    """Query without sigma (see tree_query_full)."""
    sub_ptr, cube, local, _ = tree_query_full(tree, pos, active)
    return sub_ptr, cube, local
