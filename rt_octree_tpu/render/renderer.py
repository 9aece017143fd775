"""Batched regular-tracking volume renderer (the paper's core) in JAX.

Reference semantics: renderer/include/volrend/cuda/rt_core.cuh:195-332
(trace_ray), renderer/src/cuda/volrend.cu:84-213 (render_kernel incl. the
8-channel aux buffer contract), :236-285 (SPP dispatch).

TPU redesign: one CUDA thread per pixel becomes one SIMD lane per ray.
The data-dependent march is a `lax.while_loop` whose body advances *every*
ray one leaf step (DDA + masked LUT descent + threshold crossing), so the
loop trip count is the max leaf-crossing count over the ray batch; frames
are processed in row chunks (lax.map) so sky-dominated chunks exit early.
Distinct-hit-leaf deduplication (rt_core.cuh:254-266) is kept: each
crossing event appends (leaf_ptr, crossing_count) to fixed [R, SPP] slots,
and spherical-harmonic colors are evaluated once per distinct leaf after
the march -- large gathers + one einsum instead of per-step shading.
"""

from __future__ import annotations

import functools
import typing
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.options import RenderOptions
from ..io.n3tree import BasisFormat
from ..ops.compaction import (fast_nonzero, fast_nonzero_rank,
                              partition_indices)
from ..models.guidance_net import GuidanceNetCompact, GuidanceNetConfig
from ..ops.filtering import guided_filter
from ..ops.sh import eval_asg_basis, eval_sg_basis, eval_sh_basis
from ..ops.traversal import (
    LUT_DEPTH_SENTINEL, LUT_PTR_BITS, DeviceTree, take_data_rows,
    tree_query_full)
from ..utils.rng import Pcg32, pcg32_uniforms_range


class FrozenOptions(typing.NamedTuple):
    """Hashable static snapshot of RenderOptions for jit specialization."""
    step_size: float
    sigma_thresh: float
    stop_thresh: float
    background_brightness: float
    render_bbox: tuple
    basis_minmax: tuple
    rot_dirs: tuple
    denoise: bool
    spp: int
    estimator: str = "rt"

    @staticmethod
    def from_options(opt: RenderOptions) -> "FrozenOptions":
        return FrozenOptions(
            step_size=float(opt.step_size),
            sigma_thresh=float(opt.sigma_thresh),
            stop_thresh=float(opt.stop_thresh),
            background_brightness=float(opt.background_brightness),
            render_bbox=tuple(opt.render_bbox),
            basis_minmax=tuple(opt.basis_minmax),
            rot_dirs=tuple(opt.rot_dirs),
            denoise=bool(opt.denoise),
            spp=int(opt.spp),
            estimator=str(getattr(opt, "estimator", "rt")),
        )


# ---------------------------------------------------------------------------
# ray setup
# ---------------------------------------------------------------------------

def device_camera_rays(transform: jnp.ndarray, width: int, height: int,
                       fx: float, fy: float):
    """Per-pixel world rays on device (volrend.cu:24-34; integer pixel
    coords, no half-pixel offset).  transform: [3,4] c2w."""
    ix = jnp.arange(width, dtype=jnp.float32)
    iy = jnp.arange(height, dtype=jnp.float32)
    x = (ix[None, :] - 0.5 * width) / fx
    y = -(iy[:, None] - 0.5 * height) / fy
    xyz = jnp.stack([
        jnp.broadcast_to(x, (height, width)),
        jnp.broadcast_to(y, (height, width)),
        jnp.full((height, width), -1.0, jnp.float32),
    ], axis=-1).reshape(-1, 3)
    R = transform[:, :3]
    # elementwise mat-vec: keeps f32 exactness on TPU (MXU matmuls default
    # to bf16 inputs, which perturbs ray directions enough to change leaf
    # visit sequences vs the scalar oracle)
    dirs = (xyz[:, 0:1] * R[:, 0][None, :] + xyz[:, 1:2] * R[:, 1][None, :] +
            xyz[:, 2:3] * R[:, 2][None, :])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cen = jnp.broadcast_to(transform[:, 3], dirs.shape)
    return dirs, cen


def rodrigues_jnp(aa, dirs):
    """volrend.cu:58-73."""
    aa = jnp.asarray(aa, jnp.float32)
    angle = jnp.linalg.norm(aa)
    safe_angle = jnp.maximum(angle, 1e-12)
    k = aa / safe_angle
    cos_a, sin_a = jnp.cos(angle), jnp.sin(angle)
    cross = jnp.cross(jnp.broadcast_to(k, dirs.shape), dirs)
    dot = jnp.sum(dirs * k, axis=-1)
    rotated = (dirs * cos_a + cross * sin_a +
               k[None, :] * dot[:, None] * (1.0 - cos_a))
    return jnp.where(angle < 1e-6, dirs, rotated)


def maybe_world2ndc(tree: DeviceTree, dirs, cens):
    """LLFF NDC warp (volrend.cu:35-56); no-op unless the tree has NDC."""
    if tree.ndc is None:
        return dirs, cens
    w, h, focal = tree.ndc
    t = -(1.0 + cens[:, 2]) / dirs[:, 2]
    cens = cens + t[:, None] * dirs
    d0 = -((2 * focal) / w) * (dirs[:, 0] / dirs[:, 2] -
                               cens[:, 0] / cens[:, 2])
    d1 = -((2 * focal) / h) * (dirs[:, 1] / dirs[:, 2] -
                               cens[:, 1] / cens[:, 2])
    d2 = -2.0 / cens[:, 2]
    c0 = -((2 * focal) / w) * (cens[:, 0] / cens[:, 2])
    c1 = -((2 * focal) / h) * (cens[:, 1] / cens[:, 2])
    c2 = 1.0 + 2.0 / cens[:, 2]
    ndirs = jnp.stack([d0, d1, d2], -1)
    ndirs = ndirs / jnp.linalg.norm(ndirs, axis=-1, keepdims=True)
    return ndirs, jnp.stack([c0, c1, c2], -1)


# ---------------------------------------------------------------------------
# the march
# ---------------------------------------------------------------------------

def _dda_world(cen, invdir, bbox):
    """[R] tmin/tmax against the render bbox (rt_core.cuh:20-36)."""
    t1 = (jnp.asarray(bbox[:3]) + 1e-6 - cen) * invdir
    t2 = (jnp.asarray(bbox[3:]) - 1e-6 - cen) * invdir
    tmin = jnp.maximum(0.0, jnp.minimum(t1, t2).max(-1))
    tmax = jnp.minimum(1e4, jnp.maximum(t1, t2).min(-1))
    return tmin, tmax


def _dda_unit(local, invdir):
    """Distance to unit-cube exit from leaf-local pos (rt_core.cuh:38-51)."""
    t1 = -local * invdir
    t2 = t1 + invdir
    return jnp.minimum(1e4, jnp.maximum(t1, t2).min(-1))


# ---- distinct-leaf recording state --------------------------------------
# The march records up to spp (leaf_ptr, crossing_count) pairs per ray.
# When every leaf pointer fits in 27 bits (ptr indexes tree.chs rows; the
# packed jump LUT has the same bound) and counts fit in 5 (c <= spp < 32),
# a record packs into ONE i32 lane: ptr | c << 27.  This halves the
# recording write-backs in the march bodies, the record lanes in the
# compaction bundle, and the stage write-back scatters.  Bigger trees /
# spp fall back to a [R, 2*spp] i32 array (ptr lanes, then f32 count
# bits) with identical semantics.  Whether recs is packed is recoverable
# from its static width (spp vs 2*spp), so helpers need no extra flag.

REC_CNT_SHIFT = LUT_PTR_BITS
REC_PTR_MASK = (1 << REC_CNT_SHIFT) - 1


def _recs_packed(tree: DeviceTree, spp: int) -> bool:
    return spp < 32 and tree.chs.shape[0] <= (1 << REC_CNT_SHIFT)


def _recs_init(tree: DeviceTree, R: int, spp: int):
    width = spp if _recs_packed(tree, spp) else 2 * spp
    return jnp.zeros((R, width), jnp.int32)


def _recs_write(recs, spp: int, slot, sub_ptr, c):
    """Write (sub_ptr, c) into the slots flagged by ``slot`` [R, spp]."""
    if recs.shape[1] == spp:
        val = sub_ptr | (c << REC_CNT_SHIFT)
        return jnp.where(slot, val[:, None], recs)
    c_bits = jax.lax.bitcast_convert_type(c.astype(jnp.float32), jnp.int32)
    slot2 = jnp.concatenate([slot, slot], axis=1)
    val2 = jnp.concatenate(
        [jnp.broadcast_to(sub_ptr[:, None], slot.shape),
         jnp.broadcast_to(c_bits[:, None], slot.shape)], axis=1)
    return jnp.where(slot2, val2, recs)


def _recs_split(recs, spp: int):
    """recs -> (leafs [R, spp] i32, cnts [R, spp] f32) for shading."""
    if recs.shape[1] == spp:
        leafs = recs & REC_PTR_MASK
        # >> is arithmetic on i32; the mask drops sign-extension bits
        cnts = ((recs >> REC_CNT_SHIFT) & 0x1F).astype(jnp.float32)
        return leafs, cnts
    return recs[:, :spp], jax.lax.bitcast_convert_type(
        recs[:, spp:], jnp.float32)


def _step_update(opt, spp: int, consts, state, sub_ptr, t_sub, sigma,
                 mask):
    """Advance rays one leaf step given the leaf info (rt_core.cuh:241-270
    semantics: DDA exit + epsilon, optical-depth accumulation, sorted
    threshold crossing with distinct-leaf recording).  ``t_sub`` is the
    distance to the step's exit boundary (leaf exit, or an empty-space
    skip boundary -- any boundary all of whose skipped cells are empty
    preserves the reference t sequence, since the epsilon never
    accumulates: every step lands at geometric boundary + one epsilon)."""
    (cen_t, d_t, invdir, delta_scale, dst, tmax) = consts
    (active, t, src, sppc, shn, recs) = state
    sigma_thresh = jnp.float32(opt.sigma_thresh)
    step_size = jnp.float32(opt.step_size)
    iota_spp = jnp.arange(spp, dtype=jnp.int32)

    delta_t = t_sub + step_size
    has_sigma = (sigma > sigma_thresh) & mask
    delta = jnp.where(has_sigma, delta_t * delta_scale * sigma, 0.0)
    s_new = src + delta

    # threshold crossings: #{i : dst[i] <= s_new} - sppc  (dst sorted)
    n_leq = jnp.sum((dst <= s_new[:, None]).astype(jnp.int32), axis=1)
    c = jnp.maximum(n_leq - sppc, 0)
    rec = has_sigma & (c > 0)
    slot = (iota_spp[None, :] == shn[:, None]) & rec[:, None]
    recs = _recs_write(recs, spp, slot, sub_ptr, c)
    shn = shn + rec.astype(jnp.int32)
    sppc = sppc + jnp.where(rec, c, 0)

    src = jnp.where(has_sigma, s_new, src)
    t = jnp.where(mask, t + delta_t, t)
    active = active & (t < tmax) & (sppc < spp)
    return (active, t, src, sppc, shn, recs)


def _query_step(tree: DeviceTree, pos, invdir, active):
    """Leaf query + step exit distance, with the empty-space skip when the
    tree carries Chebyshev distances: the LUT sigma lane of an empty cell
    holds dist d => all cells within radius d-1 are empty, so the step may
    run to the boundary of that (2d-1)^3 cell cube instead of just the
    leaf exit.  Exact (see _step_update's epsilon argument); the skipped
    region contributes no optical depth either way."""
    sub_ptr, cube, local, sigma, bits = tree_query_full(
        tree, pos, active=active, with_bits=True)
    t_sub = _dda_unit(local, invdir) / cube
    if tree.skip_cap > 0:
        res = float(tree.N ** tree.lut_levels)
        posc = jnp.clip(pos, 0.0, 1.0 - 1e-6)
        cell = jnp.floor(posc * res)
        # distances ride as integer bits 1..255 (f16-sourced sigmas can
        # never produce f32 bit patterns that small)
        dist = jnp.where((bits > 0) & (bits <= 255), bits, 1
                         ).astype(jnp.float32)
        lo = (cell - (dist[:, None] - 1.0)) / res
        hi = (cell + dist[:, None]) / res
        t_box = jnp.maximum((lo - posc) * invdir,
                            (hi - posc) * invdir).min(-1)
        t_sub = jnp.where(dist > 1.0, jnp.maximum(t_sub, t_box), t_sub)
    return sub_ptr, sigma, t_sub


def _march_body(tree: DeviceTree, opt, spp: int, consts, state):
    """One leaf step for every ray: query + step update."""
    (cen_t, d_t, invdir, *_r) = consts
    (active, t, *_s) = state
    pos = cen_t + t[:, None] * d_t
    sub_ptr, sigma, t_sub = _query_step(tree, pos, invdir, active)
    return _step_update(opt, spp, consts, state, sub_ptr, t_sub,
                        sigma, state[0])


# subcell-select lowering inside brick rounds: "onehot" (two [R,64]
# masked sums -- the measured default) or "dynamic" (take_along_axis,
# i.e. an in-row 2-D gather).  Module-level so the schedule tuner can
# A/B it; jit traces read it at trace time.
_BRICK_SELECT = "onehot"
# while-loop unroll for non-final stages (tuner A/B knob): trades cond
# evaluations for potential step overshoot within a stage budget
_STAGE_UNROLL = 1
# Run fixed-budget mid stages as fori loops (no any(active) cond per
# round) instead of early-exit whiles: measured 168.9 vs 174.7 ms march
# with bit-identical output (round-3 exp7).  The drain and the overflow
# fallback keep their early-exit whiles.
_MID_FORI = True


def _march_body_brick(tree: DeviceTree, opt, spp: int, consts, state,
                      t_in: int = 4):
    """One brick round: a single 520-byte gather fetches the 4x4x4 leaf
    block under the ray's level-L cell, then up to ``t_in`` exact leaf
    steps run from VPU registers.  Wide gather rows are ~free on TPU
    (same latency as 8B), so this collapses the serial-gather count the
    latency-bound march tail pays for.  Bit-identical to the thin path:
    the block holds the same (ptr, depth, sigma) records the full-depth
    LUT would return, and subcell selection reproduces floor(pos*res)
    exactly (power-of-two scaling).

    The per-sub-step bookkeeping is BATCHED: the geometric walk (subcell
    select, DDA exit, optical-depth fold) runs as an exact sequential
    fold over [R] scalars -- the same left-to-right f32 association as
    rt_core.cuh:241-270, so numerics match the oracle bit-for-bit --
    while the threshold-crossing logic (the [R,spp] compares and slot
    writes that dominated the sequential body) runs ONCE over a
    [R,t_in,spp] block after the walk.  Recording is gated per sub-step
    by (crossings c_k > 0) with the running count n_eff carried only
    across sigma steps, reproducing `c = max(n_leq - sppc, 0)` of
    _step_update exactly (incl. the degenerate dst==0 case).  Rays that
    consume all SPP thresholds mid-round keep walking geometrically, but
    n is capped at spp so no further crossings record and the ray exits
    dead either way -- only dead-ray t/src over-advance, which no later
    round reads."""
    (cen_t, d_t, invdir, delta_scale, dst, tmax) = consts
    (active0, t, src, sppc, shn, recs) = state
    L = tree.brick_levels
    resL = tree.N ** L
    iota64 = jnp.arange(64, dtype=jnp.int32)
    iota_spp = jnp.arange(spp, dtype=jnp.int32)
    sigma_thresh = jnp.float32(opt.sigma_thresh)
    step_size = jnp.float32(opt.step_size)

    pos = jnp.clip(cen_t + t[:, None] * d_t, 0.0, 1.0 - 1e-6)
    cell = jnp.clip(jnp.floor(pos * resL).astype(jnp.int32), 0, resL - 1)
    flat = (cell[:, 0] * resL + cell[:, 1]) * resL + cell[:, 2]
    if tree.brick_indirect:
        # deep trees: LUT row first (8B), then the sparse brick row for
        # cells still internal at lut_levels; shallow cells synthesize
        # their brick from the LUT row itself (one leaf fills the cell)
        lrow = jnp.take(tree.lut, jnp.where(active0, flat, 0), axis=0)
        e, lane1 = lrow[:, 0], lrow[:, 1]
        internal = ((e >> LUT_PTR_BITS) & LUT_DEPTH_SENTINEL) == \
            LUT_DEPTH_SENTINEL
        bidx = jnp.where(active0 & internal, lane1 - 1, 0)
        brow = jnp.take(tree.brick, bidx, axis=0)
        row_sig = jnp.where(internal[:, None], brow[:, :64],
                            lane1[:, None])
        row_pck = jnp.where(internal[:, None], brow[:, 64:128],
                            e[:, None])
    else:
        row = jnp.take(tree.brick, jnp.where(active0, flat, 0), axis=0)
        row_sig = row[:, :64]  # [R, 64] f32 bits of subcell leaf sigmas
        row_pck = row[:, 64:128]  # [R, 64] packed (depth<<27 | ptr)

    in_cell = active0
    ptr_ks, s_ks, hs_ks = [], [], []
    for _ in range(t_in):
        pos = jnp.clip(cen_t + t[:, None] * d_t, 0.0, 1.0 - 1e-6)
        sub4 = jnp.clip(
            jnp.floor((pos * resL - cell.astype(jnp.float32)) * 4.0
                      ).astype(jnp.int32), 0, 3)
        idx64 = (sub4[:, 0] * 4 + sub4[:, 1]) * 4 + sub4[:, 2]
        if _BRICK_SELECT == "dynamic":
            packed = jnp.take_along_axis(row_pck, idx64[:, None],
                                         axis=1)[:, 0]
            sig_bits = jnp.take_along_axis(row_sig, idx64[:, None],
                                           axis=1)[:, 0]
        else:
            onehot = (iota64[None, :] == idx64[:, None]).astype(jnp.int32)
            packed = jnp.sum(row_pck * onehot, axis=1)
            sig_bits = jnp.sum(row_sig * onehot, axis=1)
        depth = (packed >> LUT_PTR_BITS) & LUT_DEPTH_SENTINEL
        sub_ptr = packed & ((1 << LUT_PTR_BITS) - 1)
        cube = jnp.exp2(depth.astype(jnp.float32))
        local = pos * cube[:, None]
        local = local - jnp.floor(local)
        sigma = jax.lax.bitcast_convert_type(sig_bits, jnp.float32)

        mask = in_cell
        t_sub = _dda_unit(local, invdir) / cube
        delta_t = t_sub + step_size
        hs = (sigma > sigma_thresh) & mask
        src = jnp.where(hs, src + delta_t * delta_scale * sigma, src)
        t = jnp.where(mask, t + delta_t, t)
        ptr_ks.append(sub_ptr)
        s_ks.append(src)
        hs_ks.append(hs)
        # still inside the same level-L cell (and not past tmax)?
        pos_n = jnp.clip(cen_t + t[:, None] * d_t, 0.0, 1.0 - 1e-6)
        cell_n = jnp.clip(jnp.floor(pos_n * resL).astype(jnp.int32), 0,
                          resL - 1)
        in_cell = mask & (t < tmax) & jnp.all(cell_n == cell, axis=1)

    # ---- batched crossing bookkeeping over the walked sub-steps ----
    s_all = jnp.stack(s_ks, axis=1)                       # [R, t_in]
    hs_all = jnp.stack(hs_ks, axis=1)                     # [R, t_in]
    ptr_all = jnp.stack(ptr_ks, axis=1)                   # [R, t_in]
    n_all = jnp.sum((dst[:, None, :] <= s_all[:, :, None]
                     ).astype(jnp.int32), axis=2)         # [R, t_in]
    # running recorded count: advances only on sigma steps (int fold,
    # exact)
    n_eff, n_effs = sppc, []
    for k in range(t_in):
        n_eff = jnp.where(hs_all[:, k], n_all[:, k], n_eff)
        n_effs.append(n_eff)
    n_eff_all = jnp.stack(n_effs, axis=1)                 # [R, t_in]
    n_prev = jnp.concatenate([sppc[:, None], n_eff_all[:, :-1]], axis=1)
    c_all = n_eff_all - n_prev                            # [R, t_in] >= 0
    rec = c_all > 0
    slot = shn[:, None] + jnp.cumsum(rec.astype(jnp.int32), axis=1) - \
        rec.astype(jnp.int32)                             # exclusive scan
    onehot_s = (slot[:, :, None] == iota_spp[None, None, :]) & \
        rec[:, :, None]                                   # [R, t_in, spp]
    wrote = jnp.any(onehot_s, axis=1)                     # [R, spp]
    oh = onehot_s.astype(jnp.int32)
    if recs.shape[1] == spp:
        # packed records: ONE [R, t_in, spp] select instead of two.
        # Each (ray, slot) column has at most one onehot_s=1 across t_in
        # (slot is strictly increasing per recording sub-step), so the
        # sum picks exactly one packed value -- no overflow even with
        # the count riding the sign bits.
        pk_all = ptr_all | (c_all << REC_CNT_SHIFT)       # [R, t_in]
        recs = jnp.where(wrote, jnp.sum(pk_all[:, :, None] * oh, axis=1),
                         recs)
    else:
        leafs0, cnts0 = recs[:, :spp], recs[:, spp:]
        leafs1 = jnp.where(wrote,
                           jnp.sum(ptr_all[:, :, None] * oh, axis=1),
                           leafs0)
        c_bits = jax.lax.bitcast_convert_type(
            jnp.sum(c_all[:, :, None].astype(jnp.float32) *
                    oh.astype(jnp.float32), axis=1), jnp.int32)
        cnts1 = jnp.where(wrote, c_bits, cnts0)
        recs = jnp.concatenate([leafs1, cnts1], axis=1)
    shn = shn + jnp.sum(rec.astype(jnp.int32), axis=1)
    sppc = n_effs[-1]
    active = active0 & (t < tmax) & (sppc < spp)
    return (active, t, src, sppc, shn, recs)


def _march_loop(tree, opt, spp, consts, state, steps: int,
                unroll: int = 1, brick: bool = False, t_in: int = 4,
                early_exit: bool = True):
    """March ``steps`` rounds.  ``early_exit`` uses a while loop with an
    any(active) cond (right for the unbounded drain); fixed-budget mid
    stages may run as a plain fori (marching dead rays is masked to
    no-ops, and survivors rarely all die inside a stage budget)."""
    if steps <= 0:
        return state
    use_brick = brick and tree.brick_levels > 0
    per_round = t_in * unroll if use_brick else unroll
    n_rounds = max((steps + per_round - 1) // per_round, 1)

    def round_body(st):
        if use_brick:
            for _ in range(unroll):
                st = _march_body_brick(tree, opt, spp, consts, st,
                                       t_in=t_in)
            return st
        for _ in range(unroll):
            st = _march_body(tree, opt, spp, consts, st)
        return st

    if not early_exit:
        return jax.lax.fori_loop(0, n_rounds,
                                 lambda i, st: round_body(st), state)

    def cond(sv):
        step, st = sv
        return (step < steps) & jnp.any(st[0])

    def body(sv):
        step, st = sv
        return step + per_round, round_body(st)

    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return out


# Wavefront compaction schedule: (steps, width_divisor, kind) stages.
# ENTERING a stage, surviving rays are packed into R//divisor lanes (one
# fused row gather via fast_nonzero); divisor <= 1 keeps the current
# width.  ``kind`` picks the march body: "thin" (one 8B LUT row per leaf
# step; right for empty space, where leaves are shallow and a 4^3 brick
# would be exited after one step) or "brick" (one 512B 4x4x4 leaf-block
# row, several exact steps per gather; right once survivors are grazing
# the finely-subdivided shell).  Divisors carry ~1.2-1.4x margin over
# measured survivor curves (tools/profile_march2.py); overflow at any
# stage falls back to finishing at the current width (exactness is never
# traded).  The final stage runs to max_steps.
# Divisors are sized against the measured survivor curve of the bench
# scene with ~1.3x margin (tools/tune_schedule.py; sv(k) for thin rounds
# k=2..68: 207k, 135k @6, 84k @16, 47k @28, 22k @40, 12.4k @52, 7.5k
# @68 of 640k rays).  Brick stages count t_in steps per round but
# deliver ~1-2 effective steps, so they are only safe where no
# subsequent cap depends on the step count -- the final drain.
# Brick stages count t_in (=4) per round, so their step budgets below
# are 4x the intended round count; caps at every boundary were verified
# against measured survivors (tools/tune_schedule3.py: 135k@183k,
# 84k@110k, 42k@61k, 15k@29k, 7.7k@16k, 4.7k@10k).
# Stages may carry an optional 4th element: the brick sub-step count
# t_in (default 4).  t_in=4 measured best IN-JIT at every stage incl.
# the drain (round-3 exp4: t4 drain 175.7 vs t12 180.0 ms march; the
# staged-fori protocol had suggested t12 -- an artifact of fori vs the
# real early-exit while loop).
# The optional 5th stage element is the shade-on-death dead-ray cap
# divisor: entering the stage, rays that died WITH recorded hits since
# the previous boundary are packed into base_width//dead_div side-buffer
# slots (see _march_death).  Oversizing costs only gather+copy rows;
# undersizing falls back to dense at-width shading for that boundary
# (correct, slower).  Values carry ~2-2.5x margin over the bench shell
# scene's measured per-boundary dead-hit counts (tools/round3_exp14.py:
# 0, 0, 269, 36.4k, 23.7k, 4.9k, 887 of 640k rays; hits die almost
# entirely at the mid-brick boundaries).  The early boundaries measured
# ZERO dead hits but keep modest caps -- their dense fallback would run
# at near-full width, and 10k spare gather rows are ~0.1 ms insurance.
DEFAULT_SCHEDULE = (
    (2, 1.0, "thin"),
    (4, 2.4, "thin", 4, 64),
    (10, 3.5, "thin", 4, 64),
    (24, 5.8, "brick", 4, 512),
    (32, 10.5, "brick", 4, 8),
    (40, 22.0, "brick", 4, 12),
    (48, 40.0, "brick", 4, 48),
    (0, 64.0, "brick", 4, 128),
)


def _normalize_schedule(schedule):
    """Accept legacy (steps, divisor) pairs (stage 0 full-width thin,
    later stages brick -- the round-1 convention), 3-tuples without t_in
    and 4-tuples without dead_div; canonical form is
    (steps, divisor, kind, t_in, dead_div).  A missing dead_div defaults
    to 2x the PREVIOUS stage's divisor (dead rays at a boundary are a
    subset of the parent width; most early deaths are background rays
    that never recorded a hit, so half the parent width is a safe cap
    for the hit subset)."""
    out = []
    prev_div = 1.0
    for i, st in enumerate(schedule):
        if len(st) == 2:
            steps, div = st
            st = (steps, div, "thin" if i == 0 else "brick", 4)
        elif len(st) == 3:
            st = tuple(st) + (4,)
        if len(st) == 4:
            st = tuple(st) + (max(2.0 * prev_div, 1.0),)
        out.append(tuple(st))
        prev_div = max(float(st[1]), 1.0)
    return tuple(out)


def trace_rays(tree: DeviceTree, dirs, vdirs, cens, dst, opt: RenderOptions,
               tmax_bg=None, max_steps: int = 8192,
               schedule=DEFAULT_SCHEDULE, phase1_steps=None,
               compact_frac=None, shade_cap_div: int = 4):
    """Regular-tracking estimator over a ray batch.

    dirs/cens: [R,3] tree-space-ready rays -- world dirs and world origins
    already NDC-warped; this function applies the tree scale/offset.
    vdirs: [R,3] view dirs for basis evaluation (already rodrigues-rotated).
    dst: [R, SPP] *sorted* exponential thresholds.
    Returns out [R,4]: premultiplied rgb + alpha (pre-background).

    The march is a compacting wavefront (see DEFAULT_SCHEDULE): the
    typical ray terminates within ~16 leaf steps (SPP thresholds are
    consumed quickly in occupied space; the jump LUT makes empty space one
    big step), so lane width shrinks as rays die.
    """
    if phase1_steps is not None and compact_frac is not None:
        # legacy two-phase interface
        schedule = (((phase1_steps, 1), (0, compact_frac))
                    if compact_frac > 1 else ((max_steps, 1),))
    spp = dst.shape[1]

    consts, state = _init_march(tree, dirs, cens, dst, opt, tmax_bg)
    R0 = dirs.shape[0]
    sched = _normalize_schedule(tuple(schedule))
    cap_h = max(R0 // shade_cap_div, 1)
    # side-buffer pad = the largest single append block (per-boundary
    # dead caps + the final drain-width block), so the contiguous
    # dynamic_update_slice in _death_boundary/_death_final never clamps
    # while n_h <= cap_h holds
    W, pads = R0, []
    for (_steps, frac, _kind, _t_in, dd) in sched:
        capk = max(int(R0 // frac), 1) if frac > 1 else W
        if capk < W:
            pads.append(min(max(int(R0 // dd), 1), cap_h, W))
            W = capk
    if W <= cap_h:
        pads.append(W)
    pad = max(pads) if pads else 0
    rec_w = state[5].shape[1]
    carry = (jnp.zeros((cap_h + pad, rec_w + 1), jnp.int32),
             jnp.int32(0), jnp.zeros((R0, 4), jnp.float32))
    sbuf, n_h, rgba = _march_death(tree, opt, spp, consts, state, sched,
                                   max_steps,
                                   jnp.arange(R0, dtype=jnp.int32),
                                   vdirs, carry, cap_h)
    # ---- color accumulation (rt_core.cuh:272-332) ----
    return _shade_sbuf(tree, vdirs, sbuf, n_h, rgba, opt, spp, cap_h)


def _init_march(tree: DeviceTree, dirs, cens, dst, opt, tmax_bg=None):
    """World rays -> tree-space march (consts, state) (the setup prefix
    of rt_core.cuh:195-240: scale/offset, delta_scale, bbox DDA)."""
    spp = dst.shape[1]
    R = dirs.shape[0]
    cen_t = tree.offset[None, :] + tree.scale[None, :] * cens
    d_scaled = dirs * tree.scale[None, :]
    delta_scale = 1.0 / jnp.linalg.norm(d_scaled, axis=-1)
    d_t = d_scaled * delta_scale[:, None]
    if tmax_bg is None:
        tmax_bg = jnp.full((R,), 1e9, jnp.float32)
    # world depth -> tree-space ray parameter (rt_core.cuh:208 divides)
    tmax_bg = tmax_bg / delta_scale

    invdir = 1.0 / (d_t + 1e-9)
    tmin, tmax = _dda_world(cen_t, invdir, opt.render_bbox)
    tmax = jnp.minimum(tmax, tmax_bg)
    hit = (tmax >= 0) & (tmin <= tmax)

    consts = (cen_t, d_t, invdir, delta_scale, dst, tmax)
    state = (
        hit,
        tmin,
        jnp.zeros(R, jnp.float32),
        jnp.zeros(R, jnp.int32),
        jnp.zeros(R, jnp.int32),
        _recs_init(tree, R, spp),
    )
    return consts, state


def _pack_bundle(consts, state):
    """Bundle per-ray consts+state into one [R, K] i32 row so a compaction
    is a single gather.

    Slimmed to 10+spp f32 + 1+spp i32 lanes (92B at spp=6; was 136B in
    round 2): ``invdir`` is NOT carried -- it is a deterministic
    elementwise function of the carried d_t, so recomputing it after
    unpack is bit-exact and cheaper than gathering 12B/row -- (active,
    sppc, shn) ride one packed flag word (1+6+6 bits; sppc, shn <= spp
    <= 63), and each (leaf, count) record rides one packed i32 lane
    (see _recs_write; +spp lanes when the tree needs unpacked records).
    The pack-gather sits in the measured 47-58M rows/s row-width regime,
    so every dropped lane is ~row-count x 4B of bandwidth back."""
    (cen_t, d_t, invdir, delta_scale, dst, tmax) = consts
    (active, t, src, sppc, shn, recs) = state
    f32_parts = [cen_t, d_t, delta_scale[:, None], dst, tmax[:, None],
                 t[:, None], src[:, None]]
    flags = (active.astype(jnp.int32) | (sppc << 1) | (shn << 7))
    i32_parts = [flags[:, None], recs]
    f32 = jnp.concatenate(f32_parts, axis=1)
    i32 = jnp.concatenate(i32_parts, axis=1)
    return jnp.concatenate(
        [jax.lax.bitcast_convert_type(f32, jnp.int32), i32], axis=1)


def _unpack_bundle(row, spp):
    nf = 10 + spp
    f32 = jax.lax.bitcast_convert_type(row[:, :nf], jnp.float32)
    i32 = row[:, nf:]
    d_t = f32[:, 3:6]
    invdir = 1.0 / (d_t + 1e-9)  # bit-exact recompute (see _pack_bundle)
    consts = (f32[:, 0:3], d_t, invdir, f32[:, 6],
              f32[:, 7:7 + spp], f32[:, 7 + spp])
    flags = i32[:, 0]
    state = ((flags & 1).astype(bool), f32[:, 8 + spp], f32[:, 9 + spp],
             (flags >> 1) & 0x3F, (flags >> 7) & 0x3F, i32[:, 1:])
    return consts, state


def _march_schedule(tree, opt, spp, consts, state, schedule, max_steps,
                    base_width: Optional[int] = None):
    """Run the compaction schedule; returns (leafs, cnts) at the incoming
    width.  (Internally the records stay in their packed single-lane form
    -- see _recs_write -- and split only here, once.)"""
    recs = _march_schedule_recs(tree, opt, spp, consts, state, schedule,
                                max_steps, base_width)
    return _recs_split(recs, spp)


def _march_schedule_recs(tree, opt, spp, consts, state, schedule,
                         max_steps, base_width: Optional[int] = None):
    """Run the compaction schedule; returns the recs array at the
    incoming width.

    Each stage first compacts survivors into base_width//divisor lanes
    (when the divisor shrinks the width and the survivor count fits), then
    marches ``steps`` rounds with the stage's body kind.  A stage whose
    survivor count overflows its cap falls back to finishing the whole
    march at the current width -- slower, never wrong."""
    schedule = _normalize_schedule(schedule)
    (steps, frac, kind, t_in, _dd), rest = schedule[0], schedule[1:]
    R = state[0].shape[0]
    if base_width is None:
        base_width = R
    brick = kind == "brick"
    last = not rest
    if last:
        steps = max_steps

    # NOTE: caps are deliberately NOT rounded to fast_nonzero's 512
    # block -- at sub-640k widths the jnp.nonzero fallback measured
    # FASTER than the scatter-based fast path (bench: 217.5 vs 232.8
    # ms/frame with rounded caps), so non-multiple widths taking the
    # fallback is the better configuration.
    cap = max(int(base_width // frac), 1) if frac > 1 else R

    def run_here(consts, state):
        st = _march_loop(tree, opt, spp, consts, state, steps,
                         unroll=4 if last else _STAGE_UNROLL,
                         brick=brick, t_in=t_in,
                         early_exit=last or not _MID_FORI)
        if last:
            return st[5]
        return _march_schedule_recs(tree, opt, spp, consts, st, rest,
                                    max_steps, base_width)

    if cap >= R:
        return run_here(consts, state)

    active = state[0]
    n_active = jnp.sum(active.astype(jnp.int32))

    def compacted(_):
        idx, rank = fast_nonzero_rank(active, cap, R)
        valid = idx < R
        row = jnp.take(_pack_bundle(consts, state), idx, axis=0,
                       mode="fill", fill_value=0)
        c_consts, c_state = _unpack_bundle(row, spp)
        c_state = (c_state[0] & valid,) + c_state[1:]
        c_recs = run_here(c_consts, c_state)
        # Merge the deep records back by GATHER, not scatter: parent row i
        # (if active) continued as child row rank[i].  The previous
        # .at[idx].set cascade issued ~675k set-scatter rows/frame across
        # the stage boundaries and measured ~29 ms (tools/round3_exp12.py);
        # set-scatter costs ~4x a gather per row, and the rank pass is
        # already paid for inside fast_nonzero_rank.
        merged = jnp.take(c_recs, jnp.minimum(rank, cap - 1), axis=0)
        return jnp.where(active[:, None], merged, state[5])

    def full(_):
        st = _march_loop(tree, opt, spp, consts, state, max_steps,
                         unroll=2, brick=brick, t_in=t_in)
        return st[5]

    return jax.lax.cond(n_active <= cap, compacted, full, None)


# ---------------------------------------------------------------------------
# shade-on-death: the production march/shade coupling
# ---------------------------------------------------------------------------
# Rematerializing the full-width records after the compacted march costs
# ~25-30 ms/frame in ANY formulation (set-scatter cascade and rank-gather
# merge measured equal: tools/round3_exp12.py 135.0 vs exp13 131-136 ms;
# the stubbed lower bound is 106 ms) -- the cost is the ~1.3M moved rows,
# not the op.  Shade-on-death never moves records back up: a ray's
# records are FINAL the moment it dies, so each compaction boundary
# extracts the just-died hit rays' (records, original index) rows into a
# side buffer (one fused partition scatter + a gather + a contiguous
# dynamic_update_slice), survivors march on, and ONE shade at the probed
# hit cap scatters premultiplied rgba to the original ray indices.  Every
# cap has a dense at-width fallback (exactness is never traded for
# speed), mirroring rt_core.cuh:241-332 semantics exactly: identical
# records, identical shading math, only the program point moves.


def _shade_rows(tree: DeviceTree, vdirs_rows, recs_rows, valid_f, opt,
                spp: int):
    """Shade [M] record rows -> premultiplied rgba rows [M, 4]
    (rt_core.cuh:272-332 math; already divided by spp).  ``valid_f``
    [M] float 0/1 zeroes padding rows."""
    M = recs_rows.shape[0]
    leafs, cnts = _recs_split(recs_rows, spp)
    w = jnp.where(cnts > 0, cnts, 0.0) * valid_f[:, None]
    alpha = jnp.sum(w, axis=1) / spp
    vals = take_data_rows(tree, leafs.reshape(-1)).reshape(
        M, spp, tree.data_dim)
    if tree.basis_dim >= 0:
        basis = _eval_masked_basis(tree, vdirs_rows, opt)
        coeffs = vals[..., :3 * tree.basis_dim].reshape(
            M, spp, 3, tree.basis_dim)
        logits = jnp.einsum("mscb,mb->msc", coeffs, basis,
                            precision=jax.lax.Precision.HIGHEST)
        rgb_per_leaf = jax.nn.sigmoid(logits)
    else:
        rgb_per_leaf = vals[..., :3]
    rgb = jnp.einsum("msc,ms->mc", rgb_per_leaf, w,
                     precision=jax.lax.Precision.HIGHEST) / spp
    return jnp.concatenate([rgb, alpha[:, None]], axis=1)


def _death_dense(tree, opt, spp, recs, orig, mask, vdirs_full, rgba):
    """Overflow fallback: shade ``mask`` rows at the CURRENT width and
    set-scatter their rgba to the original ray indices (disjoint from
    every other death site -- a ray dies exactly once)."""
    R0 = rgba.shape[0]
    vd = jnp.take(vdirs_full, jnp.minimum(orig, R0 - 1), axis=0)
    rows = _shade_rows(tree, vd, recs, mask.astype(jnp.float32), opt, spp)
    oidx = jnp.where(mask & (orig < R0), orig, R0)
    return rgba.at[oidx].set(rows, mode="drop")


def _death_boundary(tree, opt, spp, recs, orig, dead_hit, idx_s, n_dead,
                    vdirs_full, carry, cap_h: int):
    """Route the just-died hit rays: append their (records, orig) rows to
    the side buffer when they fit, else shade densely at-width."""
    sbuf, n_h, rgba = carry
    cap_dead = idx_s.shape[0]
    W = recs.shape[0]
    R0 = rgba.shape[0]

    def append(carry):
        sbuf, n_h, rgba = carry
        idc = jnp.minimum(idx_s, W - 1)
        valid = idx_s < W
        drecs = jnp.take(recs, idc, axis=0)
        dorig = jnp.where(valid, jnp.take(orig, idc), R0)
        block = jnp.concatenate([drecs, dorig[:, None]], axis=1)
        # contiguous copy, not a scatter; the pad rows past cap_h absorb
        # the block tail so the slice never clamps (n_h + n_dead <= cap_h
        # is in the predicate, physical rows = cap_h + max block height)
        sbuf = jax.lax.dynamic_update_slice(sbuf, block, (n_h, 0))
        return (sbuf, n_h + n_dead, rgba)

    def dense(carry):
        sbuf, n_h, rgba = carry
        return (sbuf, n_h,
                _death_dense(tree, opt, spp, recs, orig, dead_hit,
                             vdirs_full, rgba))

    fits = (n_dead <= cap_dead) & (n_h + n_dead <= cap_h)
    return jax.lax.cond(fits, append, dense, carry)


def _death_final(tree, opt, spp, state, orig, vdirs_full, carry,
                 cap_h: int):
    """After the drain: every remaining row with recorded hits is shaded.
    The fast path appends the whole raw block (no compaction needed at
    drain width -- non-hit rows ride along with orig pinned to the drop
    sentinel and zero weights)."""
    sbuf, n_h, rgba = carry
    recs = state[5]
    W = recs.shape[0]
    R0 = rgba.shape[0]
    _, cnts = _recs_split(recs, spp)
    hit = cnts[:, 0] > 0

    def dense(carry):
        sbuf, n_h, rgba = carry
        return (sbuf, n_h, _death_dense(tree, opt, spp, recs, orig, hit,
                                        vdirs_full, rgba))

    if W > sbuf.shape[0] - cap_h:  # block exceeds the pad: dense only
        return dense(carry)

    def append(carry):
        sbuf, n_h, rgba = carry
        dorig = jnp.where(hit & (orig < R0), orig, R0)
        block = jnp.concatenate([recs, dorig[:, None]], axis=1)
        sbuf = jax.lax.dynamic_update_slice(sbuf, block, (n_h, 0))
        return (sbuf, n_h + W, rgba)

    return jax.lax.cond(n_h + W <= cap_h, append, dense, carry)


def _march_death(tree, opt, spp, consts, state, schedule, max_steps,
                 orig, vdirs_full, carry, cap_h: int, base_width=None):
    """The compaction-schedule march with shade-on-death.

    Structure matches _march_schedule_recs, but each boundary first
    routes the just-died hit rays into the side buffer / dense rgba (one
    fused partition scatter packs survivors AND dead rays), and nothing
    is merged back up the recursion -- the carry threads through.
    Returns carry = (sbuf, n_h, rgba)."""
    schedule = _normalize_schedule(schedule)
    (steps, frac, kind, t_in, dead_div), rest = schedule[0], schedule[1:]
    R = state[0].shape[0]
    if base_width is None:
        base_width = R
    brick = kind == "brick"
    last = not rest
    if last:
        steps = max_steps
    cap = max(int(base_width // frac), 1) if frac > 1 else R

    def run_here(consts, state, orig, carry):
        st = _march_loop(tree, opt, spp, consts, state, steps,
                         unroll=4 if last else _STAGE_UNROLL,
                         brick=brick, t_in=t_in,
                         early_exit=last or not _MID_FORI)
        if last:
            return _death_final(tree, opt, spp, st, orig, vdirs_full,
                                carry, cap_h)
        return _march_death(tree, opt, spp, consts, st, rest, max_steps,
                            orig, vdirs_full, carry, cap_h, base_width)

    if cap >= R:
        return run_here(consts, state, orig, carry)

    active = state[0]
    recs = state[5]
    R0 = carry[2].shape[0]
    cap_dead = min(max(int(base_width // dead_div), 1), cap_h, R)
    _, cnts = _recs_split(recs, spp)
    dead_hit = (~active) & (cnts[:, 0] > 0)
    n_dead = jnp.sum(dead_hit.astype(jnp.int32))
    idx, idx_s = partition_indices(active, dead_hit, cap, cap_dead, R)
    carry = _death_boundary(tree, opt, spp, recs, orig, dead_hit, idx_s,
                            n_dead, vdirs_full, carry, cap_h)
    n_active = jnp.sum(active.astype(jnp.int32))

    def compacted(carry):
        valid = idx < R
        row = jnp.take(_pack_bundle(consts, state), idx, axis=0,
                       mode="fill", fill_value=0)
        c_consts, c_state = _unpack_bundle(row, spp)
        c_state = (c_state[0] & valid,) + c_state[1:]
        c_orig = jnp.where(valid,
                           jnp.take(orig, jnp.minimum(idx, R - 1)), R0)
        return run_here(c_consts, c_state, c_orig, carry)

    def full(carry):
        st = _march_loop(tree, opt, spp, consts, state, max_steps,
                         unroll=2, brick=brick, t_in=t_in)
        # dead-at-entry rows were routed above; shade everything that
        # was still marching at entry and ended with hits
        _, c2 = _recs_split(st[5], spp)
        mask = active & (c2[:, 0] > 0)
        sbuf, n_h, rgba = carry
        return (sbuf, n_h, _death_dense(tree, opt, spp, st[5], orig, mask,
                                        vdirs_full, rgba))

    return jax.lax.cond(n_active <= cap, compacted, full, carry)


def _shade_sbuf(tree, vdirs_full, sbuf, n_h, rgba, opt, spp: int,
                cap_h: int):
    """The single global shade over the side buffer's live rows, scattered
    to the original ray indices.  Stale rows past n_h (block tails from
    oversized per-boundary caps) are neutralized by the live mask AND a
    drop-sentinel orig, so a stale duplicate index can never overwrite a
    real ray's value."""
    R0 = rgba.shape[0]
    body = sbuf[:cap_h]
    recs_h, orig_h = body[:, :-1], body[:, -1]
    live = (jnp.arange(cap_h, dtype=jnp.int32) < n_h) & (orig_h < R0) & \
        (orig_h >= 0)
    vd = jnp.take(vdirs_full, jnp.clip(orig_h, 0, R0 - 1), axis=0)
    rows = _shade_rows(tree, vd, recs_h, live.astype(jnp.float32), opt,
                       spp)
    oidx = jnp.where(live, orig_h, R0)
    return rgba.at[oidx].set(rows, mode="drop")


def _eval_masked_basis(tree: DeviceTree, vdirs, opt):
    basis_dim = tree.basis_dim
    if tree.fmt == BasisFormat.SH.value:
        basis = eval_sh_basis(basis_dim, vdirs)
    elif tree.fmt == BasisFormat.SG.value:
        basis = eval_sg_basis(basis_dim, tree.extra, vdirs)
    elif tree.fmt == BasisFormat.ASG.value:
        basis = eval_asg_basis(basis_dim, tree.extra, vdirs)
    else:
        basis = jnp.zeros((vdirs.shape[0], basis_dim), jnp.float32)
    lo, hi = opt.basis_minmax
    mask = (np.arange(basis_dim) >= lo) & (np.arange(basis_dim) <= hi)
    return basis * jnp.asarray(mask, jnp.float32)[None, :]


def _leaf_rgb(tree: DeviceTree, leaf_idx, basis_rows):
    """sigmoid(SH(vdir) . coeffs) per gathered leaf (rt_core.cuh:286-317);
    leaf_idx [M], basis_rows [M, basis_dim] -> [M, 3]."""
    vals = take_data_rows(tree, leaf_idx)
    if tree.basis_dim >= 0:
        coeffs = vals[:, :3 * tree.basis_dim].reshape(
            -1, 3, tree.basis_dim)
        logits = jnp.einsum("mcb,mb->mc", coeffs, basis_rows,
                            precision=jax.lax.Precision.HIGHEST)
        return jax.nn.sigmoid(logits)
    return vals[:, :3]


def _shade(tree: DeviceTree, vdirs, recs, opt: RenderOptions,
           spp: int, cap_div: int = 4):
    """Per-distinct-leaf basis shading over the prefix-packed [R, SPP]
    hit slots (``recs`` in the packed single-lane form of _recs_write).

    One compaction to HIT rays (slot 0 occupied == any hit; typically a
    small fraction of the frame), then every spp slot of those rays is
    shaded densely and the results set-scattered back -- no scatter-add
    anywhere.  The hit rows ride ONE packed-recs gather (leaf ptr and
    count share a lane) plus a vdirs gather, and the SH basis is
    evaluated only at the compacted width (round-3 exp12: basis at full
    width plus three separate row gathers cost ~2x the compacted form).
    Frames with more hit rays than the R/4 cap fall back to the dense
    [R*SPP]-row gather (slower, never wrong)."""
    R = vdirs.shape[0]
    leafs, cnts = _recs_split(recs, spp)  # cheap elementwise decode
    w = jnp.where(cnts > 0, cnts, 0.0)
    alpha = jnp.sum(w, axis=1) / spp

    if spp == 1:
        basis = (_eval_masked_basis(tree, vdirs, opt)
                 if tree.basis_dim >= 0
                 else jnp.zeros((R, 0), jnp.float32))
        rgb = _leaf_rgb(tree, leafs[:, 0], basis) * w[:, 0:1] / spp
        return jnp.concatenate([rgb, alpha[:, None]], axis=-1)

    # Hit slots are prefix-packed, so "any hit" == slot 0 occupied, and
    # hitting rays typically carry SEVERAL distinct leaves (soft
    # surfaces spread the spp thresholds), while most rays are pure
    # background.  So: ONE compaction to hit rays, then all spp slots
    # shaded densely there -- no scatter-ADD anywhere (scatter-add
    # measures ~4x a gather per row on TPU; the single set-scatter
    # writing hit rays back is the only scatter).
    hit_mask = cnts[:, 0] > 0
    n_hit = jnp.sum(hit_mask.astype(jnp.int32))
    # cap_div defaults conservative (hits can fill 1/4 of the frame);
    # the per-scene tuner (render/schedule.py) sizes it from the probed
    # hit fraction -- the [caph*spp, data_dim] shading gather is the
    # shade cost driver, so an oversized cap wastes ~row-count x 58B.
    # Overflow poses fall back to the dense branch (correct, slower).
    caph = max(R // cap_div, 1)

    def hit_compact(_):
        hidx = fast_nonzero(hit_mask, caph, R)
        hc = jnp.minimum(hidx, R - 1)
        valid = (hidx < R).astype(jnp.float32)
        recs_h = jnp.take(recs, hc, axis=0)
        leafs_h, cnts_h = _recs_split(recs_h, spp)
        w_h = jnp.where(cnts_h > 0, cnts_h, 0.0) * valid[:, None]
        vals = take_data_rows(tree, leafs_h.reshape(-1)).reshape(
            caph, spp, tree.data_dim)
        if tree.basis_dim >= 0:
            vdirs_h = jnp.take(vdirs, hc, axis=0)
            basis_h = _eval_masked_basis(tree, vdirs_h, opt)
            coeffs = vals[..., :3 * tree.basis_dim].reshape(
                caph, spp, 3, tree.basis_dim)
            logits = jnp.einsum("hscb,hb->hsc", coeffs, basis_h,
                                precision=jax.lax.Precision.HIGHEST)
            rgb_per_leaf = jax.nn.sigmoid(logits)
        else:
            rgb_per_leaf = vals[..., :3]
        rgb_h = jnp.einsum("hsc,hs->hc", rgb_per_leaf, w_h,
                           precision=jax.lax.Precision.HIGHEST)
        return jnp.zeros((R, 3), jnp.float32).at[hidx].set(
            rgb_h, mode="drop")

    def dense(_):
        basis = (_eval_masked_basis(tree, vdirs, opt)
                 if tree.basis_dim >= 0
                 else jnp.zeros((R, 0), jnp.float32))
        vals = take_data_rows(tree, leafs.reshape(-1)).reshape(
            R, spp, tree.data_dim)
        if tree.basis_dim >= 0:
            coeffs = vals[..., :3 * tree.basis_dim].reshape(
                R, spp, 3, tree.basis_dim)
            logits = jnp.einsum("rscb,rb->rsc", coeffs, basis,
                                precision=jax.lax.Precision.HIGHEST)
            rgb_per_leaf = jax.nn.sigmoid(logits)
        else:
            rgb_per_leaf = vals[..., :3]
        return jnp.einsum("rsc,rs->rc", rgb_per_leaf, w,
                          precision=jax.lax.Precision.HIGHEST)

    rgb = jax.lax.cond(n_hit <= caph, hit_compact, dense, None) / spp
    return jnp.concatenate([rgb, alpha[:, None]], axis=-1)


def trace_rays_classic(tree: DeviceTree, dirs, vdirs, cens,
                       opt, tmax_bg=None, max_steps: int = 8192,
                       unroll: int = 2):
    """Classic exponential-transmittance marcher over a ray batch
    (shaders/rt.frag:222-327; the GL/WebGL fallback estimator).

    Deterministic (no SPP sampling): per leaf step the transmittance decays
    by exp(-delta*sigma) and the leaf color is accumulated with weight
    T*(1-att); marching stops early once T < stop_thresh, renormalizing by
    1/(1-T) -- this path is the one live consumer of ``stop_thresh``.
    Returns out [R,4]: accumulated rgb (pre-background) + alpha = 1-T.

    Used as the converged ground-truth generator for denoiser quality
    evaluation (a noise-free estimate of the same integral the regular
    tracker samples), and for config parity with the reference's shader
    backend.  Full-width march with per-step shading -- a quality tool,
    not the real-time path.
    """
    R = dirs.shape[0]
    cen_t = tree.offset[None, :] + tree.scale[None, :] * cens
    d_scaled = dirs * tree.scale[None, :]
    delta_scale = 1.0 / jnp.linalg.norm(d_scaled, axis=-1)
    d_t = d_scaled * delta_scale[:, None]
    if tmax_bg is None:
        tmax_bg = jnp.full((R,), 1e9, jnp.float32)
    tmax_bg = tmax_bg / delta_scale  # rt.frag:228 divides

    invdir = 1.0 / (d_t + 1e-9)
    tmin, tmax = _dda_world(cen_t, invdir, opt.render_bbox)
    tmax = jnp.minimum(tmax, tmax_bg)
    hit = (tmax >= 0) & (tmin <= tmax)

    basis = _eval_masked_basis(tree, vdirs, opt) if tree.basis_dim >= 0 \
        else jnp.zeros((R, 0), jnp.float32)
    sigma_thresh = jnp.float32(opt.sigma_thresh)
    stop_thresh = jnp.float32(opt.stop_thresh)
    step_size = jnp.float32(opt.step_size)

    def one_step(st):
        active, t, light, rgb = st
        pos = cen_t + t[:, None] * d_t
        sub_ptr, sigma, t_sub = _query_step(tree, pos, invdir, active)
        delta_t = t_sub + step_size
        has = (sigma > sigma_thresh) & active
        att = jnp.minimum(jnp.exp(-delta_t * delta_scale * sigma), 1.0)
        weight = jnp.where(has, light * (1.0 - att), 0.0)
        leaf_rgb = _leaf_rgb(tree, jnp.where(has, sub_ptr, 0), basis)
        rgb = rgb + weight[:, None] * leaf_rgb
        light_new = jnp.where(has, light * att, light)
        stop = has & (light_new < stop_thresh)
        rgb = jnp.where(stop[:, None],
                        rgb / (1.0 - light_new[:, None]), rgb)
        light = jnp.where(stop, 0.0, light_new)
        t = jnp.where(active, t + delta_t, t)
        active = active & (t < tmax) & ~stop
        return (active, t, light, rgb)

    def cond(sv):
        step, st = sv
        return (step < max_steps) & jnp.any(st[0])

    def body(sv):
        step, st = sv
        for _ in range(unroll):
            st = one_step(st)
        return step + unroll, st

    state = (hit, tmin, jnp.ones(R, jnp.float32),
             jnp.zeros((R, 3), jnp.float32))
    _, (active, t, light, rgb) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state))
    return jnp.concatenate([rgb, (1.0 - light)[:, None]], axis=-1)


# ---------------------------------------------------------------------------
# full frame
# ---------------------------------------------------------------------------

def make_sorted_dst(uniforms: jnp.ndarray) -> jnp.ndarray:
    """[R, SPP] uniforms -> sorted exponential thresholds
    (order-equivalent to the insertion sort at rt_core.cuh:67-193)."""
    draws = -jnp.log1p(-uniforms)
    return jnp.sort(draws, axis=-1)


def _render_noisy(tree: DeviceTree, transform, state_hi, state_lo, *,
                  width: int, height: int, fx: float, fy: float,
                  opt: FrozenOptions, n_chunks: int, max_steps: int,
                  inc: int, schedule=DEFAULT_SCHEDULE, mesh_color=None,
                  mesh_depth=None, shade_cap_div: int = 4,
                  aux_layout: str = "chw"):
    """Trace + composite + aux assembly (the reference render_kernel).

    mesh_color [R,3] / mesh_depth [R] optionally carry a rasterized mesh
    pass: depth clips rays (t_max, volrend.cu:146-153) and color replaces
    the background during compositing (the onscreen path at
    volrend.cu:180-184).

    aux_layout: "chw" (default, the write_buffer contract), "nhwc", or
    "raw" -- return the composited [R,4] rows so the caller builds
    whichever aux layout(s) it needs without a round-trip transpose."""
    R = width * height
    spp = opt.spp
    dirs, cens = device_camera_rays(transform, width, height, fx, fy)
    vdirs = rodrigues_jnp(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    wdirs, wcens = maybe_world2ndc(tree, dirs, cens)

    classic = getattr(opt, "estimator", "rt") == "classic"
    if classic:
        dst = jnp.zeros((R, spp), jnp.float32)  # unused: deterministic
    else:
        uniforms = pcg32_uniforms_range(
            state_hi, state_lo, n=R * spp, inc=inc).reshape(R, spp)
        dst = make_sorted_dst(uniforms)

    chunk = R // n_chunks
    tmax_bg = (jnp.minimum(mesh_depth, 1e9) if mesh_depth is not None
               else jnp.full((R,), 1e9, jnp.float32))

    def render_chunk(args):
        cd, cv, cc, cdst, ctm = args
        if classic:
            return trace_rays_classic(tree, cd, cv, cc, opt, tmax_bg=ctm,
                                      max_steps=max_steps)
        return trace_rays(tree, cd, cv, cc, cdst, opt, tmax_bg=ctm,
                          max_steps=max_steps, schedule=schedule,
                          shade_cap_div=shade_cap_div)

    if n_chunks > 1:
        args = (
            wdirs.reshape(n_chunks, chunk, 3),
            vdirs.reshape(n_chunks, chunk, 3),
            wcens.reshape(n_chunks, chunk, 3),
            dst.reshape(n_chunks, chunk, spp),
            tmax_bg.reshape(n_chunks, chunk),
        )
        out = jax.lax.map(render_chunk, args).reshape(R, 4)
    else:
        out = render_chunk((wdirs, vdirs, wcens, dst, tmax_bg))

    img, outc = composite(out, width, height,
                          opt.background_brightness, mesh_color)
    if aux_layout == "raw":
        return img, outc
    return img, aux_from_composite(outc, width, height, aux_layout)


def composite(out, width: int, height: int, background, mesh_color=None):
    """Background/mesh compositing (volrend.cu:173-184).  out: [R,4]
    premultiplied rgb+alpha -> (img [H,W,4], composited rows [R,4])."""
    R = width * height
    nalpha = 1.0 - out[:, 3]
    behind = mesh_color if mesh_color is not None else background
    rgb = out[:, :3] + behind * nalpha[:, None]
    out = out.at[:, :3].set(rgb)
    img = jnp.concatenate(
        [rgb, jnp.ones((R, 1), jnp.float32)], axis=-1).reshape(
        height, width, 4)
    return img, out


def aux_from_composite(outc, width: int, height: int,
                       layout: str = "chw"):
    """The 8-channel aux statistics buffer (volrend.cu:186-202):
    composited rgba + its square.  layout "chw" -> [8,H,W] (the
    write_buffer / training-dump contract); "nhwc" -> [H,W,8] (the
    denoiser's native input -- built straight from the [R,8] rows, no
    transpose)."""
    aux = jnp.concatenate([outc, outc * outc], axis=-1)  # [R, 8]
    if layout == "nhwc":
        return aux.reshape(height, width, 8)
    return aux.T.reshape(8, height, width)


def composite_and_aux(out, width: int, height: int, background, mesh_color=None):
    """Background/mesh compositing + the 8-channel aux buffer
    (volrend.cu:173-202).  out: [R,4] premultiplied rgb+alpha."""
    img, outc = composite(out, width, height, background, mesh_color)
    return img, aux_from_composite(outc, width, height)


def _denoise(aux_nhwc, noisy_img, net_params, net_cfg: GuidanceNetConfig):
    """GuidanceNet forward + guided filtering, fully fused on device
    (replaces the TorchScript boundary at denoiser.cpp:39-56).
    aux_nhwc: [H, W, 8] -- the render's native layout, so no transpose
    sits between the march and the convs."""
    model = GuidanceNetCompact(net_cfg)
    weight, guidance = model.apply({"params": net_params}, aux_nhwc[None])
    return guided_filter(weight[0], guidance[0], noisy_img,
                         supports=net_cfg.supports())


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "fx", "fy", "opt",
                     "n_chunks", "max_steps", "inc", "net_cfg",
                     "schedule", "has_mesh", "shade_cap_div",
                     "want_aux", "inner_width", "inner_height"))
def _render_frame_impl(tree: DeviceTree, transform, state_hi, state_lo,
                       net_params, mesh_color, mesh_depth, *, width: int,
                       height: int, fx: float, fy: float,
                       opt: FrozenOptions, n_chunks: int,
                       max_steps: int, inc: int,
                       net_cfg: Optional[GuidanceNetConfig],
                       schedule=DEFAULT_SCHEDULE, has_mesh: bool = False,
                       shade_cap_div: int = 4, want_aux: bool = True,
                       inner_width: Optional[int] = None,
                       inner_height: Optional[int] = None):
    """One fused frame: march + composite (+ fused denoise).

    inner_width/inner_height enable the additive FAST MODE (no reference
    counterpart -- the CUDA renderer always traces one ray per output
    pixel): the march runs at the inner resolution (same field of view,
    focal scaled), and the noisy image + aux statistics are bilinearly
    joint-upsampled to the output resolution BEFORE the fused
    GuidanceNet denoise, so the guided filter doubles as the upsampler
    (classic joint-bilateral upsampling).  The machine roofline
    (PERF.md round 4) proves the canonical frame is gather-row bound;
    this is the measured row-count escape hatch at full output size.
    """
    iw = inner_width or width
    ih = inner_height or height
    fast = (iw, ih) != (width, height)
    if fast and has_mesh:
        # mesh depth clips rays; sample the full-res pass at ray centers
        mc = jax.image.resize(
            mesh_color.reshape(height, width, 3), (ih, iw, 3),
            "nearest").reshape(ih * iw, 3)
        md = jax.image.resize(
            mesh_depth.reshape(height, width), (ih, iw),
            "nearest").reshape(ih * iw)
    else:
        mc, md = mesh_color, mesh_depth
    img, outc = _render_noisy(
        tree, transform, state_hi, state_lo, width=iw, height=ih,
        fx=fx * (iw / width), fy=fy * (ih / height), opt=opt,
        n_chunks=n_chunks, max_steps=max_steps,
        inc=inc, schedule=schedule,
        mesh_color=mc if has_mesh else None,
        mesh_depth=md if has_mesh else None,
        shade_cap_div=shade_cap_div, aux_layout="raw")
    if fast:
        img = jax.image.resize(img, (height, width, 4), "bilinear")
        outc = jax.image.resize(
            outc.reshape(ih, iw, 4), (height, width, 4),
            "bilinear").reshape(width * height, 4)
    if opt.denoise and net_cfg is not None:
        # the denoiser reads the aux statistics in its native NHWC
        # layout, built straight from the composited rows -- the [8,H,W]
        # write_buffer layout is only materialized when the caller asks
        # for it (want_aux), saving a 20MB transposed store + a
        # dependent transpose per frame otherwise.
        aux_nhwc = aux_from_composite(outc, width, height, "nhwc")
        img = _denoise(aux_nhwc, img, net_params, net_cfg)
    aux = (aux_from_composite(outc, width, height)
           if want_aux else None)
    return img, aux


class Renderer:
    """Frame renderer owning the per-frame RNG protocol.

    Mirrors RenderContext ownership (render_context.hpp:14-16): PCG32 base
    state seeded with 20230418, advanced by 2^32 per frame by the caller
    via ``advance_rng`` (main_headless.cpp:506).
    """

    def __init__(self, tree: DeviceTree, width: int, height: int, fx: float,
                 fy: float, options: Optional[RenderOptions] = None,
                 n_chunks: int = 0, max_steps: int = 8192, seed: int = 20230418,
                 schedule=DEFAULT_SCHEDULE, phase1_steps=None,
                 compact_frac=None, shade_cap_div: int = 4,
                 render_scale: float = 1.0):
        self.tree = tree
        self.width = width
        self.height = height
        if not (0.0 < render_scale <= 1.0):
            raise ValueError("render_scale must be in (0, 1]")
        self.render_scale = float(render_scale)
        if render_scale < 1.0:
            # fast mode (additive; see _render_frame_impl): march at the
            # inner resolution, joint-upsample through the fused denoise
            self.inner_width = max(1, round(width * render_scale))
            self.inner_height = max(1, round(height * render_scale))
        else:
            self.inner_width = width
            self.inner_height = height
        self.fx = float(fx)
        self.fy = float(fy)
        self.options = options or RenderOptions()
        self.options.validate()
        if n_chunks <= 0:
            n_chunks = _auto_chunks(height)
        while (self.inner_width * self.inner_height) % n_chunks:
            n_chunks -= 1
        self.n_chunks = n_chunks
        self.max_steps = max_steps
        if phase1_steps is not None and compact_frac is not None:
            schedule = (((phase1_steps, 1), (0, compact_frac))
                        if compact_frac > 1 else ((0, 1),))
        self.schedule = tuple(tuple(x) for x in schedule)
        self.shade_cap_div = int(shade_cap_div)
        self.rng = Pcg32(seed)
        self.net_cfg: Optional[GuidanceNetConfig] = None
        self.net_params = None
        self.denoise_recommended = True
        self._grid_mesh = None

    def set_denoiser(self, cfg_or_path, params=None) -> None:
        """Attach a compact GuidanceNet (mirrors create_denoiser /
        Denoiser::Impl ctor, denoiser.cpp:12-29).  A ``.gnet`` artifact
        may carry ``denoise_recommended: false`` advice (measured: the
        guided filter COSTS quality on hard-surface scenes already
        near-converged at SPP=6); it is surfaced on the attribute and
        never flips ``options.denoise`` implicitly (reference parity:
        denoise defaults on, render_options.hpp)."""
        if isinstance(cfg_or_path, (str, bytes)):
            from ..models.guidance_net import load_compact
            self.net_cfg, self.net_params, meta = load_compact(
                cfg_or_path, with_meta=True)
            self.denoise_recommended = bool(
                meta.get("denoise_recommended", True))
        else:
            self.net_cfg = cfg_or_path
            self.net_params = params
            self.denoise_recommended = True

    def advance_rng(self):
        self.rng.advance()

    def render(self, transform: np.ndarray, mesh_color=None,
               mesh_depth=None, want_aux: bool = True):
        """transform: [3,4] c2w.  Returns (img [H,W,4], aux [8,H,W]) device
        arrays (not synchronized).  If denoise is on and a denoiser is
        attached, img is the filtered output; aux always carries the noisy
        statistics (the reference writes aux before denoising).

        want_aux=False skips materializing the [8,H,W] aux buffer and
        returns (img, None) -- the denoiser still consumes the full
        8-channel statistics (in its native NHWC layout); only the
        write_buffer-layout copy is elided.  Use for display/benchmark
        frames where the caller reads only img.

        mesh_color [H,W,3] / mesh_depth [H,W] from render/raster.py enable
        mesh compositing (depth-clipped rays + mesh behind volume)."""
        opt = self.options
        denoise = opt.denoise and self.net_cfg is not None
        if opt.show_grid:
            mesh_color, mesh_depth = self._grid_mesh_pass(
                transform, mesh_color, mesh_depth)
        has_mesh = mesh_color is not None and mesh_depth is not None
        R = self.width * self.height
        mc = (jnp.asarray(mesh_color, jnp.float32).reshape(R, 3)
              if has_mesh else 0)
        md = (jnp.asarray(mesh_depth, jnp.float32).reshape(R)
              if has_mesh else 0)
        return _render_frame_impl(
            self.tree, jnp.asarray(transform, jnp.float32),
            jnp.uint32(self.rng.state >> 32),
            jnp.uint32(self.rng.state & 0xFFFFFFFF),
            self.net_params if denoise else 0, mc, md,
            width=self.width, height=self.height, fx=self.fx, fy=self.fy,
            opt=FrozenOptions.from_options(opt),
            n_chunks=self.n_chunks, max_steps=self.max_steps,
            inc=self.rng.inc, net_cfg=self.net_cfg if denoise else None,
            schedule=self.schedule, has_mesh=has_mesh,
            shade_cap_div=self.shade_cap_div, want_aux=want_aux,
            inner_width=self.inner_width, inner_height=self.inner_height)

    def render_with_probe(self, transform: np.ndarray, **kw):
        """render() plus the lumisphere probe overlay when
        options.enable_probe is set (volrend.cu:100-134, 215-231)."""
        img, aux = self.render(transform, **kw)
        opt = self.options
        if opt.enable_probe:
            from .probe import apply_probe_overlay, retrieve_cursor_lumisphere
            coeffs = retrieve_cursor_lumisphere(
                self.tree, jnp.asarray(opt.probe, jnp.float32))
            img = apply_probe_overlay(
                img, self.tree, jnp.asarray(transform, jnp.float32), coeffs,
                basis_minmax=opt.basis_minmax,
                probe_disp_size=opt.probe_disp_size)
        return img, aux

    def _grid_mesh_pass(self, transform, mesh_color, mesh_depth):
        """Rasterize the octree wireframe for show_grid
        (cuda_renderer.cpp:115-125); merges with any caller mesh pass."""
        from ..core.camera import Camera as _Cam
        from .raster import rasterize_meshes
        if self._grid_mesh is None:
            raise RuntimeError(
                "options.show_grid requires set_grid_mesh(tree_host)")
        cam = _Cam(width=self.width, height=self.height, fx=self.fx,
                   fy=self.fy)
        cam.set_pose(np.asarray(transform))
        bg = (np.asarray(mesh_color)
              if mesh_color is not None else np.full(
                  3, self.options.background_brightness, np.float32))
        color, depth = rasterize_meshes([self._grid_mesh], cam,
                                        background=bg)
        if mesh_depth is not None:
            md = np.asarray(mesh_depth)
            closer = md < depth
            depth = np.where(closer, md, depth)
            color = np.where(closer[..., None], np.asarray(mesh_color),
                             color)
        return color, depth

    def set_grid_mesh(self, tree_host, max_depth: int = None) -> None:
        """Build the wireframe mesh used by show_grid."""
        from ..io.mesh import Mesh
        from ..io.wireframe import gen_wireframe
        verts = gen_wireframe(tree_host,
                              max_depth or self.options.grid_max_depth)
        n = verts.shape[0]
        self._grid_mesh = Mesh(verts, np.arange(n, dtype=np.int32), 2,
                               "grid", unlit=True)


def _auto_chunks(height: int) -> int:
    """Default chunk count.  The compaction schedule supersedes row
    chunking (which serializes via lax.map and was only a proxy for
    freeing dead lanes), so the default is a single chunk; pass
    n_chunks explicitly to bound peak memory on very large frames."""
    return 1


# ---------------------------------------------------------------------------
# split-phase path (timer parity with render/torch/filter events)
# ---------------------------------------------------------------------------

_render_noisy_jit = functools.partial(jax.jit, static_argnames=(
    "width", "height", "fx", "fy", "opt", "n_chunks", "max_steps",
    "inc", "schedule", "shade_cap_div", "aux_layout"))(_render_noisy)


@functools.partial(jax.jit, static_argnames=("net_cfg",))
def _net_forward_jit(aux, net_params, *, net_cfg: GuidanceNetConfig):
    model = GuidanceNetCompact(net_cfg)
    aux_nhwc = jnp.moveaxis(aux, 0, -1)[None]
    weight, guidance = model.apply({"params": net_params}, aux_nhwc)
    return weight[0], guidance[0]


@functools.partial(jax.jit, static_argnames=("supports",))
def _filter_jit(weight, guidance, noisy_img, supports=None):
    return guided_filter(weight, guidance, noisy_img, supports=supports)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def _fast_upsample_jit(img, aux_chw, *, height: int, width: int):
    """Fast-mode joint upsample for the split-phase path: bilinear on
    the composited rgba; the aux square channels are recomputed from
    the upsampled values (same contract as aux_from_composite, where
    the square channels are the square of the composited rows)."""
    img = jax.image.resize(img, (height, width, 4), "bilinear")
    rgba = jax.image.resize(aux_chw[:4], (4, height, width), "bilinear")
    return img, jnp.concatenate([rgba, rgba * rgba], axis=0)


def render_timed(renderer: "Renderer", transform, timer,
                 profile_dir: Optional[str] = None, mesh_color=None,
                 mesh_depth=None, probe: bool = False) -> tuple:
    """Split-phase render for the FPS/phase report (utils/timer.py).

    Phase semantics mirror render_context.hpp: T_RENDER around the
    traversal+aux (including any mesh compositing pass), T_NET around the
    GuidanceNet forward, T_FILTER around the guided filtering; the
    lumisphere probe overlay, when requested, is applied to the final
    (possibly denoised) image, matching render_with_probe and keeping
    the filter from blurring the overlay.
    ``profile_dir`` wraps the frame in a jax.profiler trace (the TPU
    equivalent of the reference's optional torch.profiler blocks,
    network.py:182-207) -- view with tensorboard/xprof."""
    from ..utils.timer import T_FILTER, T_NET, T_RENDER, sync

    if profile_dir:
        with jax.profiler.trace(profile_dir):
            return render_timed(renderer, transform, timer,
                                mesh_color=mesh_color,
                                mesh_depth=mesh_depth, probe=probe)

    opt = renderer.options
    denoise = opt.denoise and renderer.net_cfg is not None
    R = renderer.width * renderer.height
    has_mesh = mesh_color is not None and mesh_depth is not None
    mc = (jnp.asarray(mesh_color, jnp.float32).reshape(R, 3)
          if has_mesh else None)
    md = (jnp.asarray(mesh_depth, jnp.float32).reshape(R)
          if has_mesh else None)
    fast = renderer.render_scale < 1.0
    if fast and has_mesh:
        raise NotImplementedError(
            "render_timed: mesh compositing under fast mode is only "
            "wired through Renderer.render()")
    with timer.phase(T_RENDER):
        img, aux = _render_noisy_jit(
            renderer.tree, jnp.asarray(transform, jnp.float32),
            jnp.uint32(renderer.rng.state >> 32),
            jnp.uint32(renderer.rng.state & 0xFFFFFFFF),
            width=renderer.inner_width, height=renderer.inner_height,
            fx=renderer.fx * (renderer.inner_width / renderer.width),
            fy=renderer.fy * (renderer.inner_height / renderer.height),
            opt=FrozenOptions.from_options(opt),
            n_chunks=renderer.n_chunks, max_steps=renderer.max_steps,
            inc=renderer.rng.inc, schedule=renderer.schedule,
            mesh_color=mc, mesh_depth=md,
            shade_cap_div=renderer.shade_cap_div)
        if fast:
            # joint-upsample counts as render phase (it replaces rays)
            img, aux = _fast_upsample_jit(
                img, aux, height=renderer.height, width=renderer.width)
        sync(aux)
    if denoise:
        with timer.phase(T_NET):
            weight, guidance = _net_forward_jit(
                aux, renderer.net_params, net_cfg=renderer.net_cfg)
            sync(weight)
        with timer.phase(T_FILTER):
            img = _filter_jit(weight, guidance, img,
                              supports=renderer.net_cfg.supports())
            sync(img)
    if probe and opt.enable_probe:
        from .probe import apply_probe_overlay, retrieve_cursor_lumisphere
        coeffs = retrieve_cursor_lumisphere(
            renderer.tree, jnp.asarray(opt.probe, jnp.float32))
        img = apply_probe_overlay(
            img, renderer.tree, jnp.asarray(transform, jnp.float32),
            coeffs, basis_minmax=opt.basis_minmax,
            probe_disp_size=opt.probe_disp_size)
    timer.frame_done()
    return img, aux
