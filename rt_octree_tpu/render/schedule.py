"""Per-scene compaction-schedule auto-tuning.

The wavefront march's stage divisors (render/renderer.py
DEFAULT_SCHEDULE) encode a survivor curve: how many rays are still
marching after k leaf steps.  That curve is a property of the SCENE and
pose family -- the shipped defaults were measured on the bench shell
scene, and a scene whose survivors overflow a stage cap falls back to
finishing the march at the incoming width (correct, but slow).

``auto_schedule`` replaces the constants with a measurement: a cheap
low-resolution full-width thin march over one or more representative
poses records alive counts at the default stage boundaries, and divisors
are derived with a safety margin.  The probe costs a few full-width
rounds at probe_res^2 rays (~1% of a frame) plus one small jit.

The reference has no analogue (every CUDA thread simply marches to
termination, rt_core.cuh:241-270); this tunes OUR wavefront redesign to
the reference-exact semantics of any scene.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.options import RenderOptions
from ..ops.traversal import DeviceTree
from .renderer import (FrozenOptions, _init_march, _march_loop,
                       device_camera_rays, make_sorted_dst, maybe_world2ndc,
                       rodrigues_jnp)
from ..utils.rng import pcg32_uniforms_range

# Thin-step checkpoints where the probe samples the survivor curve.
# Brick-stage progress is mapped at ~1.5 thin steps per round -- a
# measured UNDERestimate of brick progress on the bench scene (~2.2), so
# derived caps are conservative.  A fine grid up front lets the DP place
# early boundaries for hard-surface scenes whose rays die within ~10
# steps (the measured solid-scene curve: 1/35th alive by step 16).
# Checkpoint 0 samples the PRE-march alive mask (the bbox DDA hit test,
# rt_core.cuh:208-214 semantics): when the tree projects onto a
# minority of the frame (real capture poses with margins), the DP
# places an entry compaction and the whole march runs pre-culled.
# The deep tail (100..330) exists for scenes whose survivor curve keeps
# falling past step 70 -- the LLFF/NDC blobs regime measured (round 4,
# tools/llff_diag.py) median 22 but p90 236 steps/ray: without tail
# checkpoints the DP leaves the drain at ~0.5R width for ~110 brick
# rounds, the dominant cost of the 1911 ms round-3 LLFF frame.
CHECKPOINTS = (0, 1, 2, 3, 4, 6, 8, 11, 16, 22, 30, 40, 52, 70,
               100, 140, 190, 250, 330)
# boundaries at/after this thin-step count use the brick body
BRICK_FROM = 14
# brick sub-steps per round: t_in=4 measured best in-jit on the
# orbit-scene survivor curves (shell/solid, round 3), but long-tail
# regimes spend most rounds stepping WITHIN a brick, where more
# sub-steps per 520B brick gather amortize the fetch: the LLFF/NDC
# frame measured 1560/1102/1544 ms at t_in 4/8/12 (round 4,
# tools/round4_llff_tin.py) -- a 1.42x win at 8, non-monotonic (12
# overshoots brick exits).  derive_schedule switches to 8 when the
# probed survivor curve still carries >TAIL_FRAC of rays at
# checkpoint TAIL_CP (true for LLFF ~10%, false for shell ~1.5% and
# solid ~0%).
T_IN_MID, T_IN_DRAIN = 4, 4
T_IN_TAIL = 8
TAIL_CP = 100
TAIL_FRAC = 0.03
# estimated drain rounds beyond the last checkpoint (cost model only)
DRAIN_ROUNDS = 60.0
# extra thin steps the probe marches past the last checkpoint before
# computing the hit-ray upper bound: still-alive rays count toward the
# bound (they may yet record), so marching the probe closer to drained
# tightens the shade cap toward the true hit count (the bench scene
# measured hits_ub ~1.9x actual hits when bounded at checkpoint 70).
# An under-probed pose only costs the dense shade fallback, never
# correctness.
HITS_EXTRA = 112
# relative per-THIN-EQUIVALENT-STEP cost of brick marching: a brick
# round costs ~2x a thin round per row (520B row + the sub-step VPU
# block) and delivers ~1.5 steps -> 2/1.5.  Without this the DP
# under-compacts in the brick phase (measured 43 ms worse than the
# hand schedule on the shell with near-identical divisors).
BRICK_STEP_COST = 2.0 / 1.5


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "fx", "fy", "opt", "inc", "checkpoints"))
def _probe_counts(tree: DeviceTree, transform, state_hi, state_lo, *,
                  width: int, height: int, fx: float, fy: float,
                  opt: FrozenOptions, inc: int,
                  checkpoints: tuple) -> jax.Array:
    """Alive-ray counts after each checkpoint's thin steps, full width."""
    spp = opt.spp
    R = width * height
    dirs, cens = device_camera_rays(transform, width, height, fx, fy)
    wdirs, wcens = maybe_world2ndc(tree, dirs, cens)
    uniforms = pcg32_uniforms_range(
        state_hi, state_lo, n=R * spp, inc=inc).reshape(R, spp)
    dst = make_sorted_dst(uniforms)
    consts, state = _init_march(tree, wdirs, wcens, dst, opt)
    counts, deadcum = [], []
    prev = 0
    for cp in checkpoints:
        state = _march_loop(tree, opt, spp, consts, state, cp - prev)
        prev = cp
        counts.append(jnp.sum(state[0].astype(jnp.int32)))
        # cumulative rays dead WITH recorded hits (shade-on-death
        # boundary cap sizing: the boundary at checkpoint j extracts
        # deadcum[j] - deadcum[i] rays)
        deadcum.append(jnp.sum(
            ((~state[0]) & (state[3] > 0)).astype(jnp.int32)))
    # upper bound on HIT rays (shade-cap sizing): rays that recorded a
    # crossing so far, plus every still-alive ray (it may yet record);
    # march further first so "still alive" inflates the bound less
    state = _march_loop(tree, opt, spp, consts, state, HITS_EXTRA)
    hits_ub = jnp.sum((state[3] > 0).astype(jnp.int32)) + \
        jnp.sum((state[0] & (state[3] == 0)).astype(jnp.int32))
    return jnp.stack(counts + deadcum + [hits_ub])


def probe_survivors(tree: DeviceTree, poses: Sequence[np.ndarray],
                    options: RenderOptions, fx: float, fy: float,
                    width: int, height: int, probe_res: int = 200,
                    seed: int = 20230418,
                    checkpoints: tuple = CHECKPOINTS) -> np.ndarray:
    """Max survivor FRACTION over ``poses`` at each checkpoint.

    The probe renders at ``probe_res`` x ``probe_res`` with the focal
    scaled to preserve the field of view, so the survivor fraction
    matches the full-resolution frame."""
    from ..utils.rng import Pcg32
    rng = Pcg32(seed)
    sx = probe_res / float(width)
    sy = probe_res / float(height)
    opt = FrozenOptions.from_options(options)
    R = probe_res * probe_res
    best = np.zeros(2 * len(checkpoints) + 1, np.int64)
    for pose in poses:
        c = _probe_counts(
            tree, jnp.asarray(np.asarray(pose, np.float32)[:3]),
            jnp.uint32(rng.state >> 32), jnp.uint32(rng.state & 0xFFFFFFFF),
            width=probe_res, height=probe_res, fx=fx * sx, fy=fy * sy,
            opt=opt, inc=rng.inc, checkpoints=tuple(checkpoints))
        best = np.maximum(best, np.asarray(c, np.int64))
    # [survivor fracs at checkpoints..., cumulative dead-with-hits
    #  fracs at checkpoints..., hit-ray upper-bound frac]
    return best / float(R)


def derive_schedule(fracs: np.ndarray, margin: float = 1.4,
                    max_divisor: float = 256.0,
                    checkpoints: tuple = CHECKPOINTS,
                    dead_margin: float = 2.5) -> tuple:
    """Survivor fractions at ``checkpoints`` -> (steps, divisor, kind,
    t_in, dead_div) stages, with compaction boundaries placed by a small
    DP over the measured TPU cost model.  ``dead_div`` caps the
    shade-on-death extraction at each boundary from the probed
    cumulative dead-with-hits curve with ``dead_margin`` headroom (an
    undersized cap falls back to dense at-width shading -- correct,
    slower; oversized costs only spare gather rows).

    March rounds and compactions both cost ~17 ns per row (PERF.md), so
    in units of R x 17ns: marching from checkpoint i to j at width w_i
    costs w_i * (cp_j - cp_i), and compacting at j costs (w_i + w_j).
    The DP minimizes total cost over boundary subsets -- hard-surface
    scenes (survivors collapse within ~10 steps) get aggressive early
    compaction; soft-fringe scenes keep the shallow early stages.
    Widths carry ``margin`` so every cap holds the measured survivors;
    a cap overflow at render time falls back at-width (never wrong).
    """
    fracs = np.asarray(fracs, np.float64)
    cps = np.asarray(checkpoints, np.float64)
    n = len(cps)
    # long-tail regime detection for the brick t_in choice (see the
    # T_IN_TAIL comment above): survivors at the first checkpoint at or
    # past TAIL_CP
    i_tail = int(np.searchsorted(cps, TAIL_CP))
    t_brick = T_IN_MID
    t_drain = T_IN_DRAIN
    if i_tail < n and fracs[i_tail] > TAIL_FRAC:
        t_brick = t_drain = T_IN_TAIL
    if fracs.shape[0] >= 2 * n:  # probe with the dead-with-hits curve
        deadcum = np.concatenate([[0.0], fracs[n:2 * n]])  # node-indexed
    else:  # legacy probe layout: conservative flat default
        deadcum = None
    fracs = fracs[:n]
    # node 0 = frame start (width 1); nodes 1..n = checkpoints, where
    # node i's width (fraction of R) is the margined survivor count
    nodes = np.concatenate([[0.0], cps])
    wid = np.concatenate(
        [[1.0], np.clip(fracs * margin, 1.0 / max_divisor, 1.0)])
    # best[j] = min cost of reaching node j having just compacted there
    # (units: R x 17ns -- march wid*steps, compact wid_in + wid_out)
    def seg_cost(a, b):
        """March cost of thin-equivalent steps [a, b] at unit width:
        thin steps cost 1, brick-phase steps cost BRICK_STEP_COST."""
        thin = max(min(b, BRICK_FROM) - a, 0.0)
        brick = max(b - max(a, BRICK_FROM), 0.0)
        return thin + brick * BRICK_STEP_COST

    best = np.full(n + 1, np.inf)
    prev = np.full(n + 1, -1, np.int64)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(j):
            if best[i] == np.inf or wid[j] >= wid[i] * 0.999:
                continue  # compacting to a non-smaller width: pure cost
            c = best[i] + wid[i] * seg_cost(nodes[i], nodes[j]) + \
                (wid[i] + wid[j])
            if c < best[j]:
                best[j] = c
                prev[j] = i
    # close each candidate last boundary with the march to the end of
    # the grid plus the estimated drain, all at that boundary's width
    close = best + wid * np.array(
        [seg_cost(x, nodes[-1]) + DRAIN_ROUNDS * BRICK_STEP_COST
         for x in nodes])
    jlast = int(np.argmin(close))
    chain = []
    j = jlast
    while j > 0:
        chain.append(j)
        j = int(prev[j])
    chain.reverse()

    def dead_div_at(j_entry, j_before):
        """Dead-ray cap divisor for the boundary at chain node j_entry
        (extracts deaths accumulated since node j_before)."""
        if deadcum is None:
            return None  # _normalize_schedule's 2x-prev-div default
        delta = max(deadcum[j_entry] - deadcum[j_before], 0.0)
        # floor keeps a modest always-on cap: a zero-measured boundary
        # still gets cheap insurance rows instead of risking the dense
        # at-width fallback on an unprobed pose
        frac = max(delta * dead_margin, 1.0 / 1024.0)
        return float(np.clip(1.0 / frac, 1.0, 1024.0))

    stages = []
    prev_cp, prev_div = 0.0, 1.0
    j_before = 0  # chain node before the segment's entry boundary
    j_entry = 0
    for j in chain:
        cp = nodes[j]
        seg = cp - prev_cp
        if seg > 0:
            dd = dead_div_at(j_entry, j_before)
            if prev_cp >= BRICK_FROM:
                # brick rounds mapped at 1.5 thin steps/round -- a
                # measured UNDERestimate of delivery (~2.2), so rounds
                # overshoot progress and every boundary cap holds with
                # extra headroom (an A/B of tighter mappings with
                # re-derived conservative caps measured WORSE on both
                # bench scenes: tools/round3_exp6.py)
                rounds = max(int(np.ceil(seg / 1.5)), 1)
                # plan total sub-steps with the measured t_in=4 mapping,
                # then repack them into t_brick-wide rounds (the exact
                # configuration the round-4 LLFF A/B measured): same
                # cell-step budget, fewer brick gathers per ray
                steps = rounds * T_IN_MID
                steps = int(np.ceil(steps / t_brick)) * t_brick
                st = (steps, prev_div, "brick", t_brick)
            else:
                st = (int(seg), prev_div, "thin", T_IN_MID)
            stages.append(st if dd is None else st + (dd,))
        prev_cp = cp
        prev_div = min(float(1.0 / wid[j]), max_divisor)
        j_before, j_entry = j_entry, j
    dd = dead_div_at(j_entry, j_before)
    drain = (0, prev_div, "brick", t_drain)
    stages.append(drain if dd is None else drain + (dd,))
    return tuple(stages)


def derive_shade_div(hit_frac: float, margin: float = 1.25,
                     max_div: int = 16) -> int:
    """Hit-ray upper-bound fraction -> shade compaction divisor (the
    [R // div, spp] hit-compact cap in renderer._shade); conservative
    floor of 4 matches the untuned default's worst-case assumption.

    The probed fraction is already an UPPER bound (recorded hits plus
    every still-alive ray after 442 thin steps), and the bench shell
    measured it within ~5% of the true hit count -- margin 1.25 keeps
    the [cap_h, spp] shading gather (the shade cost driver, ~30 ns/row
    at large tables) tight while an overflow pose still only costs the
    exact dense fallback."""
    div = int(1.0 / max(float(hit_frac) * margin, 1.0 / max_div))
    return int(np.clip(div, 1, max_div))


def auto_schedule(tree: DeviceTree, poses, options: RenderOptions,
                  fx: float, fy: float, width: int, height: int,
                  probe_res: int = 200, margin: float = 1.4,
                  with_shade_div: bool = False):
    """One-call tuner: probe ``poses`` and derive the stage schedule
    (plus the shade-cap divisor when ``with_shade_div``)."""
    poses = np.asarray(poses, np.float32)
    if poses.ndim == 2:
        poses = poses[None]
    poses = [p[:3] for p in poses]
    fracs = probe_survivors(tree, poses, options, fx, fy, width, height,
                            probe_res=probe_res)
    sched = derive_schedule(fracs, margin=margin)
    if with_shade_div:
        return sched, derive_shade_div(fracs[-1])
    return sched
