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

# Thin-step checkpoints mirroring the DEFAULT_SCHEDULE stage boundaries.
# Brick stages (6/8/10/12 rounds) are mapped at ~1.5 thin steps per round
# -- a measured UNDERestimate of brick progress on the bench scene (~2.2),
# so derived caps are conservative.
CHECKPOINTS = (2, 6, 16, 25, 37, 52, 70)
# march kinds per derived stage (stage 0 is full width)
KINDS = ("thin", "thin", "thin", "brick", "brick", "brick", "brick",
         "brick")
# steps budget per stage, in _march_loop counted steps (brick rounds
# count t_in each): identical to DEFAULT_SCHEDULE
STEPS = (2, 4, 10, 24, 32, 40, 48, 0)
# brick sub-steps per round; the drain runs t_in=12 (measured)
T_INS = (4, 4, 4, 4, 4, 4, 4, 12)


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
    counts = []
    prev = 0
    for cp in checkpoints:
        state = _march_loop(tree, opt, spp, consts, state, cp - prev)
        prev = cp
        counts.append(jnp.sum(state[0].astype(jnp.int32)))
    return jnp.stack(counts)


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
    best = np.zeros(len(checkpoints), np.int64)
    for pose in poses:
        c = _probe_counts(
            tree, jnp.asarray(np.asarray(pose, np.float32)[:3]),
            jnp.uint32(rng.state >> 32), jnp.uint32(rng.state & 0xFFFFFFFF),
            width=probe_res, height=probe_res, fx=fx * sx, fy=fy * sy,
            opt=opt, inc=rng.inc, checkpoints=tuple(checkpoints))
        best = np.maximum(best, np.asarray(c, np.int64))
    return best / float(R)


def derive_schedule(fracs: np.ndarray, margin: float = 1.4,
                    max_divisor: float = 256.0) -> tuple:
    """Survivor fractions at CHECKPOINTS -> (steps, divisor, kind) stages.

    divisor_i = 1 / (frac_i * margin), monotone nondecreasing, so each
    stage's cap holds the measured survivors with headroom; a divisor
    that stops paying (< 1.15x the previous width) keeps the previous
    width (compaction costs ~(W_in + W_out) x 17ns -- skip tiny drops).
    """
    fracs = np.asarray(fracs, np.float64)
    stages = [(STEPS[0], 1.0, KINDS[0], T_INS[0])]
    prev_div = 1.0
    for i, frac in enumerate(fracs):
        div = 1.0 / max(frac * margin, 1.0 / max_divisor)
        div = float(np.clip(div, prev_div, max_divisor))
        if div < prev_div * 1.15:
            div = prev_div
        stages.append((STEPS[i + 1], div, KINDS[i + 1], T_INS[i + 1]))
        prev_div = div
    return tuple(stages)


def auto_schedule(tree: DeviceTree, poses, options: RenderOptions,
                  fx: float, fy: float, width: int, height: int,
                  probe_res: int = 200, margin: float = 1.4) -> tuple:
    """One-call tuner: probe ``poses`` and derive the stage schedule."""
    poses = np.asarray(poses, np.float32)
    if poses.ndim == 2:
        poses = poses[None]
    poses = [p[:3] for p in poses]
    fracs = probe_survivors(tree, poses, options, fx, fy, width, height,
                            probe_res=probe_res)
    return derive_schedule(fracs, margin=margin)
