"""Pure-NumPy scalar reference renderer (the correctness oracle).

A faithful re-statement of the reference CUDA semantics in plain Python:
  - octree query          (internal/n3tree_query.hpp:13-48)
  - sorted free-flight sampling  (cuda/rt_core.cuh:67-193)
  - batched regular tracking     (cuda/rt_core.cuh:195-332)
  - per-pixel render + aux buffer (cuda/volrend.cu:84-213)

Slow (seconds for a 64x64 image); used only to validate the vectorized
XLA/Pallas implementations bit-for-bit (same PCG32 stream) on tiny scenes.
"""

from __future__ import annotations

import numpy as np

from ..io.n3tree import N3Tree
from ..utils.rng import Pcg32
from .camera import Camera
from .options import RenderOptions
from .sh_np import eval_basis_np


def query_single_from_root(tree: N3Tree, xyz: np.ndarray):
    """Returns (data_ptr, cube_sz, xyz_local). xyz is tree-space [0,1]^3."""
    N = tree.N
    N3 = tree.N3
    xyz = np.clip(xyz.astype(np.float32), 0.0, 1.0 - 1e-6).copy()
    ptr = 0
    cube_sz = float(N)
    while True:
        index = 0.0
        for i in range(3):
            xyz[i] *= N
            idx_dimi = np.floor(xyz[i])
            index = index * N + idx_dimi
            xyz[i] -= idx_dimi
        sub_ptr = ptr + int(index)
        skip = int(tree.child[sub_ptr])
        if skip == 0:
            return sub_ptr, cube_sz, xyz
        cube_sz *= N
        ptr += skip * N3


def build_skip_grid(tree: N3Tree, levels: int, cap: int = 12):
    """Chebyshev empty-space distances on the full-depth cell grid,
    mirroring ops/traversal._add_skip_distances: dist[cell] = capped
    Chebyshev distance to the nearest cell whose leaf sigma > 0 (0 at
    occupied cells).  Returns (grid [res,res,res] int32, res)."""
    res = tree.N ** levels
    occ = np.zeros((res, res, res), bool)
    for x in range(res):
        for y in range(res):
            for z in range(res):
                p = (np.array([x, y, z], np.float32) + 0.5) / res
                ptr, _, _ = query_single_from_root(tree, p)
                occ[x, y, z] = float(tree.data[ptr, tree.data_dim - 1]) > 0
    INF = np.int32(cap + 1)
    d = np.where(occ, 0, INF).astype(np.int32)
    for _ in range(cap):
        p = np.pad(d, 1, constant_values=INF)
        m = d.copy()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    if dx == dy == dz == 0:
                        continue
                    m = np.minimum(
                        m, p[1 + dx:res + 1 + dx, 1 + dy:res + 1 + dy,
                             1 + dz:res + 1 + dz] + 1)
        d = np.minimum(d, m)
    return np.minimum(d, cap), res


def _apply_skip(pos, invdir, t_subcube, skip):
    """Extend a step's exit distance across the safe empty cube
    (render/renderer.py _query_step twin)."""
    grid, res = skip
    pc = np.clip(pos, 0.0, 1.0 - 1e-6).astype(np.float32)
    cell = np.floor(pc * res)
    d = int(grid[int(cell[0]), int(cell[1]), int(cell[2])])
    if d <= 1:
        return t_subcube
    lo = (cell - (d - 1.0)) / res
    hi = (cell + float(d)) / res
    t_box = 1e30
    for i in range(3):
        t_box = min(t_box, max((lo[i] - pc[i]) * invdir[i],
                               (hi[i] - pc[i]) * invdir[i]))
    return max(t_subcube, t_box)


def sample_dst(spp: int, rng: Pcg32) -> np.ndarray:
    """Sorted exponential free-flight thresholds + sentinel (rt_core.cuh:67-193).

    The insertion-sort construction is order-equivalent to drawing spp
    exponentials in stream order and sorting ascending.
    """
    draws = np.array([-np.log(1.0 - rng.next_float()) for _ in range(spp)],
                     np.float32)
    dst = np.sort(draws)
    return np.concatenate([dst, [np.finfo(np.float32).max]])


def _dda_world(cen, invdir, render_bbox):
    tmin, tmax = 0.0, 1e4
    for i in range(3):
        t1 = (render_bbox[i] + 1e-6 - cen[i]) * invdir[i]
        t2 = (render_bbox[i + 3] - 1e-6 - cen[i]) * invdir[i]
        tmin = max(tmin, min(t1, t2))
        tmax = min(tmax, max(t1, t2))
    return tmin, tmax


def _dda_unit(cen, invdir):
    tmax = 1e4
    for i in range(3):
        t1 = -cen[i] * invdir[i]
        t2 = t1 + invdir[i]
        tmax = min(tmax, max(t1, t2))
    return tmax


def trace_ray(tree: N3Tree, dir_world: np.ndarray, vdir: np.ndarray,
              cen: np.ndarray, opt: RenderOptions, tmax_bg: float,
              rng: Pcg32, spp: int, skip=None) -> np.ndarray:
    """Returns out[4] = premultiplied rgb + alpha (NOT bg-composited).
    ``skip``: optional (dist_grid, res) from build_skip_grid enabling the
    exact empty-space jump the device march uses."""
    out = np.zeros(4, np.float32)
    d = dir_world.astype(np.float32) * tree.scale
    delta_scale = 1.0 / np.linalg.norm(d)
    d = d * delta_scale
    tmax_bg = tmax_bg / delta_scale

    invdir = 1.0 / (d + 1e-9)
    tmin, tmax = _dda_world(cen, invdir, np.asarray(opt.render_bbox))
    tmax = min(tmax, tmax_bg)
    if tmax < 0 or tmin > tmax:
        return out

    t = tmin
    src = 0.0
    dst = sample_dst(spp, rng)
    tree_ptrs = []
    cnts = []
    sppc = 0

    while t < tmax:
        pos = cen + t * d
        sub_ptr, cube_sz, _local = query_single_from_root(tree, pos)
        # NOTE: dda uses the leaf-local coords the query produced
        t_subcube = _dda_unit(_local, invdir) / cube_sz
        if skip is not None:
            t_subcube = _apply_skip(pos, invdir, t_subcube, skip)
        delta_t = t_subcube + opt.step_size
        sigma = float(tree.data[sub_ptr, tree.data_dim - 1])
        if sigma > opt.sigma_thresh:
            delta = delta_t * delta_scale * sigma
            if src + delta >= dst[sppc]:
                cnt = 0
                tree_ptrs.append(sub_ptr)
                while src + delta >= dst[sppc]:
                    cnt += 1
                    sppc += 1
                cnts.append(cnt)
                if sppc == spp:
                    break
            src += delta
        t += delta_t

    if not tree_ptrs:
        return out

    basis_dim = tree.data_format.basis_dim
    basis_fn = eval_basis_np(tree, vdir)
    basis_fn = basis_fn.copy()
    basis_fn[:opt.basis_minmax[0]] = 0.0
    basis_fn[opt.basis_minmax[1] + 1:] = 0.0

    for ptr, cnt in zip(tree_ptrs, cnts):
        vals = tree.data[ptr].astype(np.float32)
        if basis_dim >= 0:
            for c in range(3):
                tmp = float(
                    basis_fn[:basis_dim] @ vals[c * basis_dim:(c + 1) * basis_dim])
                out[c] += cnt / (1.0 + np.exp(-tmp))
        else:
            out[:3] += vals[:3] * cnt
        out[3] += cnt
    out /= spp
    return out


def trace_ray_classic(tree: N3Tree, dir_world: np.ndarray, vdir: np.ndarray,
                      cen: np.ndarray, opt: RenderOptions,
                      tmax_bg: float) -> np.ndarray:
    """Classic exponential-transmittance marcher (shaders/rt.frag:222-327).

    Returns out[4] = accumulated rgb (pre-background) + alpha, where
    alpha = 1 - remaining transmittance; on a stop_thresh early-out the
    color is renormalized by 1/(1-T) and alpha set to 1 (rt.frag:313-318),
    so ``rgb + (1-alpha)*bg`` reproduces the shader's final color."""
    out = np.zeros(4, np.float32)
    d = dir_world.astype(np.float32) * tree.scale
    delta_scale = 1.0 / np.linalg.norm(d)
    d = d * delta_scale
    tmax_bg = tmax_bg / delta_scale

    invdir = 1.0 / (d + 1e-9)
    tmin, tmax = _dda_world(cen, invdir, np.asarray(opt.render_bbox))
    tmax = min(tmax, tmax_bg)
    if tmax < 0 or tmin > tmax:
        return out

    basis_dim = tree.data_format.basis_dim
    basis_fn = eval_basis_np(tree, vdir).copy()
    basis_fn[:opt.basis_minmax[0]] = 0.0
    basis_fn[opt.basis_minmax[1] + 1:] = 0.0

    light = 1.0
    t = tmin
    rgb = np.zeros(3, np.float32)
    while t < tmax:
        pos = cen + t * d
        sub_ptr, cube_sz, _local = query_single_from_root(tree, pos)
        t_subcube = _dda_unit(_local, invdir) / cube_sz
        delta_t = t_subcube + opt.step_size
        sigma = float(tree.data[sub_ptr, tree.data_dim - 1])
        if sigma > opt.sigma_thresh:
            att = min(np.exp(-delta_t * delta_scale * sigma), 1.0)
            weight = light * (1.0 - att)
            vals = tree.data[sub_ptr].astype(np.float32)
            if basis_dim >= 0:
                for c in range(3):
                    tmp = float(basis_fn[:basis_dim] @
                                vals[c * basis_dim:(c + 1) * basis_dim])
                    rgb[c] += weight / (1.0 + np.exp(-tmp))
            else:
                rgb += weight * vals[:3]
            light *= att
            if light < opt.stop_thresh:
                rgb *= 1.0 / (1.0 - light)
                light = 0.0
                break
        t += delta_t
    out[:3] = rgb
    out[3] = 1.0 - light
    return out


def render_frame_classic_oracle(tree: N3Tree, cam: Camera,
                                opt: RenderOptions) -> np.ndarray:
    """Deterministic classic-marcher frame, img [H,W,4] (rt.frag main)."""
    from .camera import camera_rays, rodrigues

    W, H = cam.width, cam.height
    dirs, origin = camera_rays(cam)
    img = np.zeros((H, W, 4), np.float32)
    rot = np.asarray(opt.rot_dirs, np.float32)
    for idx in range(H * W):
        x, y = idx % W, idx // W
        d = dirs[idx].copy()
        cen = origin.copy()
        vdir = rodrigues(rot, d[None])[0]
        d, cen = maybe_world2ndc(tree, d, cen)
        cen = tree.offset + tree.scale * cen
        out = trace_ray_classic(tree, d, vdir, cen, opt, 1e9)
        img[y, x, :3] = out[:3] + opt.background_brightness * (1.0 - out[3])
        img[y, x, 3] = 1.0
    return img


def maybe_world2ndc(tree: N3Tree, dir, cen):
    """LLFF NDC warp (volrend.cu:35-56)."""
    if not tree.use_ndc or tree.ndc_width <= 0:
        return dir, cen
    dir = dir.astype(np.float64).copy()
    cen = cen.astype(np.float64).copy()
    t = -(1.0 + cen[2]) / dir[2]
    cen = cen + t * dir
    ndir = np.empty(3)
    ndir[0] = -((2 * tree.ndc_focal) / tree.ndc_width) * (
        dir[0] / dir[2] - cen[0] / cen[2])
    ndir[1] = -((2 * tree.ndc_focal) / tree.ndc_height) * (
        dir[1] / dir[2] - cen[1] / cen[2])
    ndir[2] = -2.0 / cen[2]
    ncen = np.empty(3)
    ncen[0] = -((2 * tree.ndc_focal) / tree.ndc_width) * (cen[0] / cen[2])
    ncen[1] = -((2 * tree.ndc_focal) / tree.ndc_height) * (cen[1] / cen[2])
    ncen[2] = 1.0 + 2.0 / cen[2]
    ndir /= np.linalg.norm(ndir)
    return ndir.astype(np.float32), ncen.astype(np.float32)


def render_frame_oracle(tree: N3Tree, cam: Camera, opt: RenderOptions,
                        rng: Pcg32, skip=None) -> tuple[np.ndarray, np.ndarray]:
    """Renders image [H,W,4] and aux buffer [8,H,W] (volrend.cu:84-213).

    The caller owns per-frame rng advancement (rng.advance() per frame).
    """
    from .camera import camera_rays, rodrigues

    W, H = cam.width, cam.height
    dirs, origin = camera_rays(cam)
    aux = np.zeros((8, H, W), np.float32)
    img = np.zeros((H, W, 4), np.float32)
    rot = np.asarray(opt.rot_dirs, np.float32)

    for idx in range(H * W):
        x, y = idx % W, idx // W
        out = np.zeros(4, np.float32)
        d = dirs[idx].copy()
        cen = origin.copy()
        vdir = d.copy()
        d, cen = maybe_world2ndc(tree, d, cen)
        cen = tree.offset + tree.scale * cen
        vdir = rodrigues(rot, vdir[None])[0]

        r = rng.copy()
        r.advance(idx * opt.spp)
        out = trace_ray(tree, d, vdir, cen, opt, 1e9, r, opt.spp, skip=skip)

        nalpha = 1.0 - out[3]
        out[:3] += opt.background_brightness * nalpha
        aux[0:4, y, x] = out
        aux[4:8, y, x] = out * out
        img[y, x, :3] = out[:3]
        img[y, x, 3] = 1.0
    return img, aux
