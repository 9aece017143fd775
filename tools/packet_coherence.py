"""Diagnostic: how much gather sharing would 2x2 ray packets buy?

The march is gather-row bound (~100M rows/s wall, PERF.md).  Neighboring
rays at 800x800 subtend ~1/800 of the frustum while depth-9 cells are
1/512 of the cube, so a 2x2 pixel packet plausibly occupies the SAME
grid cell for most of its march.  If a packet could be marched in
lockstep -- per round, gather ONE row (the cell of the minimum-t lane),
advance every lane currently in that cell, stall the rest -- gather rows
drop by up to 4x at the cost of stall rounds.

This tool replays the oracle traversal (core/oracle.py trace_ray loop,
recording each step's gather unit + entry t) for sampled 2x2 packets of
the bench camera and simulates the election policy, reporting:

  rows_ratio   = packet gather rows / baseline gather rows  (want << 1)
  round_ratio  = packet rounds / max lane steps              (want ~ 1)

for two gather-unit sizes:
  L9: level-9 grid cell  == thin-stage LUT row (8B)
  L7: level-7 grid cell  == brick-stage row (a 4^3 block of L9 cells);
      brick sub-steps within the row are VPU work, not gathers.

Run: nohup python tools/packet_coherence.py > /tmp/packet_coh.log 2>&1 &
CPU-only; ~minutes (oracle is per-ray Python).
"""
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

from rt_octree_tpu.core.camera import Camera
from rt_octree_tpu.core.options import RenderOptions
from rt_octree_tpu.core.oracle import (_dda_unit, _dda_world, sample_dst,
                                       query_single_from_root)
from rt_octree_tpu.io import n3tree
from rt_octree_tpu.utils.rng import Pcg32


def trace_units(tree, dir_world, cen_world, opt, rng, spp, level):
    """March one ray; return (units, t_entry) -- the gather-unit id and
    entry t of every step (the production march gathers one row per
    step, occupied or not)."""
    out_units, out_t = [], []
    d = dir_world.astype(np.float32) * tree.scale
    delta_scale = 1.0 / np.linalg.norm(d)
    d = d * delta_scale
    invdir = 1.0 / (d + 1e-9)
    cen = tree.offset + tree.scale * cen_world
    tmin, tmax = _dda_world(cen, invdir, np.asarray(opt.render_bbox))
    if tmax < 0 or tmin > tmax:
        return out_units, out_t
    t = float(tmin)
    src = 0.0
    dst = sample_dst(spp, rng)
    sppc = 0
    res = 1 << level
    while t < tmax:
        pos = cen + t * d
        sub_ptr, cube_sz, _local = query_single_from_root(tree, pos)
        cell = np.clip((pos * res).astype(np.int64), 0, res - 1)
        out_units.append(int(cell[0] * res * res + cell[1] * res + cell[2]))
        out_t.append(t)
        t_subcube = _dda_unit(_local, invdir) / cube_sz
        delta_t = t_subcube + opt.step_size
        sigma = float(tree.data[sub_ptr, tree.data_dim - 1])
        if sigma > opt.sigma_thresh:
            delta = delta_t * delta_scale * sigma
            if src + delta >= dst[sppc]:
                while sppc < spp and src + delta >= dst[sppc]:
                    sppc += 1
                if sppc == spp:
                    break
            src += delta
        t += delta_t
    return out_units, out_t


def dedupe_runs(units, ts):
    """Collapse consecutive repeats (brick rows: re-entering the same L7
    cell on consecutive steps is ONE gather; the sub-steps ride the row)."""
    du, dt = [], []
    for u, t in zip(units, ts):
        if not du or du[-1] != u:
            du.append(u)
            dt.append(t)
    return du, dt


def simulate_packet(seqs):
    """seqs: list of (units, ts) per lane.  Election policy: per round,
    gather the unit of the min-entry-t unfinished lane; every lane whose
    CURRENT unit matches advances one position.  Returns rounds."""
    pos = [0] * len(seqs)
    rounds = 0
    while True:
        live = [i for i, (u, _) in enumerate(seqs) if pos[i] < len(u)]
        if not live:
            break
        lead = min(live, key=lambda i: seqs[i][1][pos[i]])
        elected = seqs[lead][0][pos[lead]]
        rounds += 1
        for i in live:
            if seqs[i][0][pos[i]] == elected:
                pos[i] += 1
    return rounds


def main():
    tree = n3tree.load(os.path.join(ROOT, ".bench_cache",
                                    "shell_d9_sh9.npz"))
    W = H = 800
    spp = 6
    opt = RenderOptions(spp=spp, denoise=False, step_size=1e-4,
                        sigma_thresh=1e-2)
    cam = Camera(width=W, height=H)
    n_packets = int(os.environ.get("PC_PACKETS", "192"))
    rs = np.random.default_rng(0)
    px = rs.integers(0, W // 2, n_packets) * 2
    py = rs.integers(0, H // 2, n_packets) * 2

    # camera rays exactly as render/renderer.device_camera_rays
    c2w = np.asarray(cam.transform, np.float32)
    fx, fy = cam.fx, cam.fy

    stats = {7: [], 9: []}
    per_ray_rng = Pcg32(20230418)
    for k in range(n_packets):
        lanes = {7: [], 9: []}
        for dy in (0, 1):
            for dx in (0, 1):
                x, y = int(px[k] + dx), int(py[k] + dy)
                sd = np.array([(x - 0.5 * W) / fx,
                               -(y - 0.5 * H) / fy, -1.0], np.float32)
                sd /= np.linalg.norm(sd)
                dir_world = c2w[:, :3] @ sd
                r = per_ray_rng.copy()
                r.advance((y * W + x) * spp)
                u9, t9 = trace_units(tree, dir_world, c2w[:, 3], opt,
                                     r.copy(), spp, 9)
                lanes[9].append((u9, t9))
                lanes[7].append(dedupe_runs(
                    *trace_units(tree, dir_world, c2w[:, 3], opt,
                                 r.copy(), spp, 7)))
        for lvl in (7, 9):
            base_rows = sum(len(u) for u, _ in lanes[lvl])
            max_len = max(len(u) for u, _ in lanes[lvl])
            if base_rows == 0:
                continue
            rounds = simulate_packet(lanes[lvl])
            stats[lvl].append((base_rows, max_len, rounds))
        if (k + 1) % 32 == 0:
            print(f"  {k+1}/{n_packets} packets", flush=True)

    for lvl in (7, 9):
        arr = np.asarray(stats[lvl], np.float64)
        if arr.size == 0:
            continue
        base, mx, rnd = arr.sum(0)
        print(f"L{lvl}: packets={len(arr)}  baseline_rows={base:.0f}  "
              f"packet_rounds(=rows)={rnd:.0f}  "
              f"rows_ratio={rnd/base:.3f}  "
              f"round_ratio={rnd/mx:.3f} (vs lockstep max-lane)",
              flush=True)


if __name__ == "__main__":
    main()
