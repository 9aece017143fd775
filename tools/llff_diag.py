"""LLFF/NDC regime diagnosis (round 4, VERDICT item 2).

Replays the NumPy-oracle traversal for sampled rays of the LLFF bench
pose (bench.py llff_scene_fps setup) and decomposes WHERE the march's
steps go: empty vs occupied cells, leaf depth (cube_sz) distribution,
skip-jump effectiveness, and per-ray step counts to drain.  Runs
entirely off-device.

Env: LD_RAYS (default 256 sampled rays), LD_SKIP_CAP (default 12),
LD_SCENE (blobs), LD_SPP (6).
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from bench import get_tree  # noqa: E402
from rt_octree_tpu.core.camera import Camera  # noqa: E402
from rt_octree_tpu.core.options import RenderOptions  # noqa: E402
from rt_octree_tpu.core import oracle  # noqa: E402
from rt_octree_tpu.utils.rng import Pcg32  # noqa: E402

N_RAYS = int(os.environ.get("LD_RAYS", "256"))
SKIP_CAP = int(os.environ.get("LD_SKIP_CAP", "12"))
SCENE = os.environ.get("LD_SCENE", "blobs")
SPP = int(os.environ.get("LD_SPP", "6"))


def traced_ray(tree, dir_world, cen, opt, tmax_bg, rng, spp, skip):
    """oracle.trace_ray with step instrumentation (same control flow)."""
    stats = {"steps": 0, "empty": 0, "occ": 0, "skipped": 0,
             "depth_hist": {}, "drained": False, "t_end": 0.0,
             "sub_below": 0}
    d = dir_world.astype(np.float32) * tree.scale
    delta_scale = 1.0 / np.linalg.norm(d)
    d = d * delta_scale
    tmax_bg = tmax_bg / delta_scale
    invdir = 1.0 / (d + 1e-9)
    tmin, tmax = oracle._dda_world(cen, invdir, np.asarray(opt.render_bbox))
    tmax = min(tmax, tmax_bg)
    if tmax < 0 or tmin > tmax:
        return stats
    t = tmin
    src = 0.0
    dst = oracle.sample_dst(spp, rng)
    sppc = 0
    while t < tmax:
        pos = cen + t * d
        sub_ptr, cube_sz, _local = oracle.query_single_from_root(tree, pos)
        t_sub_raw = oracle._dda_unit(_local, invdir) / cube_sz
        t_subcube = t_sub_raw
        if skip is not None:
            t_subcube = oracle._apply_skip(pos, invdir, t_sub_raw, skip)
            if t_subcube > t_sub_raw * 1.001:
                stats["skipped"] += 1
        delta_t = t_subcube + opt.step_size
        sigma = float(tree.data[sub_ptr, tree.data_dim - 1])
        lvl = int(round(np.log2(max(cube_sz, 1))))
        stats["depth_hist"][lvl] = stats["depth_hist"].get(lvl, 0) + 1
        if sigma > opt.sigma_thresh:
            stats["occ"] += 1
            delta = delta_t * delta_scale * sigma
            if src + delta >= dst[sppc]:
                while src + delta >= dst[sppc]:
                    sppc += 1
                    if sppc == spp:
                        break
                if sppc == spp:
                    stats["drained"] = True
                    break
            src += delta
            if src < dst[min(sppc, spp - 1)] and delta > 0:
                stats["sub_below"] += 1
        else:
            stats["empty"] += 1
        t += delta_t
        stats["steps"] += 1
    stats["t_end"] = float(t)
    return stats


def main():
    tree = get_tree(SCENE)
    s = 1.0
    W, H, focal = int(1008 * s), int(756 * s), 800.0 * s
    tree.use_ndc = True
    tree.ndc_width = float(W)
    tree.ndc_height = float(H)
    tree.ndc_focal = focal
    opt = RenderOptions(spp=SPP, denoise=False)

    cam = Camera(width=W, height=H, fx=focal, fy=focal)
    cam.center = np.array([0.02, 0.01, 0.3], np.float32)
    cam.v_back = np.array([0.0, 0.0, 1.0], np.float32)
    cam.v_world_up = np.array([0.0, 1.0, 0.0], np.float32)
    cam.update()

    skip = None
    if SKIP_CAP > 0:
        lvl = min(9, tree.max_depth)
        skip = oracle.build_skip_grid(tree, lvl, cap=SKIP_CAP)
        print(f"skip grid: levels={lvl} cap={SKIP_CAP}")

    rng_pix = np.random.default_rng(3)
    idxs = rng_pix.integers(0, W * H, N_RAYS)

    # pixel -> world ray -> NDC warp -> tree space (render_frame_oracle
    # semantics, oracle.py:311-323)
    from rt_octree_tpu.core.camera import camera_rays
    dirs, origin = camera_rays(cam)
    rng = Pcg32(20230418)

    all_stats = []
    for idx in idxs:
        d = dirs[idx].copy()
        cen = origin.copy()
        dw, cw = oracle.maybe_world2ndc(tree, d, cen)
        cen = tree.offset + tree.scale * cw
        r = rng.copy()
        r.advance(int(idx) * SPP)
        st = traced_ray(tree, dw, cen, opt, 1e9, r, SPP, skip)
        all_stats.append(st)

    steps = np.array([s["steps"] for s in all_stats])
    empty = np.array([s["empty"] for s in all_stats])
    occ = np.array([s["occ"] for s in all_stats])
    skipped = np.array([s["skipped"] for s in all_stats])
    drained = np.array([s["drained"] for s in all_stats])
    subb = np.array([s["sub_below"] for s in all_stats])

    print(f"scene={SCENE} rays={N_RAYS} spp={SPP} skip_cap={SKIP_CAP}")
    print(f"steps/ray: mean {steps.mean():.1f} median {np.median(steps):.0f}"
          f" p90 {np.percentile(steps, 90):.0f} max {steps.max()}")
    print(f"empty-cell steps: mean {empty.mean():.1f} "
          f"({100*empty.sum()/max(steps.sum(),1):.0f}% of all steps); "
          f"skip-jumps taken: mean {skipped.mean():.1f}")
    print(f"occupied steps: mean {occ.mean():.1f}; sub-threshold-crossing "
          f"occupied steps: mean {subb.mean():.1f}")
    print(f"drained (all spp consumed): {100*drained.mean():.0f}% of rays")
    hist = {}
    for s_ in all_stats:
        for lvl, c in s_["depth_hist"].items():
            hist[lvl] = hist.get(lvl, 0) + c
    total = sum(hist.values())
    print("leaf-level distribution of steps (level: % of steps):")
    for lvl in sorted(hist):
        print(f"  {lvl:2d}: {100*hist[lvl]/total:5.1f}%")


if __name__ == "__main__":
    main()
