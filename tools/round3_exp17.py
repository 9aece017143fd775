"""Round-3 exp17: cross-ray leaf duplication in the final shade.

The final shade gathers one [data_dim] f16 tree row per (hit ray,
distinct-leaf record slot) -- ~cap_h*spp rows/frame (~22% of the frame,
exp15).  Neighboring pixels plausibly record the SAME hit leaves, so a
sort/unique dedup before the gather could shrink it.  This measures the
actual duplication factor on the bench scene before any kernel work:

  slots      live record slots (cnt > 0) across all hit rays
  unique     distinct leaf ptrs among them (global sort/unique)
  tile64     mean distinct fraction within 64-slot tiles of the
             row-major shade order (locality a tiled dedup could use
             without a global sort)

Records are FINAL at ray death and never change after (shade-on-death
invariant), so a plain full-width march yields the identical slot
multiset to the production sbuf -- no need to replicate the compaction
schedule here.  Run on CPU at reduced resolution (dedup only improves
with resolution, so a small run is conservative) or on TPU at 800x800:

  JAX_PLATFORMS=cpu RT_EXP17_RES=400 python tools/round3_exp17.py
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import n3tree
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render import renderer as RR
    from rt_octree_tpu.utils.rng import pcg32_uniforms_range

    res = int(os.environ.get("RT_EXP17_RES", "400"))
    spp = int(os.environ.get("RT_EXP17_SPP", "6"))
    lut = int(os.environ.get("RT_EXP17_LUT", "6"))
    print(f"devices: {jax.devices()}  res={res} spp={spp} lut={lut}",
          flush=True)
    tree = n3tree.load(os.path.join(ROOT, ".bench_cache",
                                    "shell_d9_sh9.npz"))
    t0 = time.time()
    dt = upload_tree(tree, lut_levels=lut)
    print(f"upload_tree: {time.time()-t0:.0f}s", flush=True)

    W = H = res
    R = W * H
    # full-res focal scaled to the probe resolution (same fov as bench)
    cam = Camera(width=W, height=H, fx=1111.11 * res / 800.0,
                 fy=1111.11 * res / 800.0)
    opt = RR.FrozenOptions.from_options(RenderOptions(
        spp=spp, denoise=False, step_size=1e-4, sigma_thresh=1e-2,
        background_brightness=1.0))
    transform = jnp.asarray(cam.transform, jnp.float32)
    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)

    @jax.jit
    def march_records(dtree, transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx,
                                           cam.fy)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        consts, state = RR._init_march(dtree, dirs, cens, dst, opt)
        st = RR._march_loop(dtree, opt, spp, consts, state, 8192,
                            unroll=2, brick=(dt.brick_levels > 0),
                            t_in=4)
        return st[5]

    t0 = time.time()
    recs = np.asarray(march_records(dt, transform, hi, lo))
    print(f"march: {time.time()-t0:.0f}s", flush=True)

    from rt_octree_tpu.render.renderer import _recs_split
    leafs, cnts = (np.asarray(x) for x in
                   _recs_split(jnp.asarray(recs), spp))
    live = cnts > 0                       # [R, spp] live record slots
    hit_rays = int((cnts[:, 0] > 0).sum())
    slots = int(live.sum())
    flat = leafs[live]
    unique = int(np.unique(flat).size)

    # tiled locality: shade order is row-major ray order; a tiled dedup
    # would only see duplication within its tile
    order = np.repeat(np.arange(R), spp).reshape(R, spp)[live]
    idx = np.argsort(order, kind="stable")
    flat_o = flat[idx]
    for tile in (64, 256, 1024):
        nt = len(flat_o) // tile
        if nt == 0:
            continue
        body = flat_o[:nt * tile].reshape(nt, tile)
        uniq = np.array([np.unique(r).size for r in body])
        print(f"tile{tile}: mean distinct frac "
              f"{float(uniq.mean()) / tile:.3f}", flush=True)

    print(f"rays={R} hit_rays={hit_rays} slots={slots} "
          f"unique={unique} dedup_factor={slots / max(unique, 1):.2f}",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
