"""Round-3 exp13: time the PRODUCTION march after the gather-merge
boundary redesign (renderer._march_schedule_recs now merges deep recs
back by rank-gather instead of the ~675k-row set-scatter cascade;
exp12 priced the cascade at ~29 ms/frame: 135.0 ON vs 106.2 OFF).

Times _march_schedule (production, incl. _recs_split) and the full
_render_noisy frame.

Run: nohup python tools/round3_exp13.py > /tmp/r3exp13.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(
        float(jnp.sum(jnp.ravel(jnp.asarray(l, jnp.float32))[::9973]))
        for l in leaves))


def timeit(fn, *args, reps=8, label=""):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    print(f"  {label:56s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import n3tree
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render import renderer as RR
    from rt_octree_tpu.utils.rng import pcg32_uniforms_range

    print(f"devices: {jax.devices()}", flush=True)
    tree = n3tree.load(os.path.join(ROOT, ".bench_cache",
                                    "shell_d9_sh9.npz"))
    dt = upload_tree(tree, lut_levels=9)
    W = H = 800
    R = W * H
    spp = 6
    opt = RR.FrozenOptions.from_options(RenderOptions(
        spp=spp, denoise=False, step_size=1e-4, sigma_thresh=1e-2,
        background_brightness=1.0))
    cam = Camera(width=W, height=H)
    transform = jnp.asarray(cam.transform, jnp.float32)
    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)
    SCHED = RR._normalize_schedule(RR.DEFAULT_SCHEDULE)
    MAXS = 8192

    @jax.jit
    def march_recs(dtree, transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        consts, state = RR._init_march(dtree, dirs, cens, dst, opt)
        leafs, cnts = RR._march_schedule(dtree, opt, spp, consts, state,
                                         SCHED, MAXS)
        return jnp.sum(cnts), jnp.sum(leafs)

    @jax.jit
    def frame(dtree, transform, hi, lo):
        out = RR._render_noisy(dtree, transform, hi, lo,
                               width=W, height=H, fx=cam.fx, fy=cam.fy,
                               opt=opt, n_chunks=1, max_steps=MAXS, inc=3,
                               schedule=SCHED, shade_cap_div=5)
        return out

    timeit(march_recs, dt, transform, hi, lo,
           label="march+split [gather-merge boundaries]")
    timeit(frame, dt, transform, hi, lo,
           label="full _render_noisy frame (no denoise)")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
