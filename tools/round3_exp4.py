"""Round-3 experiment 4: IN-JIT frame decomposition (not staged).

The staged stage-at-a-time numbers carry per-row dispatch floors and use
fori-loops where the real march uses early-exit while-loops, which round
3 learned can overstate stage costs (the t12-drain "win" vanished in the
real frame).  This measures the REAL one-jit pipeline by ablation:

  A. setup+march only (leafs/cnts checksum)    -> march cost
  B. A + shade                                 -> shade delta
  C. full _render_noisy (composite+aux)        -> aux/composite delta
  D. drain t_in 4 vs 12 inside the real while-loop march
  E. shade cap_div 4 vs 5 on the real pipeline

Run: nohup python tools/round3_exp4.py > /tmp/r3exp4.log 2>&1 &
"""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def sync(x):
    return float(jnp.sum(jnp.ravel(jnp.asarray(x, jnp.float32))[::9973]))


def timeit(fn, *args, reps=6, label=""):
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
    spp = 6
    R = W * H
    cam = Camera(width=W, height=H)
    opt = RR.FrozenOptions.from_options(
        RenderOptions(spp=spp, denoise=False))
    transform = jnp.asarray(cam.transform, jnp.float32)
    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)

    SCHED_T12 = RR.DEFAULT_SCHEDULE
    SCHED_T4 = SCHED_T12[:-1] + ((0, 64.0, "brick", 4),)

    def setup_and_march(dtree, transform, hi, lo, schedule):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx,
                                           cam.fy)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        consts, state = RR._init_march(dtree, dirs, cens, dst, opt)
        return consts, RR._march_schedule(dtree, opt, spp, consts, state,
                                          schedule, 8192)

    @functools.partial(jax.jit, static_argnames=("schedule",))
    def march_only(dtree, transform, hi, lo, *, schedule):
        consts, (leafs, cnts) = setup_and_march(dtree, transform, hi, lo,
                                                schedule)
        return jnp.sum(leafs) + jnp.sum(cnts)

    @functools.partial(jax.jit, static_argnames=("schedule", "cap_div"))
    def march_shade(dtree, transform, hi, lo, *, schedule, cap_div):
        dirs, _ = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        consts, (leafs, cnts) = setup_and_march(dtree, transform, hi, lo,
                                                schedule)
        out = RR._shade(dtree, dirs, leafs, cnts, opt, spp,
                        cap_div=cap_div)
        return jnp.sum(out)

    @functools.partial(jax.jit, static_argnames=("schedule", "cap_div"))
    def full_noisy(dtree, transform, hi, lo, *, schedule, cap_div):
        img, aux = RR._render_noisy(
            dtree, transform, hi, lo, width=W, height=H, fx=cam.fx,
            fy=cam.fy, opt=opt, n_chunks=1, max_steps=8192, inc=3,
            schedule=schedule, shade_cap_div=cap_div)
        return jnp.sum(img[::97, ::89])

    for sched, tag in ((SCHED_T12, "t12drain"), (SCHED_T4, "t4drain")):
        timeit(functools.partial(march_only, schedule=sched),
               dt, transform, hi, lo, label=f"march only [{tag}]")
    for div in (4, 5):
        timeit(functools.partial(march_shade, schedule=SCHED_T12,
                                 cap_div=div),
               dt, transform, hi, lo,
               label=f"march+shade [t12, div{div}]")
    timeit(functools.partial(full_noisy, schedule=SCHED_T12, cap_div=5),
           dt, transform, hi, lo, label="full noisy [t12, div5]")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
