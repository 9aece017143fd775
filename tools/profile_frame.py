"""Final frame decomposition: render/net/filter phases + shade cost on
real march outputs.

Run: nohup python tools/profile_frame.py > /tmp/profile_frame.log 2>&1 &
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
    return float(jnp.sum(jnp.ravel(x)[::9973].astype(jnp.float32)))


def timeit(fn, *args, reps=5, label=""):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    print(f"  {label:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import n3tree
    from rt_octree_tpu.models.guidance_net import load_compact
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render import renderer as RR
    from rt_octree_tpu.render.renderer import Renderer, render_timed
    from rt_octree_tpu.utils.timer import PhaseTimer
    from rt_octree_tpu.utils.rng import pcg32_uniforms_range

    print(f"devices: {jax.devices()}", flush=True)
    tree = n3tree.load(os.path.join(ROOT, ".bench_cache",
                                    "shell_d9_sh9.npz"))
    dt = upload_tree(tree, lut_levels=9)
    W = H = 800
    spp = 6
    R = W * H
    cam = Camera(width=W, height=H)

    # --- phase split via render_timed ---
    r = Renderer(dt, W, H, cam.fx, cam.fy,
                 options=RenderOptions(spp=6, denoise=True))
    import glob
    g = sorted(glob.glob(os.path.join(
        ROOT, ".bench_cache", "quality_ds", "work", "ts_*.gnet")))
    r.set_denoiser(g[-1])
    timer = PhaseTimer()
    for _ in range(3):
        render_timed(r, cam.transform, timer)
        r.advance_rng()
    timer.reset()
    for _ in range(6):
        render_timed(r, cam.transform, timer)
        r.advance_rng()
    timer.report()

    # --- shade on real march outputs ---
    opt = RR.FrozenOptions.from_options(
        RenderOptions(spp=6, denoise=False))
    transform = jnp.asarray(cam.transform, jnp.float32)
    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)

    @jax.jit
    def march_out(dt, transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        vdirs = RR.rodrigues_jnp(jnp.zeros(3, jnp.float32), dirs)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        cen_t = dt.offset[None, :] + dt.scale[None, :] * cens
        d_scaled = dirs * dt.scale[None, :]
        delta_scale = 1.0 / jnp.linalg.norm(d_scaled, axis=-1)
        d_t = d_scaled * delta_scale[:, None]
        invdir = 1.0 / (d_t + 1e-9)
        tmin, tmax = RR._dda_world(cen_t, invdir, opt.render_bbox)
        hit = (tmax >= 0) & (tmin <= tmax)
        consts = (cen_t, d_t, invdir, delta_scale, dst, tmax)
        state = (hit, tmin, jnp.zeros(R, jnp.float32),
                 jnp.zeros(R, jnp.int32), jnp.zeros(R, jnp.int32),
                 jnp.zeros((R, spp), jnp.int32),
                 jnp.zeros((R, spp), jnp.float32))

        def body(i, st):
            return RR._march_body(dt, opt, spp, consts, st)

        st = jax.lax.fori_loop(0, 40, body, state)
        return vdirs, st[5]

    vdirs, recs = march_out(dt, transform, hi, lo)
    jax.block_until_ready((vdirs, recs))
    cnts = np.asarray(RR._recs_split(recs, spp)[1])
    ec = int((cnts[:, 1:] > 0).sum())
    print(f"  real extras: {ec} slots", flush=True)

    @jax.jit
    def shade_now(dt, vdirs, recs):
        return RR._shade(dt, vdirs, recs, opt, spp)

    timeit(shade_now, dt, vdirs, recs,
           label="_shade on real outputs (packed extras)")

    @jax.jit
    def slot0_only(dt, vdirs, leafs, cnts):
        basis = RR._eval_masked_basis(dt, vdirs, opt)
        w = jnp.where(cnts > 0, cnts, 0.0)
        return RR._leaf_rgb(dt, leafs[:, 0], basis) * w[:, 0:1]

    timeit(slot0_only, dt, vdirs, *RR._recs_split(recs, spp),
           label="  slot0+basis only")

    # rays/rng/dst again for the record
    @jax.jit
    def pre(transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        vdirs = RR.rodrigues_jnp(jnp.zeros(3, jnp.float32), dirs)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        return RR.make_sorted_dst(uniforms) + vdirs.sum()

    timeit(pre, transform, hi, lo, label="rays+rodrigues+rng+sort")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
