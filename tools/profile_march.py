"""Ablation profiler for the frame pipeline on the bench scene.

Times each pipeline piece in isolation with forced-readback syncs, and
instruments the march to report true executed round counts per phase.

Run: nohup python tools/profile_march.py > /tmp/profile_march.log 2>&1 &
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
    return float(jnp.sum(jnp.ravel(x)[::9973]))


def timeit(fn, *args, reps=5, label=""):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    print(f"  {label:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import n3tree
    from rt_octree_tpu.ops.traversal import upload_tree, tree_query_full
    from rt_octree_tpu.render import renderer as RR
    from rt_octree_tpu.utils.rng import pcg32_uniforms_range

    print(f"devices: {jax.devices()}", flush=True)
    tree = n3tree.load(os.path.join(ROOT, ".bench_cache",
                                    "shell_d9_sh9.npz"))
    dt = upload_tree(tree, lut_levels=9)
    print(f"tree: {tree.child.shape[0]} entries, depth {tree.max_depth}, "
          f"lut_levels {dt.lut_levels}, brick_levels {dt.brick_levels}",
          flush=True)

    W = H = 800
    spp = 6
    R = W * H
    cam = Camera(width=W, height=H)
    ropt = RenderOptions(spp=spp, denoise=False, step_size=1e-4,
                         sigma_thresh=1e-2, background_brightness=1.0)
    opt = RR.FrozenOptions.from_options(ropt)
    transform = jnp.asarray(cam.transform, jnp.float32)

    # ---- piece 1: ray setup + rng + dst ----
    @jax.jit
    def rays_and_dst(transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        vdirs = RR.rodrigues_jnp(jnp.zeros(3, jnp.float32), dirs)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        return jnp.concatenate(
            [dirs, vdirs, cens, dst], axis=1)

    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)
    timeit(rays_and_dst, transform, hi, lo, label="rays+rodrigues+rng+dst")

    # shared setup for the march pieces
    pack = rays_and_dst(transform, hi, lo)
    pack.block_until_ready()

    def make_consts_state(pack):
        dirs, vdirs, cens, dst = (pack[:, 0:3], pack[:, 3:6], pack[:, 6:9],
                                  pack[:, 9:9 + spp])
        cen_t = dt.offset[None, :] + dt.scale[None, :] * cens
        d_scaled = dirs * dt.scale[None, :]
        delta_scale = 1.0 / jnp.linalg.norm(d_scaled, axis=-1)
        d_t = d_scaled * delta_scale[:, None]
        tmax_bg = jnp.full((R,), 1e9, jnp.float32) * delta_scale
        invdir = 1.0 / (d_t + 1e-9)
        tmin, tmax = RR._dda_world(cen_t, invdir, opt.render_bbox)
        tmax = jnp.minimum(tmax, tmax_bg)
        hit = (tmax >= 0) & (tmin <= tmax)
        consts = (cen_t, d_t, invdir, delta_scale, dst, tmax)
        state = (hit, tmin, jnp.zeros(R, jnp.float32),
                 jnp.zeros(R, jnp.int32), jnp.zeros(R, jnp.int32),
                 jnp.zeros((R, spp), jnp.int32),
                 jnp.zeros((R, spp), jnp.float32))
        return consts, state

    # ---- piece 2: fixed-round thin march at full width ----
    @functools.partial(jax.jit, static_argnames=("rounds", "brick"))
    def march_n(dt, pack, *, rounds: int, brick: bool):
        consts, state = make_consts_state(pack)
        def body(i, st):
            if brick:
                return RR._march_body_brick(dt, opt, spp, consts, st)
            return RR._march_body(dt, opt, spp, consts, st)
        st = jax.lax.fori_loop(0, rounds, body, state)
        return st[5]

    t2 = timeit(functools.partial(march_n, rounds=2, brick=False), dt, pack,
                label="thin march 2 rounds @640k")
    t8 = timeit(functools.partial(march_n, rounds=8, brick=False), dt, pack,
                label="thin march 8 rounds @640k")
    print(f"    -> per thin round @640k: {(t8-t2)/6*1e3:.2f} ms", flush=True)
    tb2 = timeit(functools.partial(march_n, rounds=2, brick=True), dt, pack,
                 label="brick march 2 rounds @640k")
    tb8 = timeit(functools.partial(march_n, rounds=8, brick=True), dt, pack,
                 label="brick march 8 rounds @640k")
    print(f"    -> per brick round @640k: {(tb8-tb2)/6*1e3:.2f} ms",
          flush=True)

    # ---- piece 3: true round counts under the real while schedule ----
    @functools.partial(jax.jit, static_argnames=("steps", "brick"))
    def march_while_counted(dt, pack, *, steps: int, brick: bool):
        consts, state = make_consts_state(pack)

        def cond(sv):
            i, st = sv
            return (i < steps) & jnp.any(st[0])

        def body(sv):
            i, st = sv
            if brick:
                st = RR._march_body_brick(dt, opt, spp, consts, st)
            else:
                st = RR._march_body(dt, opt, spp, consts, st)
            return i + 1, st

        i, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        n_alive = jnp.sum(st[0].astype(jnp.int32))
        return jnp.stack([i, n_alive])

    for steps in (6, 16, 64, 256, 2048):
        out = np.asarray(march_while_counted(dt, pack, steps=steps, brick=False))
        print(f"  thin while cap={steps:5d}: rounds={out[0]:5d} "
              f"alive_after={out[1]}", flush=True)
    for steps in (4, 16, 64, 512):
        out = np.asarray(march_while_counted(dt, pack, steps=steps, brick=True))
        print(f"  brick while cap={steps:5d}: rounds={out[0]:5d} "
              f"alive_after={out[1]}", flush=True)

    # ---- piece 4: survivor curve (alive after k thin rounds) ----
    @jax.jit
    def survivors(dt, pack):
        consts, state = make_consts_state(pack)
        outs = []
        st = state
        for k in range(24):
            st = RR._march_body(dt, opt, spp, consts, st)
            outs.append(jnp.sum(st[0].astype(jnp.int32)))
        return jnp.stack(outs)

    sv = np.asarray(survivors(dt, pack))
    print(f"  survivors after thin rounds 1..24: {sv.tolist()}", flush=True)

    # ---- piece 5: full-frame pieces ----
    @jax.jit
    def noisy_frame(dt, transform, hi, lo):
        img, aux = RR._render_noisy(
            dt, transform, hi, lo, width=W, height=H, fx=cam.fx, fy=cam.fy,
            opt=opt, n_chunks=1, max_steps=8192, inc=3)
        return aux

    timeit(noisy_frame, dt, transform, hi, lo,
           label="full _render_noisy (denoise off)")

    # shade-only cost: march to done at 16 rounds then shade
    @jax.jit
    def march_and_shade(dt, pack):
        consts, state = make_consts_state(pack)
        def body(i, st):
            return RR._march_body(dt, opt, spp, consts, st)
        st = jax.lax.fori_loop(0, 16, body, state)
        vdirs = pack[:, 3:6]
        return RR._shade(dt, vdirs, st[5], opt, spp)

    t_ms = timeit(march_and_shade, dt, pack, label="16 thin rounds + shade")
    print(f"    -> shade approx: {(t_ms - (t2 + (t8-t2)/6*14))*1e3:.2f} ms",
          flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
