"""Probe candidate mixed thin/brick schedules stage-by-stage: per-stage
device time + survivor counts at each boundary vs caps.

Run: nohup python tools/tune_schedule3.py > /tmp/tune3.log 2>&1 &
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
    print(f"  {label:56s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import n3tree
    from rt_octree_tpu.ops.compaction import fast_nonzero
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

    @jax.jit
    def setup(transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
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
                 RR._recs_init(dt, R, spp))
        return RR._pack_bundle(consts, state)

    bundle0 = setup(transform, hi, lo)
    bundle0.block_until_ready()

    @functools.partial(jax.jit, static_argnames=("rounds", "kind", "t_in"))
    def run_stage(dt, bundle, *, rounds: int, kind: str, t_in: int = 4):
        consts, state = RR._unpack_bundle(bundle, spp)

        def body(i, st):
            if kind == "brick":
                return RR._march_body_brick(dt, opt, spp, consts, st,
                                            t_in=t_in)
            return RR._march_body(dt, opt, spp, consts, st)

        st = jax.lax.fori_loop(0, rounds, body, state)
        return RR._pack_bundle(consts, st)

    @functools.partial(jax.jit, static_argnames=("cap",))
    def compact_stage(bundle, *, cap: int):
        consts, state = RR._unpack_bundle(bundle, spp)
        Rcur = state[0].shape[0]
        idx = fast_nonzero(state[0], cap, Rcur)
        row = jnp.take(bundle, idx, axis=0, mode="fill", fill_value=0)
        c_consts, c_state = RR._unpack_bundle(row, spp)
        c_state = (c_state[0] & (idx < Rcur),) + c_state[1:]
        return RR._pack_bundle(c_consts, c_state)

    # stages: (rounds, divisor-of-R, kind).  Brick rounds from stage 3 on
    # (the occupied fringe is finely subdivided there, bricks deliver ~2
    # steps/round); divisors must hold for BRICK survivor behavior --
    # measured by this very probe.
    # the shipped DEFAULT_SCHEDULE, in rounds
    SCHED = ((2, 1.0, "thin"), (4, 2.4, "thin"), (10, 3.5, "thin"),
             (6, 5.8, "brick"), (8, 10.5, "brick"), (10, 22.0, "brick"),
             (12, 40.0, "brick"), (120, 64.0, "brick"))

    bundle = bundle0
    total = 0.0
    for si, (rounds, frac, kind) in enumerate(SCHED):
        cap = max(int(R // frac), 1)
        n_active = int(jnp.sum(RR._unpack_bundle(bundle, spp)[1][0]))
        fits = n_active <= cap
        print(f"  stage {si}: alive={n_active:7d} cap={cap:7d} "
              f"{'ok' if fits else '*** OVERFLOW ***'}", flush=True)
        if fits and cap < bundle.shape[0]:
            t = timeit(functools.partial(compact_stage, cap=cap), bundle,
                       label=f"    compact -> {cap}")
            total += t
            bundle = compact_stage(bundle, cap=cap)
            bundle.block_until_ready()
        t = timeit(functools.partial(run_stage, rounds=rounds, kind=kind),
                   dt, bundle,
                   label=f"    {kind} x{rounds}r @{bundle.shape[0]}")
        total += t
        bundle = run_stage(dt, bundle, rounds=rounds, kind=kind)
        bundle.block_until_ready()
    n_active = int(jnp.sum(RR._unpack_bundle(bundle, spp)[1][0]))
    print(f"  final alive: {n_active}; staged total {total*1e3:.1f} ms",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
