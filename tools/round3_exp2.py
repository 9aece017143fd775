"""Round-3 experiment 2: per-round overhead vs t_in at the shipped
schedule's stage boundaries.

Exp-1 finding: staged brick costs at narrow widths are ~0.5-1.3 ms per
ROUND almost independent of width (gather at 16k rows is ~0.2 ms), i.e.
per-round dispatch overhead dominates the tail.  The batched crossing
bookkeeping makes larger t_in cheap, so fewer-rounds x more-sub-steps
should directly divide that overhead.  This measures (rounds, t_in)
variants at each boundary, with survivor counts so caps can be re-sized.

Also: shade + rays/rng/sort phase costs (not covered by the stage
table).

Run: nohup python tools/round3_exp2.py > /tmp/r3exp2.log 2>&1 &
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
                 jnp.zeros((R, spp), jnp.int32),
                 jnp.zeros((R, spp), jnp.float32))
        return RR._pack_bundle(consts, state)

    print("-- phase: rays+rng+sort+setup --", flush=True)
    timeit(setup, transform, hi, lo, label="setup (rays+rng+sort+pack)")
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

    def alive(bundle):
        return int(jnp.sum(RR._unpack_bundle(bundle, spp)[1][0]))

    # march the shipped schedule to each boundary, trying variants there
    SCHED = ((2, 1.0, "thin", 4), (4, 2.4, "thin", 4),
             (10, 3.5, "thin", 4),
             (6, 5.8, "brick", 4), (8, 10.5, "brick", 4),
             (10, 22.0, "brick", 4), (12, 40.0, "brick", 4),
             (120, 64.0, "brick", 4))
    # variants: stage index -> list of (rounds, t_in)
    VARIANTS = {
        3: [(3, 8), (4, 6)],
        4: [(4, 8), (3, 12)],
        5: [(5, 8), (4, 12)],
        6: [(6, 8), (3, 16), (4, 12)],
        7: [(60, 8), (30, 16), (40, 12)],
    }

    bundle = bundle0
    for si, (rounds, frac, kind, t_in) in enumerate(SCHED):
        cap = max(int(R // frac), 1)
        n = alive(bundle)
        print(f"-- stage {si}: alive={n} cap={cap} --", flush=True)
        if cap < bundle.shape[0]:
            timeit(functools.partial(compact_stage, cap=cap), bundle,
                   label=f"compact -> {cap}")
            bundle = compact_stage(bundle, cap=cap)
            bundle.block_until_ready()
        base = functools.partial(run_stage, rounds=rounds, kind=kind,
                                 t_in=t_in)
        timeit(base, dt, bundle,
               label=f"{kind} x{rounds}r t{t_in} @{bundle.shape[0]}")
        out_base = base(dt, bundle)
        sv_base = alive(out_base)
        print(f"    -> survivors {sv_base}", flush=True)
        for vrounds, vt in VARIANTS.get(si, []):
            v = functools.partial(run_stage, rounds=vrounds, kind=kind,
                                  t_in=vt)
            timeit(v, dt, bundle,
                   label=f"{kind} x{vrounds}r t{vt} @{bundle.shape[0]}")
            print(f"    -> survivors {alive(v(dt, bundle))}", flush=True)
        bundle = out_base
        bundle.block_until_ready()
    print(f"final alive: {alive(bundle)}", flush=True)

    # ---- shade cost ----
    print("-- phase: shade --", flush=True)
    consts, state = RR._unpack_bundle(bundle0, spp)

    @jax.jit
    def full_march_and_keep(dt, bundle):
        consts, state = RR._unpack_bundle(bundle, spp)
        leafs, cnts = RR._march_schedule(
            dt, opt, spp, consts, state,
            tuple(RR.DEFAULT_SCHEDULE), 8192)
        return leafs, cnts

    leafs, cnts = full_march_and_keep(dt, bundle0)
    leafs.block_until_ready()
    dirs, _ = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)

    @jax.jit
    def shade(dt, leafs, cnts, vdirs):
        return RR._shade(dt, vdirs, leafs, cnts, opt, spp)

    timeit(shade, dt, leafs, cnts, dirs, label="shade (hit-compact v5)")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
