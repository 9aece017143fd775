"""Round-3 experiment 3:

  A. Brick subcell-select lowering: onehot ([R,64] masked sums) vs
     dynamic (take_along_axis in-row 2-D gather) at each brick stage
     width.  The onehot pair is the brick round's VPU floor; if Mosaic
     lowers the per-lane row index efficiently this is a direct cut.
  B. skip_cap 12 -> 64: longer exact empty-space jumps.  Measures the
     early-stage survivor counts + round costs with the bigger cap (the
     fringe-grazing tail is untouched by design, but empty-space
     transit compresses, which deepens every later divisor).

Run: nohup python tools/round3_exp3.py > /tmp/r3exp3.log 2>&1 &
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
        consts, state = RR._init_march(dt, dirs, cens, dst, opt)
        return RR._pack_bundle(consts, state)

    bundle0 = setup(transform, hi, lo)
    bundle0.block_until_ready()

    def make_run_stage(select):
        @functools.partial(jax.jit,
                           static_argnames=("rounds", "kind", "t_in"))
        def run_stage(dt, bundle, *, rounds: int, kind: str, t_in: int = 4):
            RR._BRICK_SELECT = select

            def body(i, st):
                if kind == "brick":
                    return RR._march_body_brick(dt, opt, spp, consts, st,
                                                t_in=t_in)
                return RR._march_body(dt, opt, spp, consts, st)

            consts, state = RR._unpack_bundle(bundle, spp)
            st = jax.lax.fori_loop(0, rounds, body, state)
            return RR._pack_bundle(consts, st)
        return run_stage

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

    run_onehot = make_run_stage("onehot")
    run_dyn = make_run_stage("dynamic")

    print("== A. brick select lowering ==", flush=True)
    SCHED = ((2, 1.0, "thin"), (4, 2.4, "thin"), (10, 3.5, "thin"),
             (6, 5.8, "brick"), (8, 10.5, "brick"), (10, 22.0, "brick"),
             (12, 40.0, "brick"), (120, 64.0, "brick"))
    bundle = bundle0
    for si, (rounds, frac, kind) in enumerate(SCHED):
        cap = max(int(R // frac), 1)
        if cap < bundle.shape[0] and alive(bundle) <= cap:
            bundle = compact_stage(bundle, cap=cap)
            bundle.block_until_ready()
        if kind == "brick":
            timeit(functools.partial(run_onehot, rounds=rounds, kind=kind),
                   dt, bundle,
                   label=f"onehot  x{rounds}r @{bundle.shape[0]}")
            timeit(functools.partial(run_dyn, rounds=rounds, kind=kind),
                   dt, bundle,
                   label=f"dynamic x{rounds}r @{bundle.shape[0]}")
            b1 = run_onehot(dt, bundle, rounds=rounds, kind=kind)
            b2 = run_dyn(dt, bundle, rounds=rounds, kind=kind)
            same = bool(jnp.array_equal(b1, b2))
            print(f"    bit-identical: {same}  survivors {alive(b1)}",
                  flush=True)
            bundle = b1
        else:
            bundle = run_onehot(dt, bundle, rounds=rounds, kind=kind)
        bundle.block_until_ready()

    print("== C. shade + full-march sanity ==", flush=True)

    @jax.jit
    def full_march_and_keep(dt, bundle):
        consts, state = RR._unpack_bundle(bundle, spp)
        leafs, cnts = RR._march_schedule(
            dt, opt, spp, consts, state,
            tuple(RR.DEFAULT_SCHEDULE), 8192)
        return leafs, cnts

    leafs, cnts = full_march_and_keep(dt, bundle0)
    leafs.block_until_ready()
    dirs0, _ = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)

    @jax.jit
    def shade(dt, leafs, cnts, vdirs):
        return RR._shade(dt, vdirs, leafs, cnts, opt, spp)

    timeit(shade, dt, leafs, cnts, dirs0, label="shade (hit-compact v5)")

    print("== B. skip_cap 64 ==", flush=True)
    t0 = time.time()
    dt64 = upload_tree(tree, lut_levels=9, skip_cap=64)
    jax.block_until_ready(dt64.lut)
    print(f"  build skip64 LUT: {time.time()-t0:.1f}s", flush=True)
    for cap_dt, tag in ((dt, "cap12"), (dt64, "cap64")):
        bundle = bundle0
        for si, (rounds, frac, kind) in enumerate(SCHED[:4]):
            cap = max(int(R // frac), 1)
            if cap < bundle.shape[0] and alive(bundle) <= cap:
                bundle = compact_stage(bundle, cap=cap)
                bundle.block_until_ready()
            timeit(functools.partial(run_onehot, rounds=rounds, kind=kind),
                   cap_dt, bundle,
                   label=f"{tag} {kind} x{rounds}r @{bundle.shape[0]}")
            bundle = run_onehot(cap_dt, bundle, rounds=rounds, kind=kind)
            bundle.block_until_ready()
            print(f"    survivors {alive(bundle)}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
