"""LLFF/NDC roofline (round 4, VERDICT item 2).

Same standard as tools/roofline.py for the shell: derive the machine-
model floor of the LLFF forward-facing frame NUMERICALLY from the
auto-tuned schedule's static row counts and the CORRECTED gather walls
(PERF.md round-4: thin 10.6 ns/row at the 134M-row LUT, brick 17.2,
compaction bundle 10.35, brick VPU sub-step ~4.7 ns/subrow, 69 us
per-round dispatch), then measure the same stages on device and the
whole march in one jit.

Scene setup replicates bench.py llff_scene_fps exactly: blobs tree,
1008x756 focal 800, NDC warp, forward-facing pose, auto schedule.

Run: nohup python tools/roofline_llff.py > /tmp/r4/roofline_llff.log 2>&1 &
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

# corrected walls, ns/row (PERF.md round 4; round4_gather3/round4_thin)
NS_THIN = 10.6
NS_BRICK = 17.2
NS_BUNDLE = 10.35
NS_SUB = 4.7          # brick VPU sub-step per (row, sub-step)
OVH_MS = 0.069        # per-round dispatch


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[::9973].astype(jnp.float32)))


def timeit(fn, *args, reps=6, label=""):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dtm = (time.time() - t0) / reps
    print(f"  {label:48s} {dtm*1e3:9.2f} ms", flush=True)
    return dtm


def main():
    sys.path.insert(0, ROOT)
    import bench
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.ops.compaction import fast_nonzero
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render import renderer as RR
    from rt_octree_tpu.render.schedule import auto_schedule
    from rt_octree_tpu.utils.rng import pcg32_uniforms_range

    print(f"devices: {jax.devices()}", flush=True)
    W, H, focal = 1008, 756, 800.0
    R = W * H
    spp = 6
    tree = bench.get_tree("blobs")
    tree.use_ndc = True
    tree.ndc_width, tree.ndc_height, tree.ndc_focal = float(W), float(H), focal
    dt = upload_tree(tree, lut_levels=min(9, tree.max_depth))
    ropt = RenderOptions(spp=spp, denoise=False, step_size=1e-4,
                         sigma_thresh=1e-2, background_brightness=1.0)
    opt = RR.FrozenOptions.from_options(ropt)
    cam = Camera(width=W, height=H, fx=focal, fy=focal)
    cam.center = np.array([0.02, 0.01, 0.3], np.float32)
    cam.v_back = np.array([0.0, 0.0, 1.0], np.float32)
    cam.v_world_up = np.array([0.0, 1.0, 0.0], np.float32)
    cam.update()
    sched, shade_div = auto_schedule(dt, [cam.transform], ropt, cam.fx,
                                     cam.fy, W, H, with_shade_div=True)
    sched = RR._normalize_schedule(tuple(sched))
    print("auto schedule:", [(s, round(d, 2), k, t, round(dd, 1))
                             for s, d, k, t, dd in sched], flush=True)

    transform = jnp.asarray(cam.transform, jnp.float32)
    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)

    @jax.jit
    def setup(transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        wdirs, wcens = RR.maybe_world2ndc(dt, dirs, cens)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        consts, state = RR._init_march(dt, wdirs, wcens, dst, opt)
        return RR._pack_bundle(consts, state)

    bundle0 = setup(transform, hi, lo)
    sync(bundle0)

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

    bundle = bundle0
    tot_meas = 0.0
    tot_model = 0.0
    rows_acc = {"thin": 0.0, "brick": 0.0, "sub": 0.0, "compact": 0.0}
    rounds_acc = 0
    print("== staged march (auto schedule) ==", flush=True)
    for (steps, frac, kind, t_in, dd) in sched:
        cap = max(int(R // frac), 1) if frac > 1 else bundle.shape[0]
        n_active = alive(bundle)
        if cap < bundle.shape[0] and n_active <= cap:
            t = timeit(functools.partial(compact_stage, cap=cap), bundle,
                       label=f"compact {bundle.shape[0]} -> {cap}")
            model = (bundle.shape[0] + cap) * NS_BUNDLE * 1e-6
            rows_acc["compact"] += bundle.shape[0] + cap
            tot_meas += t * 1e3
            tot_model += model
            print(f"      model {model:8.2f} ms", flush=True)
            bundle = compact_stage(bundle, cap=cap)
            sync(bundle)
        w = bundle.shape[0]
        if steps <= 0 or steps >= 8192:
            # drain: measure rounds to empty
            pre = bundle
            drained = 0
            while alive(bundle) > 0 and drained < 600:
                bundle = run_stage(dt, bundle, rounds=10, kind=kind,
                                   t_in=t_in)
                drained += 10
            print(f"  drain measured ~{drained} rounds (t_in={t_in}) "
                  f"@{w}", flush=True)
            t = timeit(functools.partial(run_stage, rounds=drained,
                                         kind=kind, t_in=t_in), dt, pre,
                       label=f"drain {kind} x{drained}r @{w}")
            grows = drained * w
            model = (grows * NS_BRICK + grows * t_in * NS_SUB) * 1e-6 \
                + drained * OVH_MS
            rows_acc["brick"] += grows
            rows_acc["sub"] += grows * t_in
            rounds_acc += drained
            tot_meas += t * 1e3
            tot_model += model
            print(f"      model {model:8.2f} ms ({grows/1e6:.2f}M rows)",
                  flush=True)
            break
        if kind == "brick":
            rounds = max((steps + t_in - 1) // t_in, 1)
            grows = rounds * w
            model = (grows * NS_BRICK + grows * t_in * NS_SUB) * 1e-6 \
                + rounds * OVH_MS
            rows_acc["brick"] += grows
            rows_acc["sub"] += grows * t_in
        else:
            rounds = steps
            grows = rounds * w
            model = grows * NS_THIN * 1e-6 + rounds * OVH_MS
            rows_acc["thin"] += grows
        rounds_acc += rounds
        t = timeit(functools.partial(run_stage, rounds=rounds, kind=kind,
                                     t_in=t_in), dt, bundle,
                   label=f"{kind} x{rounds}r @{w}")
        tot_meas += t * 1e3
        tot_model += model
        print(f"      model {model:8.2f} ms ({grows/1e6:.2f}M rows)",
              flush=True)
        bundle = run_stage(dt, bundle, rounds=rounds, kind=kind, t_in=t_in)
        sync(bundle)

    print(f"\nstatic rows: thin {rows_acc['thin']/1e6:.2f}M, brick "
          f"gathers {rows_acc['brick']/1e6:.2f}M, brick sub-steps "
          f"{rows_acc['sub']/1e6:.2f}M, compaction "
          f"{rows_acc['compact']/1e6:.2f}M; rounds {rounds_acc}",
          flush=True)
    print(f"march model floor: {tot_model:8.1f} ms", flush=True)
    print(f"march staged sum:  {tot_meas:8.1f} ms "
          f"({tot_meas/max(tot_model,1e-9):.2f}x model)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
