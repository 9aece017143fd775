"""Stage-by-stage march diagnostic: per-stage device time, survivor
counts vs caps, and compaction-primitive costs on the bench scene.

Run: nohup python tools/tune_schedule.py > /tmp/tune.log 2>&1 &
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
    s = sync(out)
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
    ropt = RenderOptions(spp=spp, denoise=False)
    opt = RR.FrozenOptions.from_options(ropt)
    transform = jnp.asarray(cam.transform, jnp.float32)
    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)

    # ---------- fast_nonzero vs jnp.nonzero on device ----------
    rngnp = np.random.default_rng(0)
    mask = jnp.asarray(rngnp.random(R) < 0.35)

    @functools.partial(jax.jit, static_argnames=("size",))
    def nz_jnp(mask, *, size):
        return jnp.nonzero(mask, size=size, fill_value=R)[0]

    @functools.partial(jax.jit, static_argnames=("size",))
    def nz_fast(mask, *, size):
        return fast_nonzero(mask, size, R)

    timeit(functools.partial(nz_jnp, size=R // 2), mask,
           label="jnp.nonzero @640k size=320k")
    timeit(functools.partial(nz_fast, size=R // 2), mask,
           label="fast_nonzero @640k size=320k")
    mask32 = jnp.asarray(rngnp.random(R * (spp - 1)) < 0.1)
    timeit(functools.partial(nz_jnp, size=R // 2), mask32,
           label="jnp.nonzero @3.2M size=320k")
    timeit(functools.partial(nz_fast, size=R // 2), mask32,
           label="fast_nonzero @3.2M size=320k")

    # ---------- staged march ----------
    @jax.jit
    def setup(transform, hi, lo):
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
        return RR._pack_bundle(consts, state)

    bundle0 = setup(transform, hi, lo)
    bundle0.block_until_ready()
    print(f"  initial actives: "
          f"{int(jnp.sum(RR._unpack_bundle(bundle0, spp)[1][0]))} / {R}",
          flush=True)

    @functools.partial(jax.jit, static_argnames=("steps", "kind"))
    def run_stage(dt, bundle, *, steps: int, kind: str):
        consts, state = RR._unpack_bundle(bundle, spp)
        state = RR._march_loop(dt, opt, spp, consts, state, steps,
                               brick=(kind == "brick"))
        return RR._pack_bundle(consts, state)

    @functools.partial(jax.jit, static_argnames=("cap",))
    def compact_stage(bundle, *, cap: int):
        consts, state = RR._unpack_bundle(bundle, spp)
        Rcur = state[0].shape[0]
        idx = fast_nonzero(state[0], cap, Rcur)
        row = jnp.take(bundle, idx, axis=0, mode="fill", fill_value=0)
        c_consts, c_state = RR._unpack_bundle(row, spp)
        c_state = (c_state[0] & (idx < Rcur),) + c_state[1:]
        return RR._pack_bundle(c_consts, c_state)

    SCHED = ((2, 1.5, "thin"), (4, 2.4, "thin"), (6, 3.6, "thin"),
             (12, 5.0, "brick"), (24, 9.0, "brick"), (64, 30.0, "brick"),
             (200, 80.0, "brick"))

    bundle = bundle0
    total = 0.0
    for si, (steps, frac, kind) in enumerate(SCHED):
        cap = max(int(R // frac), 1)
        n_active = int(jnp.sum(RR._unpack_bundle(bundle, spp)[1][0]))
        fits = n_active <= cap
        print(f"  stage {si}: alive={n_active:7d} cap={cap:7d} "
              f"{'OK' if fits else '*** OVERFLOW ***'}", flush=True)
        if fits and cap < bundle.shape[0]:
            t = timeit(functools.partial(compact_stage, cap=cap), bundle,
                       label=f"    compact -> {cap}")
            total += t
            bundle = compact_stage(bundle, cap=cap)
            bundle.block_until_ready()
        t = timeit(functools.partial(run_stage, steps=steps, kind=kind),
                   dt, bundle, label=f"    {kind} x{steps} @{bundle.shape[0]}")
        total += t
        bundle = run_stage(dt, bundle, steps=steps, kind=kind)
        bundle.block_until_ready()
    n_active = int(jnp.sum(RR._unpack_bundle(bundle, spp)[1][0]))
    print(f"  final alive: {n_active}; staged total {total*1e3:.1f} ms "
          f"(incl ~10ms dispatch floor per stage)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
