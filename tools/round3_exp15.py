"""Round-3 exp15: decomposition of the shipped shade-on-death frame.

Variants (each jitted on (tree, transform, hi, lo); deltas are the
signal, every number includes the staged-timeit floor):

  setup   rays + pcg32 + sorted dst + _init_march only
  stub    compaction-schedule march, NO death extraction, NO write-back
          (exp12's cascade-free lower bound, on today's packed lanes)
  mdeath  production _march_death (march + boundary partition scatters +
          side-buffer appends + dense-fallback conds), no final shade
  frame0  full production render, denoise off
  frame1  full production render, denoise on (the bench config)

  boundary-extraction cost = mdeath - stub
  final-shade cost         = frame0 - mdeath
  denoise + aux cost       = frame1 - frame0

Run: nohup python tools/round3_exp15.py > /tmp/r3exp15.log 2>&1 &
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
    from rt_octree_tpu.ops.compaction import fast_nonzero
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
    SHADE_DIV = 5  # bench-probed

    def setup(dtree, transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx,
                                           cam.fy)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        consts, state = RR._init_march(dtree, dirs, cens, dst, opt)
        return dirs, consts, state

    @jax.jit
    def v_setup(dtree, transform, hi, lo):
        dirs, consts, state = setup(dtree, transform, hi, lo)
        return (jnp.sum(jnp.ravel(state[1])[::97].astype(jnp.float32))
                + jnp.sum(jnp.ravel(consts[0])[::97].astype(jnp.float32))
                + jnp.sum(dirs[:, 0]))

    # ---- stub: march only, no extraction, no write-back ----------------
    def msr(dtree, consts, state, schedule, base_width=None):
        (steps, frac, kind, t_in, _dd), rest = schedule[0], schedule[1:]
        Rw = state[0].shape[0]
        if base_width is None:
            base_width = Rw
        brick = kind == "brick"
        last = not rest
        steps_run = MAXS if last else steps
        cap = max(int(base_width // frac), 1) if frac > 1 else Rw

        def run_here(consts, state):
            st = RR._march_loop(dtree, opt, spp, consts, state, steps_run,
                                unroll=4 if last else RR._STAGE_UNROLL,
                                brick=brick, t_in=t_in,
                                early_exit=last or not RR._MID_FORI)
            if last:
                return st[5]
            return msr(dtree, consts, st, rest, base_width)

        if cap >= Rw:
            return run_here(consts, state)
        active = state[0]
        n_active = jnp.sum(active.astype(jnp.int32))

        def compacted(_):
            idx = fast_nonzero(active, cap, Rw)
            valid = idx < Rw
            row = jnp.take(RR._pack_bundle(consts, state), idx, axis=0,
                           mode="fill", fill_value=0)
            c_consts, c_state = RR._unpack_bundle(row, spp)
            c_state = (c_state[0] & valid,) + c_state[1:]
            c_recs = msr_inner(c_consts, c_state, rest, base_width,
                               last, steps_run, brick, t_in, dtree)
            return state[5].at[0, 0].add(jnp.sum(c_recs))

        def full(_):
            st = RR._march_loop(dtree, opt, spp, consts, state, MAXS,
                                unroll=2, brick=brick, t_in=t_in)
            return st[5]

        return jax.lax.cond(n_active <= cap, compacted, full, None)

    def msr_inner(consts, state, rest, base_width, last, steps_run,
                  brick, t_in, dtree):
        st = RR._march_loop(dtree, opt, spp, consts, state, steps_run,
                            unroll=4 if last else RR._STAGE_UNROLL,
                            brick=brick, t_in=t_in,
                            early_exit=last or not RR._MID_FORI)
        if last:
            return st[5]
        return msr(dtree, consts, st, rest, base_width)

    @jax.jit
    def v_stub(dtree, transform, hi, lo):
        dirs, consts, state = setup(dtree, transform, hi, lo)
        recs = msr(dtree, consts, state, SCHED)
        return jnp.sum(recs[:64, 0])

    # ---- production march + death, no final shade -----------------------
    @jax.jit
    def v_mdeath(dtree, transform, hi, lo):
        dirs, consts, state = setup(dtree, transform, hi, lo)
        R0 = R
        cap_h = max(R0 // SHADE_DIV, 1)
        Wd, pads = R0, []
        for (_s, frac, _k, _t, dd) in SCHED:
            capk = max(int(R0 // frac), 1) if frac > 1 else Wd
            if capk < Wd:
                pads.append(min(max(int(R0 // dd), 1), cap_h, Wd))
                Wd = capk
        if Wd <= cap_h:
            pads.append(Wd)
        pad = max(pads) if pads else 0
        rec_w = state[5].shape[1]
        carry = (jnp.zeros((cap_h + pad, rec_w + 1), jnp.int32),
                 jnp.int32(0), jnp.zeros((R0, 4), jnp.float32))
        sbuf, n_h, rgba = RR._march_death(
            dtree, opt, spp, consts, state, SCHED, MAXS,
            jnp.arange(R0, dtype=jnp.int32), dirs, carry, cap_h)
        return jnp.sum(rgba[:, 3]) + jnp.sum(sbuf[:64, 0]) + n_h

    # ---- full production frames -----------------------------------------
    r0 = RR.Renderer(dt, W, H, cam.fx, cam.fy,
                     options=RenderOptions(
                         spp=spp, denoise=False, step_size=1e-4,
                         sigma_thresh=1e-2, background_brightness=1.0),
                     shade_cap_div=SHADE_DIV)

    def v_frame0():
        img, _ = r0.render(cam.transform)
        return img

    timeit(v_setup, dt, transform, hi, lo, label="setup (rays+rng+dst+init)")
    timeit(v_stub, dt, transform, hi, lo, label="stub march (no death, no write-back)")
    timeit(v_mdeath, dt, transform, hi, lo, label="march + death boundaries (no final shade)")
    timeit(v_frame0, label="full frame, denoise off")

    import glob
    nets = sorted(glob.glob(os.path.join(
        ROOT, ".bench_cache", "quality_ds", "work", "ts_*.gnet")))
    if nets:
        r1 = RR.Renderer(dt, W, H, cam.fx, cam.fy,
                         options=RenderOptions(
                             spp=spp, denoise=True, step_size=1e-4,
                             sigma_thresh=1e-2,
                             background_brightness=1.0),
                         shade_cap_div=SHADE_DIV)
        r1.set_denoiser(nets[-1])

        def v_frame1():
            img, _ = r1.render(cam.transform)
            return img
        timeit(v_frame1, label="full frame, denoise on (bench config)")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
