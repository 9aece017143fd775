"""Round-3 exp16: decomposition of the post-march 33 ms tail.

exp15 established: setup 5.5, +march 101.5, +death extraction 5.0,
+final shade & composite 33.4, +denoise 5.4 ms.  This splits the 33.4:

  mdeath        march + death boundaries, no final shade (exp15 rebaseline)
  shade         + _shade_sbuf (the probed-cap shade + rgba set-scatter)
  shade_nosct   same shade but rows summed instead of set-scattered
                (bounds the [cap_h,4] scatter's cost)
  shade_div{8,12}  shade sliced to a tighter cap (slope of shade cost vs
                cap width; the march still runs the probed div-5 caps)
  frame0        full production frame (adds composite_and_aux)

Run: nohup python tools/round3_exp16.py > /tmp/r3exp16.log 2>&1 &
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
    SHADE_DIV = 5  # bench-probed

    def setup(dtree, transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx,
                                           cam.fy)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        consts, state = RR._init_march(dtree, dirs, cens, dst, opt)
        return dirs, consts, state

    def mdeath(dtree, transform, hi, lo):
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
        return dirs, sbuf, n_h, rgba, cap_h

    @jax.jit
    def v_mdeath(dtree, transform, hi, lo):
        dirs, sbuf, n_h, rgba, cap_h = mdeath(dtree, transform, hi, lo)
        return jnp.sum(rgba[:, 3]) + jnp.sum(sbuf[:64, 0]) + n_h

    @jax.jit
    def v_shade(dtree, transform, hi, lo):
        dirs, sbuf, n_h, rgba, cap_h = mdeath(dtree, transform, hi, lo)
        out = RR._shade_sbuf(dtree, dirs, sbuf, n_h, rgba, opt, spp,
                             cap_h)
        return jnp.sum(out)

    def shade_nosct(dtree, vdirs_full, sbuf, n_h, rgba, cap_h):
        R0 = rgba.shape[0]
        body = sbuf[:cap_h]
        recs_h, orig_h = body[:, :-1], body[:, -1]
        live = (jnp.arange(cap_h, dtype=jnp.int32) < n_h) & \
            (orig_h < R0) & (orig_h >= 0)
        vd = jnp.take(vdirs_full, jnp.clip(orig_h, 0, R0 - 1), axis=0)
        rows = RR._shade_rows(dtree, vd, recs_h,
                              live.astype(jnp.float32), opt, spp)
        return jnp.sum(rows) + jnp.sum(rgba)

    @jax.jit
    def v_shade_nosct(dtree, transform, hi, lo):
        dirs, sbuf, n_h, rgba, cap_h = mdeath(dtree, transform, hi, lo)
        return shade_nosct(dtree, dirs, sbuf, n_h, rgba, cap_h)

    def make_shade_div(div):
        @jax.jit
        def v(dtree, transform, hi, lo):
            dirs, sbuf, n_h, rgba, cap_h = mdeath(dtree, transform, hi,
                                                  lo)
            cap2 = max(R // div, 1)
            out = RR._shade_sbuf(dtree, dirs, sbuf, n_h, rgba, opt, spp,
                                 cap2)
            return jnp.sum(out)
        return v

    r0 = RR.Renderer(dt, W, H, cam.fx, cam.fy,
                     options=RenderOptions(
                         spp=spp, denoise=False, step_size=1e-4,
                         sigma_thresh=1e-2, background_brightness=1.0),
                     shade_cap_div=SHADE_DIV)

    def v_frame0():
        img, _ = r0.render(cam.transform, want_aux=False)
        return img

    def v_frame_aux():
        img, aux = r0.render(cam.transform)
        return aux

    timeit(v_mdeath, dt, transform, hi, lo,
           label="march + death boundaries (no final shade)")
    timeit(v_shade, dt, transform, hi, lo,
           label="+ _shade_sbuf (probed cap div=5)")
    timeit(v_shade_nosct, dt, transform, hi, lo,
           label="+ shade, rows summed (no rgba scatter)")
    timeit(make_shade_div(8), dt, transform, hi, lo,
           label="+ shade sliced to cap div=8")
    timeit(make_shade_div(12), dt, transform, hi, lo,
           label="+ shade sliced to cap div=12")
    timeit(v_frame0, label="full frame, denoise off, want_aux=False")
    timeit(v_frame_aux, label="full frame, denoise off, + [8,H,W] aux")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
