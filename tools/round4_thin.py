"""Round-4: decomposition of ONE thin march round at 640k width.

Roofline (tools/roofline.py): thin rounds at 640k measure ~11.4 ms/round
against a 3.4 ms pure-gather model -- ~8 ms/round unexplained.  This
tool splits the round into cumulative variants (each a fori over 8
rounds to amortize dispatch; deltas are the signal):

  tsum       state round-trip only (t += const; no gather)
  gather     + pos/cell/flat index math + LUT row gather
  decode     + full _query_step (LUT decode + Chebyshev skip + DDA exit)
  noskip     decode with skip_cap=0 (isolates the skip arithmetic)
  crossing   + _step_update minus the record write
  full       the production _march_body

Run: nohup python tools/round4_thin.py > /tmp/r4/thin.log 2>&1 &
"""
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

ROUNDS = 8


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
    print(f"  {label:52s} {dt*1e3:9.2f} ms  "
          f"({dt/ROUNDS*1e3:6.2f} ms/round)", flush=True)
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
    dt_noskip = dt.replace(skip_cap=0)
    W = H = 800
    R = W * H
    spp = 6
    opt = RR.FrozenOptions.from_options(RenderOptions(
        spp=spp, denoise=False, step_size=1e-4, sigma_thresh=1e-2,
        background_brightness=1.0))
    cam = Camera(width=W, height=H)
    transform = jnp.asarray(cam.transform, jnp.float32)
    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)

    def setup(dtree, transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx,
                                           cam.fy)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        return RR._init_march(dtree, dirs, cens, dst, opt)

    # pre-build initial state ONCE on device; variants take it as input
    consts, state = jax.jit(
        lambda tf, hi, lo: setup(dt, tf, hi, lo))(transform, hi, lo)
    consts = jax.tree_util.tree_map(jax.block_until_ready, consts)

    def fori(body, st0):
        return jax.lax.fori_loop(0, ROUNDS, lambda i, st: body(st), st0)

    @jax.jit
    def v_tsum(consts, state):
        (cen_t, d_t, invdir, delta_scale, dstv, tmax) = consts

        def body(st):
            (active, t, src, sppc, shn, recs) = st
            t = jnp.where(active, t + jnp.float32(1e-3), t)
            return (active, t, src, sppc, shn, recs)
        return fori(body, state)[1]

    # IMPORTANT: every variant takes the DeviceTree as a jit ARGUMENT --
    # closing over it bakes the ~1 GB LUT into the uploaded HLO and the
    # tunnel's remote_compile rejects the body (HTTP 413)
    @jax.jit
    def v_gather(dtree, consts, state):
        (cen_t, d_t, invdir, delta_scale, dstv, tmax) = consts
        res = dtree.N ** dtree.lut_levels

        def body(st):
            (active, t, src, sppc, shn, recs) = st
            pos = jnp.clip(cen_t + t[:, None] * d_t, 0.0, 1.0 - 1e-6)
            cell = jnp.clip(jnp.floor(pos * res).astype(jnp.int32), 0,
                            res - 1)
            flat = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
            row = jnp.take(dtree.lut, jnp.where(active, flat, 0), axis=0)
            # data-dependent t advance keeps the gather chain serial
            t = jnp.where(active,
                          t + jnp.float32(1e-3) +
                          (row[:, 0] & 1).astype(jnp.float32) * 1e-6, t)
            return (active, t, src, sppc, shn, recs)
        return fori(body, state)[1]

    @jax.jit
    def v_decode(dtree, consts, state):
        (cen_t, d_t, invdir, delta_scale, dstv, tmax) = consts

        def body(st):
            (active, t, src, sppc, shn, recs) = st
            pos = cen_t + t[:, None] * d_t
            sub_ptr, sigma, t_sub = RR._query_step(dtree, pos,
                                                   invdir, active)
            t = jnp.where(active, t + t_sub + jnp.float32(1e-4), t)
            active = active & (t < tmax)
            return (active, t, src, sppc, shn, recs)
        return fori(body, state)[1]

    @jax.jit
    def v_idx(consts, state):
        """Index math ONLY (no LUT gather): pos/cell/flat on [R,3]."""
        (cen_t, d_t, invdir, delta_scale, dstv, tmax) = consts
        res = dt.N ** dt.lut_levels

        def body(st):
            (active, t, src, sppc, shn, recs) = st
            pos = jnp.clip(cen_t + t[:, None] * d_t, 0.0, 1.0 - 1e-6)
            cell = jnp.clip(jnp.floor(pos * res).astype(jnp.int32), 0,
                            res - 1)
            flat = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
            t = jnp.where(active,
                          t + jnp.float32(1e-3) +
                          (flat & 1).astype(jnp.float32) * 1e-6, t)
            return (active, t, src, sppc, shn, recs)
        return fori(body, state)[1]

    @jax.jit
    def v_idx_soa(consts, state):
        """Index math with [3, R] layout (rays on the 128-lane axis)."""
        (cen_t, d_t, invdir, delta_scale, dstv, tmax) = consts
        res = dt.N ** dt.lut_levels
        cen_T, d_T = cen_t.T, d_t.T  # [3, R]

        def body(st):
            (active, t, src, sppc, shn, recs) = st
            pos = jnp.clip(cen_T + t[None, :] * d_T, 0.0, 1.0 - 1e-6)
            cell = jnp.clip(jnp.floor(pos * res).astype(jnp.int32), 0,
                            res - 1)
            flat = (cell[0] * res + cell[1]) * res + cell[2]
            t = jnp.where(active,
                          t + jnp.float32(1e-3) +
                          (flat & 1).astype(jnp.float32) * 1e-6, t)
            return (active, t, src, sppc, shn, recs)
        return fori(body, state)[1]

    @jax.jit
    def v_gather_soa(dtree, consts, state):
        """SoA index math + the LUT row gather."""
        (cen_t, d_t, invdir, delta_scale, dstv, tmax) = consts
        res = dtree.N ** dtree.lut_levels
        cen_T, d_T = cen_t.T, d_t.T

        def body(st):
            (active, t, src, sppc, shn, recs) = st
            pos = jnp.clip(cen_T + t[None, :] * d_T, 0.0, 1.0 - 1e-6)
            cell = jnp.clip(jnp.floor(pos * res).astype(jnp.int32), 0,
                            res - 1)
            flat = (cell[0] * res + cell[1]) * res + cell[2]
            row = jnp.take(dtree.lut, jnp.where(active, flat, 0), axis=0)
            t = jnp.where(active,
                          t + jnp.float32(1e-3) +
                          (row[:, 0] & 1).astype(jnp.float32) * 1e-6, t)
            return (active, t, src, sppc, shn, recs)
        return fori(body, state)[1]

    @jax.jit
    def v_crossing(dtree, consts, state):
        (cen_t, d_t, invdir, delta_scale, dstv, tmax) = consts
        sigma_thresh = jnp.float32(opt.sigma_thresh)
        step_size = jnp.float32(opt.step_size)

        def body(st):
            (active, t, src, sppc, shn, recs) = st
            pos = cen_t + t[:, None] * d_t
            sub_ptr, sigma, t_sub = RR._query_step(dtree, pos, invdir,
                                                   active)
            delta_t = t_sub + step_size
            has_sigma = (sigma > sigma_thresh) & active
            delta = jnp.where(has_sigma,
                              delta_t * delta_scale * sigma, 0.0)
            s_new = src + delta
            n_leq = jnp.sum((dstv <= s_new[:, None]).astype(jnp.int32),
                            axis=1)
            c = jnp.maximum(n_leq - sppc, 0)
            rec = has_sigma & (c > 0)
            # record write OMITTED (recs untouched)
            shn = shn + rec.astype(jnp.int32)
            sppc = sppc + jnp.where(rec, c, 0)
            src = jnp.where(has_sigma, s_new, src)
            t = jnp.where(active, t + delta_t, t)
            active = active & (t < tmax) & (sppc < spp)
            return (active, t, src, sppc, shn, recs)
        return fori(body, state)

    @jax.jit
    def v_crossing_T(dtree, consts, state):
        """Crossing math with the [R, spp] threshold table TRANSPOSED to
        [spp, R] (rays on the 128-lane axis; [R, 6] puts 6 lanes of 128
        to work on every compare)."""
        (cen_t, d_t, invdir, delta_scale, dstv, tmax) = consts
        dstT = dstv.T  # [spp, R]
        sigma_thresh = jnp.float32(opt.sigma_thresh)
        step_size = jnp.float32(opt.step_size)

        def body(st):
            (active, t, src, sppc, shn, recs) = st
            pos = cen_t + t[:, None] * d_t
            sub_ptr, sigma, t_sub = RR._query_step(dtree, pos, invdir,
                                                   active)
            delta_t = t_sub + step_size
            has_sigma = (sigma > sigma_thresh) & active
            delta = jnp.where(has_sigma,
                              delta_t * delta_scale * sigma, 0.0)
            s_new = src + delta
            n_leq = jnp.sum((dstT <= s_new[None, :]).astype(jnp.int32),
                            axis=0)
            c = jnp.maximum(n_leq - sppc, 0)
            rec = has_sigma & (c > 0)
            shn = shn + rec.astype(jnp.int32)
            sppc = sppc + jnp.where(rec, c, 0)
            src = jnp.where(has_sigma, s_new, src)
            t = jnp.where(active, t + delta_t, t)
            active = active & (t < tmax) & (sppc < spp)
            return (active, t, src, sppc, shn, recs)
        return fori(body, state)

    @jax.jit
    def v_crossing_barrier(dtree, consts, state):
        """Full crossing round with an optimization_barrier after the
        LUT gather: if XLA fuses the crossing math INTO the gather's
        per-row loop (where it runs near-scalar), the barrier forces it
        out into vectorized elementwise kernels."""
        (cen_t, d_t, invdir, delta_scale, dstv, tmax) = consts
        sigma_thresh = jnp.float32(opt.sigma_thresh)
        step_size = jnp.float32(opt.step_size)
        res = dtree.N ** dtree.lut_levels

        def body(st):
            (active, t, src, sppc, shn, recs) = st
            pos = jnp.clip(cen_t + t[:, None] * d_t, 0.0, 1.0 - 1e-6)
            cell = jnp.clip(jnp.floor(pos * res).astype(jnp.int32), 0,
                            res - 1)
            flat = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
            row = jnp.take(dtree.lut, jnp.where(active, flat, 0), axis=0)
            row = jax.lax.optimization_barrier(row)
            packed = row[:, 0]
            sigma = jax.lax.bitcast_convert_type(row[:, 1], jnp.float32)
            # surrogate decode: sub-cell exit ~ packed parity epsilon
            t_sub = jnp.float32(1.5e-3) + \
                (packed & 1).astype(jnp.float32) * 1e-6
            delta_t = t_sub + step_size
            has_sigma = (sigma > sigma_thresh) & active
            delta = jnp.where(has_sigma,
                              delta_t * delta_scale * sigma, 0.0)
            s_new = src + delta
            n_leq = jnp.sum((dstv <= s_new[:, None]).astype(jnp.int32),
                            axis=1)
            c = jnp.maximum(n_leq - sppc, 0)
            rec = has_sigma & (c > 0)
            shn = shn + rec.astype(jnp.int32)
            sppc = sppc + jnp.where(rec, c, 0)
            src = jnp.where(has_sigma, s_new, src)
            t = jnp.where(active, t + delta_t, t)
            active = active & (t < tmax) & (sppc < spp)
            return (active, t, src, sppc, shn, recs)
        return fori(body, state)

    @jax.jit
    def v_crossing_nobarrier(dtree, consts, state):
        """Same surrogate-decode round WITHOUT the barrier (control)."""
        (cen_t, d_t, invdir, delta_scale, dstv, tmax) = consts
        sigma_thresh = jnp.float32(opt.sigma_thresh)
        step_size = jnp.float32(opt.step_size)
        res = dtree.N ** dtree.lut_levels

        def body(st):
            (active, t, src, sppc, shn, recs) = st
            pos = jnp.clip(cen_t + t[:, None] * d_t, 0.0, 1.0 - 1e-6)
            cell = jnp.clip(jnp.floor(pos * res).astype(jnp.int32), 0,
                            res - 1)
            flat = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
            row = jnp.take(dtree.lut, jnp.where(active, flat, 0), axis=0)
            packed = row[:, 0]
            sigma = jax.lax.bitcast_convert_type(row[:, 1], jnp.float32)
            t_sub = jnp.float32(1.5e-3) + \
                (packed & 1).astype(jnp.float32) * 1e-6
            delta_t = t_sub + step_size
            has_sigma = (sigma > sigma_thresh) & active
            delta = jnp.where(has_sigma,
                              delta_t * delta_scale * sigma, 0.0)
            s_new = src + delta
            n_leq = jnp.sum((dstv <= s_new[:, None]).astype(jnp.int32),
                            axis=1)
            c = jnp.maximum(n_leq - sppc, 0)
            rec = has_sigma & (c > 0)
            shn = shn + rec.astype(jnp.int32)
            sppc = sppc + jnp.where(rec, c, 0)
            src = jnp.where(has_sigma, s_new, src)
            t = jnp.where(active, t + delta_t, t)
            active = active & (t < tmax) & (sppc < spp)
            return (active, t, src, sppc, shn, recs)
        return fori(body, state)

    @jax.jit
    def v_full(dtree, consts, state):
        def body(st):
            return RR._march_body(dtree, opt, spp, consts, st)
        return fori(body, state)

    timeit(v_tsum, consts, state, label="tsum (state round-trip only)")
    timeit(v_idx, consts, state, label="+ index math only ([R,3])")
    timeit(v_idx_soa, consts, state, label="+ index math only ([3,R])")
    timeit(v_gather, dt, consts, state,
           label="+ index math + LUT gather")
    timeit(v_gather_soa, dt, consts, state,
           label="+ SoA index math + LUT gather")
    timeit(v_decode, dt, consts, state,
           label="+ decode + skip + DDA (_query_step)")
    timeit(v_decode, dt_noskip, consts, state,
           label="  same, skip_cap=0")
    timeit(v_crossing, dt, consts, state,
           label="+ crossing math (no record write)")
    timeit(v_crossing_T, dt, consts, state,
           label="  same, dst table [spp, R]")
    timeit(v_crossing_nobarrier, dt, consts, state,
           label="surrogate-decode round, fused (control)")
    timeit(v_crossing_barrier, dt, consts, state,
           label="surrogate-decode round + post-gather barrier")
    timeit(v_full, dt, consts, state, label="full _march_body")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
