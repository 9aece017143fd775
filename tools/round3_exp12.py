"""Round-3 exp12: price the recs scatter CASCADE and the shade sub-parts.

  A. march_only with the production cascade (every stage boundary
     scatters the deep recs back into the parent width: ~675k set-scatter
     rows/frame) vs a cascade-free variant (deep recs checksummed into
     one lane -- all march work stays live, wide scatters vanish).
     exp11's prefix protocol summed the stages to ~113 ms while the real
     march measures ~168 ms; if the gap is the cascade, a gidx/grecs
     redesign (write each ray once, at death) is the next lever.
  B. _shade decomposition at the production div-5 cap: alpha-only ->
     +hit fast_nonzero -> +row gathers -> +data gather -> +einsum ->
     full (incl. write-back scatter).

Run: nohup python tools/round3_exp12.py > /tmp/r3exp12.log 2>&1 &
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
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(
        float(jnp.sum(jnp.ravel(jnp.asarray(l, jnp.float32))[::9973]))
        for l in leaves))


def timeit(fn, *args, reps=6, label=""):
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

    def setup(dtree, transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        vdirs = dirs
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        consts, state = RR._init_march(dtree, dirs, cens, dst, opt)
        return vdirs, consts, state

    # ---- A: cascade vs cascade-free march -------------------------------
    def msr(dtree, consts, state, schedule, cascade, base_width=None):
        (steps, frac, kind, t_in), rest = schedule[0], schedule[1:]
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
            return msr(dtree, consts, st, rest, cascade, base_width)

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
            c_recs = run_here(c_consts, c_state)
            if cascade:
                return state[5].at[idx].set(c_recs, mode="drop")
            # keep the deep march live; skip the wide write-back
            return state[5].at[0, 0].add(jnp.sum(c_recs))

        def full(_):
            st = RR._march_loop(dtree, opt, spp, consts, state, MAXS,
                                unroll=2, brick=brick, t_in=t_in)
            return st[5]

        return jax.lax.cond(n_active <= cap, compacted, full, None)

    @functools.partial(jax.jit, static_argnames=("cascade",))
    def march_only(dtree, transform, hi, lo, cascade=True):
        _, consts, state = setup(dtree, transform, hi, lo)
        return jnp.sum(msr(dtree, consts, state, SCHED, cascade))

    if os.environ.get("RT_EXP12_PART", "AB").find("A") >= 0:
        timeit(functools.partial(march_only, cascade=True),
               dt, transform, hi, lo, label="march [cascade=ON  (production)]")
        timeit(functools.partial(march_only, cascade=False),
               dt, transform, hi, lo, label="march [cascade=OFF (lower bound)]")

    # ---- B: shade decomposition ------------------------------------------
    @jax.jit
    def march_recs(dtree, transform, hi, lo):
        vdirs, consts, state = setup(dtree, transform, hi, lo)
        leafs, cnts = RR._march_schedule(dtree, opt, spp, consts, state,
                                         SCHED, MAXS)
        return vdirs, leafs, cnts

    vdirs, leafs, cnts = march_recs(dt, transform, hi, lo)
    vdirs, leafs, cnts = map(jax.device_put, (vdirs, leafs, cnts))
    sync(cnts)
    cap_div = 5
    caph = R // cap_div

    @jax.jit
    def s_alpha(dtree, leafs, cnts, vdirs):
        w = jnp.where(cnts > 0, cnts, 0.0)
        return jnp.sum(w, axis=1) / spp

    @jax.jit
    def s_basis(dtree, leafs, cnts, vdirs):
        return RR._eval_masked_basis(dtree, vdirs, opt)

    @jax.jit
    def s_nonzero(dtree, leafs, cnts, vdirs):
        hit = cnts[:, 0] > 0
        return fast_nonzero(hit, caph, R)

    @jax.jit
    def s_rowgather(dtree, leafs, cnts, vdirs):
        w = jnp.where(cnts > 0, cnts, 0.0)
        basis = RR._eval_masked_basis(dtree, vdirs, opt)
        hidx = fast_nonzero(cnts[:, 0] > 0, caph, R)
        hc = jnp.minimum(hidx, R - 1)
        return (jnp.take(leafs, hc, axis=0),
                jnp.take(w, hc, axis=0),
                jnp.take(basis, hc, axis=0))

    @jax.jit
    def s_datagather(dtree, leafs, cnts, vdirs):
        w = jnp.where(cnts > 0, cnts, 0.0)
        hidx = fast_nonzero(cnts[:, 0] > 0, caph, R)
        hc = jnp.minimum(hidx, R - 1)
        leafs_h = jnp.take(leafs, hc, axis=0)
        vals = jnp.take(dtree.data, leafs_h.reshape(-1), axis=0)
        return jnp.sum(vals.astype(jnp.float32))

    @jax.jit
    def s_full(dtree, leafs, cnts, vdirs):
        return RR._shade(dtree, vdirs, leafs, cnts, opt, spp,
                         cap_div=cap_div)

    timeit(s_alpha, dt, leafs, cnts, vdirs, label="shade: alpha only")
    timeit(s_basis, dt, leafs, cnts, vdirs, label="shade: basis eval 640k")
    timeit(s_nonzero, dt, leafs, cnts, vdirs, label="shade: + hit fast_nonzero")
    timeit(s_rowgather, dt, leafs, cnts, vdirs, label="shade: + leaf/w/basis row gathers")
    timeit(s_datagather, dt, leafs, cnts, vdirs, label="shade: + data gather [caph*spp,28]")
    timeit(s_full, dt, leafs, cnts, vdirs, label="shade: FULL (production div5)")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
