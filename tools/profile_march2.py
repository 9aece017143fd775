"""Round-2 deep profiling: shade, sort, rng, compaction, brick variants.

Run: nohup python tools/profile_march2.py > /tmp/profile2.log 2>&1 &
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
    print(f"  {label:52s} {dt*1e3:9.2f} ms", flush=True)
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
    spp = 6
    R = W * H
    cam = Camera(width=W, height=H)
    ropt = RenderOptions(spp=spp, denoise=False)
    opt = RR.FrozenOptions.from_options(ropt)
    transform = jnp.asarray(cam.transform, jnp.float32)
    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)
    rng = np.random.default_rng(0)

    # ---------- rays/rng/sort decomposition ----------
    @jax.jit
    def rng_only(hi, lo):
        return pcg32_uniforms_range(hi, lo, n=R * spp, inc=3).reshape(R, spp)

    timeit(rng_only, hi, lo, label="pcg32 uniforms [640k,6]")
    uni = rng_only(hi, lo)
    uni.block_until_ready()

    @jax.jit
    def sort_only(u):
        return jnp.sort(-jnp.log1p(-u), axis=-1)

    timeit(sort_only, uni, label="log1p + jnp.sort axis=-1")

    def cswap(a, b):
        return jnp.minimum(a, b), jnp.maximum(a, b)

    @jax.jit
    def sortnet_only(u):
        d = -jnp.log1p(-u)
        c = [d[:, i] for i in range(6)]
        # 6-element sorting network (12 compare-exchanges)
        for i, j in ((0, 5), (1, 3), (2, 4), (1, 2), (3, 4), (0, 3), (2, 5),
                     (0, 1), (2, 3), (4, 5), (1, 2), (3, 4)):
            c[i], c[j] = cswap(c[i], c[j])
        return jnp.stack(c, axis=-1)

    s_ref = np.asarray(sort_only(uni))
    s_net = np.asarray(sortnet_only(uni))
    print(f"  sortnet exact match: {np.array_equal(s_ref, s_net)}",
          flush=True)
    timeit(sortnet_only, uni, label="log1p + 12-swap sorting network")

    @jax.jit
    def rays_only(transform):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        return dirs

    timeit(rays_only, transform, label="camera rays")

    # ---------- shade decomposition ----------
    leafs = jnp.asarray(
        rng.integers(0, tree.child.shape[0], (R, spp)), jnp.int32)
    cnts = jnp.asarray((rng.random((R, spp)) < 0.3) * 2.0, jnp.float32)
    cnts = cnts.at[:, 0].set(3.0)
    vdirs = jnp.asarray(rng.standard_normal((R, 3)), jnp.float32)
    vdirs = vdirs / jnp.linalg.norm(vdirs, axis=-1, keepdims=True)

    recs = (leafs & RR.REC_PTR_MASK) | (cnts.astype(jnp.int32)
                                        << RR.REC_CNT_SHIFT)

    @jax.jit
    def shade_full(dt, vdirs, recs):
        return RR._shade(dt, vdirs, recs, opt, spp)

    timeit(shade_full, dt, vdirs, recs, label="_shade as-is (two-tier)")

    @jax.jit
    def shade_basis(dt, vdirs):
        return RR._eval_masked_basis(dt, vdirs, opt)

    timeit(shade_basis, dt, vdirs, label="  basis eval only")
    basis = shade_basis(dt, vdirs)
    basis.block_until_ready()

    @jax.jit
    def shade_slot0(dt, leafs, basis):
        return RR._leaf_rgb(dt, leafs[:, 0], basis)

    timeit(shade_slot0, dt, leafs, basis, label="  slot0 gather+einsum+sigmoid")

    @jax.jit
    def gather_f16(dt, leafs):
        return jnp.take(dt.data, leafs[:, 0], axis=0)

    timeit(gather_f16, dt, leafs, label="  data gather f16 [13M,49] rows")

    M, D = tree.data.shape

    @jax.jit
    def gather_rows(tbl, leafs):
        return jnp.take(tbl, leafs[:, 0], axis=0)

    for pad_to, dtype, note in ((32, np.float16, "64B f16"),
                                (64, np.float16, "128B f16"),
                                (32, np.float32, "128B f32"),
                                (64, np.float32, "256B f32")):
        tbl = jnp.asarray(np.pad(np.asarray(tree.data, dtype),
                                 ((0, 0), (0, pad_to - D))))
        tbl.block_until_ready()
        timeit(gather_rows, tbl, leafs,
               label=f"  data gather {note} [13M,{pad_to}] rows")
        del tbl

    @jax.jit
    def shade_nonzero(cnts):
        extra_mask = (cnts[:, 1:] > 0).reshape(-1)
        return jnp.nonzero(extra_mask, size=R // 2,
                           fill_value=R * (spp - 1))[0]

    timeit(shade_nonzero, cnts, label="  nonzero(size=R/2) for extras")

    @jax.jit
    def shade_scatter(dt, leafs, cnts, basis):
        rgb = RR._leaf_rgb(dt, leafs[:, 0], basis) * cnts[:, 0:1]
        flat = jnp.nonzero((cnts[:, 1:] > 0).reshape(-1), size=R // 2,
                           fill_value=R * (spp - 1))[0]
        ray = jnp.minimum(flat // (spp - 1), R - 1)
        slot = flat % (spp - 1) + 1
        leaf_e = jnp.take(leafs.reshape(-1),
                          jnp.minimum(ray * spp + slot, R * spp - 1))
        w_e = jnp.take(cnts.reshape(-1),
                       jnp.minimum(ray * spp + slot, R * spp - 1))
        basis_e = jnp.take(basis, ray, axis=0)
        rgb_e = RR._leaf_rgb(dt, leaf_e, basis_e) * w_e[:, None]
        return rgb.at[ray].add(rgb_e, mode="drop")

    timeit(shade_scatter, dt, leafs, cnts, basis,
           label="  full two-tier (slot0+extras+scatter)")

    # ---------- compaction cost ----------
    active = jnp.asarray(rng.random(R) < 0.35)

    @jax.jit
    def compact_cost(active, uni):
        idx = jnp.nonzero(active, size=R // 2, fill_value=R)[0]
        bundle = jnp.concatenate([uni] * 5, axis=1)  # [R,30] stand-in
        row = jnp.take(jax.lax.bitcast_convert_type(bundle, jnp.int32), idx,
                       axis=0, mode="fill", fill_value=0)
        return row

    timeit(compact_cost, active, uni, label="compaction: nonzero+pack @640k->320k")

    # ---------- aux assembly ----------
    out4 = jnp.asarray(rng.random((R, 4)), jnp.float32)

    @jax.jit
    def aux_assembly(out):
        aux = jnp.concatenate([out, out * out], axis=-1)
        return aux.T.reshape(8, H, W)

    timeit(aux_assembly, out4, label="aux concat+transpose [R,8]->[8,H,W]")

    # ---------- brick rounds at tail widths / t_in ----------
    pack_args = None

    @jax.jit
    def make_pack(transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        vdirs = RR.rodrigues_jnp(jnp.zeros(3, jnp.float32), dirs)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        return jnp.concatenate([dirs, vdirs, cens, dst], axis=1)

    pack = make_pack(transform, hi, lo)
    pack.block_until_ready()

    def consts_state_of(pk, rsub):
        dirs, cens, dst = pk[:rsub, 0:3], pk[:rsub, 6:9], pk[:rsub, 9:9+spp]
        cen_t = dt.offset[None, :] + dt.scale[None, :] * cens
        d_scaled = dirs * dt.scale[None, :]
        delta_scale = 1.0 / jnp.linalg.norm(d_scaled, axis=-1)
        d_t = d_scaled * delta_scale[:, None]
        invdir = 1.0 / (d_t + 1e-9)
        tmin, tmax = RR._dda_world(cen_t, invdir, opt.render_bbox)
        hit = (tmax >= 0) & (tmin <= tmax)
        consts = (cen_t, d_t, invdir, delta_scale, dst, tmax)
        state = (hit, tmin, jnp.zeros(rsub, jnp.float32),
                 jnp.zeros(rsub, jnp.int32), jnp.zeros(rsub, jnp.int32),
                 jnp.zeros((rsub, spp), jnp.int32),
                 jnp.zeros((rsub, spp), jnp.float32))
        return consts, state

    @functools.partial(jax.jit,
                       static_argnames=("rsub", "rounds", "t_in", "brick"))
    def march_sub(dt, pk, *, rsub: int, rounds: int, t_in: int, brick: bool):
        consts, state = consts_state_of(pk, rsub)

        def body(i, st):
            if brick:
                return RR._march_body_brick(dt, opt, spp, consts, st,
                                            t_in=t_in)
            return RR._march_body(dt, opt, spp, consts, st)

        st = jax.lax.fori_loop(0, rounds, body, state)
        return st[5]

    for rsub in (163840, 40960, 8192):
        for t_in, brick in ((1, False), (4, True), (6, True), (8, True)):
            kind = f"brick t_in={t_in}" if brick else "thin"
            f2 = functools.partial(march_sub, rsub=rsub, rounds=2,
                                   t_in=t_in, brick=brick)
            f10 = functools.partial(march_sub, rsub=rsub, rounds=10,
                                    t_in=t_in, brick=brick)
            a = timeit(f2, dt, pack, label=f"{kind} 2 rounds @{rsub}")
            b = timeit(f10, dt, pack, label=f"{kind} 10 rounds @{rsub}")
            print(f"    -> per round @{rsub} {kind}: {(b-a)/8*1e3:.3f} ms",
                  flush=True)

    # effective steps per brick round (how far rays got after k rounds)
    @functools.partial(jax.jit, static_argnames=("rounds", "t_in", "brick"))
    def alive_after(dt, pk, *, rounds: int, t_in: int, brick: bool):
        consts, state = consts_state_of(pk, R)

        def body(i, st):
            if brick:
                return RR._march_body_brick(dt, opt, spp, consts, st,
                                            t_in=t_in)
            return RR._march_body(dt, opt, spp, consts, st)

        st = jax.lax.fori_loop(0, rounds, body, state)
        return jnp.sum(st[0].astype(jnp.int32))

    for t_in in (4, 6, 8):
        counts = [int(alive_after(dt, pack, rounds=k, t_in=t_in, brick=True))
                  for k in (2, 4, 8, 16)]
        print(f"  brick t_in={t_in}: alive after 2/4/8/16 rounds = {counts}",
              flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
