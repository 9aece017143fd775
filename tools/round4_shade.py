"""Round-4: decomposition of the final-shade piece (exp15: 33.4 ms).

The shade-gather floor is ~4.7 ms (roofline: 0.77M rows x 6.1 ns), so
~28 ms hide in the surrounding math.  Synthetic side-buffer inputs with
bench-realistic stats (cap_h = R/5, ~68k live rows, ~4.8 filled slots
per row, random leaf ptrs) -- no march needed, so each variant compiles
in seconds and the deltas isolate:

  split      packed-lane decode only
  gather16   [M*spp, 29] f16 data gather, summed in f16
  gather32   + astype(f32) (the conversion cost)
  basis      vdirs gather + masked SH basis eval only
  rows       full _shade_rows (logits einsum + sigmoid + rgb einsum)
  rows_mul   _shade_rows with einsums replaced by broadcast-mul + sum
  sbuf       full _shade_sbuf (adds the rgba set-scatter)
  comp       composite + aux (nhwc + chw) from random [R,4] rows

Run: nohup python tools/round4_shade.py > /tmp/r4/shade.log 2>&1 &
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


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(sum(
        float(jnp.sum(jnp.ravel(jnp.asarray(l, jnp.float32))[::9973]))
        for l in leaves))


def timeit(fn, *args, reps=16, label=""):
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
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import n3tree
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render import renderer as RR

    print(f"devices: {jax.devices()}", flush=True)
    tree = n3tree.load(os.path.join(ROOT, ".bench_cache",
                                    "shell_d9_sh9.npz"))
    dt = upload_tree(tree, lut_levels=9)
    W = H = 800
    R = W * H
    spp = 6
    cap_h = R // 5            # bench-probed shade_div=5
    n_h = 68400               # exp15: measured live hit rows
    opt = RR.FrozenOptions.from_options(RenderOptions(
        spp=spp, denoise=False, step_size=1e-4, sigma_thresh=1e-2,
        background_brightness=1.0))

    n_data = int(np.asarray(dt.data.shape[0]))
    rng = np.random.default_rng(0)
    leafs = rng.integers(1, n_data, size=(cap_h, spp)).astype(np.int64)
    nfill = np.clip(rng.poisson(4.8, size=cap_h), 1, spp)
    cnts = (np.arange(spp)[None, :] < nfill[:, None]).astype(np.int64)
    packed = (leafs | (cnts << 27)).astype(np.int32)
    orig = rng.permutation(R)[:cap_h].astype(np.int32)
    sbuf = jnp.asarray(np.concatenate([packed, orig[:, None]], axis=1))
    vdirs_full = jnp.asarray(
        rng.standard_normal((R, 3)).astype(np.float32))
    vdirs_full = vdirs_full / jnp.linalg.norm(vdirs_full, axis=1,
                                              keepdims=True)
    rgba0 = jnp.zeros((R, 4), jnp.float32)
    n_h_j = jnp.int32(n_h)
    outc = jnp.asarray(rng.random((R, 4)).astype(np.float32))

    @jax.jit
    def v_split(dtree, sbuf):
        recs = sbuf[:, :-1]
        leafs, cnts = RR._recs_split(recs, spp)
        return jnp.sum(leafs[::97]) + jnp.sum(cnts[::97])

    @jax.jit
    def v_gather16(dtree, sbuf):
        recs = sbuf[:, :-1]
        leafs, _ = RR._recs_split(recs, spp)
        vals = jnp.take(dtree.data, leafs.reshape(-1), axis=0)
        return jnp.sum(vals[::97, 0].astype(jnp.float32))

    @jax.jit
    def v_gather32(dtree, sbuf):
        recs = sbuf[:, :-1]
        leafs, _ = RR._recs_split(recs, spp)
        vals = jnp.take(dtree.data, leafs.reshape(-1), axis=0).astype(
            jnp.float32)
        return jnp.sum(vals[::97, 0])

    @jax.jit
    def v_basis(dtree, sbuf, vdirs_full):
        orig_h = sbuf[:, -1]
        vd = jnp.take(vdirs_full, jnp.clip(orig_h, 0, R - 1), axis=0)
        basis = RR._eval_masked_basis(dtree, vd, opt)
        return jnp.sum(basis[::97])

    @jax.jit
    def v_rows(dtree, sbuf, vdirs_full, n_h_j):
        body = sbuf
        recs_h, orig_h = body[:, :-1], body[:, -1]
        live = (jnp.arange(cap_h, dtype=jnp.int32) < n_h_j)
        vd = jnp.take(vdirs_full, jnp.clip(orig_h, 0, R - 1), axis=0)
        rows = RR._shade_rows(dtree, vd, recs_h,
                              live.astype(jnp.float32), opt, spp)
        return jnp.sum(rows[::97])

    def _shade_rows_mul(tree, vdirs_rows, recs_rows, valid_f):
        M = recs_rows.shape[0]
        leafs, cnts = RR._recs_split(recs_rows, spp)
        w = jnp.where(cnts > 0, cnts, 0.0) * valid_f[:, None]
        alpha = jnp.sum(w, axis=1) / spp
        vals = jnp.take(tree.data, leafs.reshape(-1), axis=0).reshape(
            M, spp, tree.data_dim).astype(jnp.float32)
        basis = RR._eval_masked_basis(tree, vdirs_rows, opt)
        coeffs = vals[..., :3 * tree.basis_dim].reshape(
            M, spp, 3, tree.basis_dim)
        logits = jnp.sum(coeffs * basis[:, None, None, :], axis=-1)
        rgb_per_leaf = jax.nn.sigmoid(logits)
        rgb = jnp.sum(rgb_per_leaf * w[..., None], axis=1) / spp
        return jnp.concatenate([rgb, alpha[:, None]], axis=1)

    @jax.jit
    def v_rows_mul(dtree, sbuf, vdirs_full, n_h_j):
        recs_h, orig_h = sbuf[:, :-1], sbuf[:, -1]
        live = (jnp.arange(cap_h, dtype=jnp.int32) < n_h_j)
        vd = jnp.take(vdirs_full, jnp.clip(orig_h, 0, R - 1), axis=0)
        rows = _shade_rows_mul(dtree, vd, recs_h,
                               live.astype(jnp.float32))
        return jnp.sum(rows[::97])

    @jax.jit
    def v_sbuf(dtree, sbuf, vdirs_full, n_h_j, rgba0):
        rgba = RR._shade_sbuf(dtree, vdirs_full, sbuf, n_h_j, rgba0,
                              opt, spp, cap_h)
        return jnp.sum(rgba[::97])

    @jax.jit
    def v_comp(outc):
        img, oc = RR.composite(outc, W, H, 1.0)
        aux_nhwc = RR.aux_from_composite(oc, W, H, "nhwc")
        return jnp.sum(img[::53, ::47]) + jnp.sum(aux_nhwc[::53, ::47])

    @jax.jit
    def v_comp_chw(outc):
        img, oc = RR.composite(outc, W, H, 1.0)
        aux = RR.aux_from_composite(oc, W, H, "chw")
        return jnp.sum(img[::53, ::47]) + jnp.sum(aux[:, ::53, ::47])

    timeit(v_split, dt, sbuf, label="split (packed-lane decode)")
    timeit(v_gather16, dt, sbuf, label="gather f16 [768k, 29]")
    timeit(v_gather32, dt, sbuf, label="gather + astype f32")
    timeit(v_basis, dt, sbuf, vdirs_full, label="vdirs gather + SH basis")
    timeit(v_rows, dt, sbuf, vdirs_full, n_h_j,
           label="_shade_rows (einsum HIGHEST)")
    timeit(v_rows_mul, dt, sbuf, vdirs_full, n_h_j,
           label="_shade_rows (broadcast-mul + sum)")
    timeit(v_sbuf, dt, sbuf, vdirs_full, n_h_j, rgba0,
           label="_shade_sbuf (+ rgba set-scatter)")
    timeit(v_comp, outc, label="composite + aux nhwc")
    timeit(v_comp_chw, outc, label="composite + aux chw (write_buffer)")

    # numerical identity check einsum vs mul
    a = float(v_rows(dt, sbuf, vdirs_full, n_h_j))
    b = float(v_rows_mul(dt, sbuf, vdirs_full, n_h_j))
    print(f"  rows einsum vs mul checksum: {a:.6f} vs {b:.6f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
