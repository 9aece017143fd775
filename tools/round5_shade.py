"""Round-5: close the shade ledger (VERDICT r4 item 7).

Round 4 left the final shade at 33.4 ms vs a ~23 ms corrected floor
(~15.9 ms [cap_h*spp, 29] f16 gather at the 13M-row data table +
~7 ms measured SH/scatter/composite); the ~10 ms residual was never
attributed.  This decomposes the production ``_shade_sbuf`` at the
SHIPPED probed cap with bench-realistic synthetic inputs (no march, so
every variant compiles in seconds) and A/Bs the candidate formulations:

  gather16      bare [cap_h*spp, 29] f16 data gather (the wall)
  gather32      + astype(f32) (conversion/materialization cost)
  rows          production _shade_rows (einsum HIGHEST)
  rows_f16in    einsum fed the f16 gather directly (no pre-astype)
  rows_bloop    hand-unrolled FMA over the basis dim (no [M,s,3,b]
                materialization)
  rows_nosig    sigmoid replaced by identity (isolates transcendental)
  sbuf          + final rgba set-scatter (the production entry point)
  sbuf_noscat   same minus the scatter (isolates the scatter)
  comp_nhwc     composite + aux nhwc (the fused-denoise feed)

Exactness guard: every formulation's checksum is compared against the
production rows output; only bit-compatible (<= 2e-6 rel) rewrites are
candidates.

Run: nohup python tools/round5_shade.py > /tmp/r5/shade.log 2>&1 &
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

DIV = int(os.environ.get("R5_SHADE_DIV", "6"))  # bench probes div ~5-6


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
    from rt_octree_tpu.ops.traversal import upload_tree, take_data_rows
    from rt_octree_tpu.render import renderer as RR

    print(f"devices: {jax.devices()}  div={DIV}", flush=True)
    tree = n3tree.load(os.path.join(ROOT, ".bench_cache",
                                    "shell_d9_sh9.npz"))
    dt = upload_tree(tree, lut_levels=9)
    W = H = 800
    R = W * H
    spp = 6
    cap_h = R // DIV
    n_h = 68400               # exp15: measured live hit rows
    opt = RR.FrozenOptions.from_options(RenderOptions(
        spp=spp, denoise=False, step_size=1e-4, sigma_thresh=1e-2,
        background_brightness=1.0))
    bd = dt.basis_dim

    n_data = int(np.asarray(dt.data.shape[0]))
    rng = np.random.default_rng(0)
    leafs = rng.integers(1, n_data, size=(cap_h, spp)).astype(np.int64)
    nfill = np.clip(rng.poisson(4.8, size=cap_h), 1, spp)
    cnts = (np.arange(spp)[None, :] < nfill[:, None]).astype(np.int64)
    packed = (leafs | (cnts << 27)).astype(np.int32)
    orig = rng.permutation(R)[:cap_h].astype(np.int32)
    sbuf_np = np.concatenate([packed, orig[:, None]], axis=1)
    sbuf = jnp.asarray(np.concatenate(
        [sbuf_np, np.zeros((1024, sbuf_np.shape[1]), np.int32)], axis=0))
    vdirs_full = jnp.asarray(
        rng.standard_normal((R, 3)).astype(np.float32))
    vdirs_full = vdirs_full / jnp.linalg.norm(vdirs_full, axis=1,
                                              keepdims=True)
    rgba0 = jnp.zeros((R, 4), jnp.float32)
    n_h_j = jnp.int32(n_h)
    outc = jnp.asarray(rng.random((R, 4)).astype(np.float32))

    def _common(sbuf):
        body = sbuf[:cap_h]
        recs_h, orig_h = body[:, :-1], body[:, -1]
        live = (jnp.arange(cap_h, dtype=jnp.int32) < n_h_j)
        vd = jnp.take(vdirs_full, jnp.clip(orig_h, 0, R - 1), axis=0)
        return recs_h, orig_h, live, vd

    @jax.jit
    def v_gather16(dtree, sbuf):
        recs_h, *_ = _common(sbuf)
        lf, _ = RR._recs_split(recs_h, spp)
        vals = jnp.take(dtree.data, lf.reshape(-1), axis=0)
        return jnp.sum(vals[::97, 0].astype(jnp.float32))

    @jax.jit
    def v_gather32(dtree, sbuf):
        recs_h, *_ = _common(sbuf)
        lf, _ = RR._recs_split(recs_h, spp)
        vals = jnp.take(dtree.data, lf.reshape(-1), axis=0).astype(
            jnp.float32)
        return jnp.sum(vals[::97, 0])

    @jax.jit
    def v_rows(dtree, sbuf):
        recs_h, _, live, vd = _common(sbuf)
        rows = RR._shade_rows(dtree, vd, recs_h, live.astype(jnp.float32),
                              opt, spp)
        return jnp.sum(rows[::97])

    def _rows_variant(dtree, recs_h, live, vd, *, f16in=False,
                      bloop=False, sigmoid=True):
        M = recs_h.shape[0]
        lf, ct = RR._recs_split(recs_h, spp)
        w = jnp.where(ct > 0, ct, 0.0) * live.astype(jnp.float32)[:, None]
        alpha = jnp.sum(w, axis=1) / spp
        raw = jnp.take(dtree.data, lf.reshape(-1), axis=0)
        if not f16in:
            raw = raw.astype(jnp.float32)
        vals = raw.reshape(M, spp, dtree.data_dim)
        basis = RR._eval_masked_basis(dtree, vd, opt)
        if bloop:
            acc = jnp.zeros((M, spp, 3), jnp.float32)
            for b in range(bd):
                cb = vals[..., b::bd][..., :3].astype(jnp.float32)
                acc = acc + cb * basis[:, None, b:b + 1]
            logits = acc
        else:
            coeffs = vals[..., :3 * bd].reshape(M, spp, 3, bd)
            logits = jnp.einsum("mscb,mb->msc", coeffs, basis,
                                precision=jax.lax.Precision.HIGHEST)
        rgb_per_leaf = jax.nn.sigmoid(logits) if sigmoid else logits
        rgb = jnp.einsum("msc,ms->mc", rgb_per_leaf, w,
                         precision=jax.lax.Precision.HIGHEST) / spp
        return jnp.concatenate([rgb, alpha[:, None]], axis=1)

    def make_rows(**kw):
        @jax.jit
        def f(dtree, sbuf):
            recs_h, _, live, vd = _common(sbuf)
            return jnp.sum(_rows_variant(dtree, recs_h, live, vd,
                                         **kw)[::97])
        return f

    @jax.jit
    def v_sbuf(dtree, sbuf, rgba0):
        rgba = RR._shade_sbuf(dtree, vdirs_full, sbuf, n_h_j, rgba0,
                              opt, spp, cap_h)
        return jnp.sum(rgba[::97])

    @jax.jit
    def v_sbuf_noscat(dtree, sbuf):
        recs_h, orig_h, live, vd = _common(sbuf)
        live = live & (orig_h < R) & (orig_h >= 0)
        rows = RR._shade_rows(dtree, vd, recs_h, live.astype(jnp.float32),
                              opt, spp)
        return jnp.sum(rows[::97])

    @jax.jit
    def v_comp_nhwc(outc):
        img, oc = RR.composite(outc, W, H, 1.0)
        aux_nhwc = RR.aux_from_composite(oc, W, H, "nhwc")
        return jnp.sum(img[::53, ::47]) + jnp.sum(aux_nhwc[::53, ::47])

    timeit(v_gather16, dt, sbuf, label="gather f16 [cap_h*spp, 29]")
    timeit(v_gather32, dt, sbuf, label="gather + astype f32")
    timeit(v_rows, dt, sbuf, label="production _shade_rows")
    t_f16 = timeit(make_rows(f16in=True), dt, sbuf,
                   label="rows, einsum fed f16 gather (no pre-astype)")
    t_bloop = timeit(make_rows(bloop=True), dt, sbuf,
                     label="rows, hand-unrolled basis FMA loop")
    timeit(make_rows(bloop=True, f16in=True), dt, sbuf,
           label="rows, FMA loop + f16 in")
    timeit(make_rows(sigmoid=False), dt, sbuf,
           label="rows, sigmoid -> identity")
    timeit(v_sbuf, dt, sbuf, rgba0, label="production _shade_sbuf")
    timeit(v_sbuf_noscat, dt, sbuf, label="sbuf minus final scatter")
    timeit(v_comp_nhwc, outc, label="composite + aux nhwc (denoise feed)")

    # exactness: candidate rewrites vs production
    a = float(v_rows(dt, sbuf))
    for kw, nm in (({"f16in": True}, "f16in"), ({"bloop": True}, "bloop"),
                   ({"bloop": True, "f16in": True}, "bloop+f16in")):
        b = float(make_rows(**kw)(dt, sbuf))
        rel = abs(a - b) / max(abs(a), 1e-9)
        print(f"  checksum {nm}: {b:.6f} vs {a:.6f} (rel {rel:.2e})",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
