"""Round-4: A/B the f16-pair-packed data layout in the REAL shade.

upload_tree now pair-packs f16 data rows into f32 lanes
(ops/traversal.py take_data_rows); gather2 measured the packed gather
9% cheaper standalone.  This times the production _shade_sbuf on the
bench-realistic synthetic side buffer (same harness as
tools/round4_shade.py: cap_h=R/5, 68.4k live rows, ~4.8 slots/row)
against a control tree whose data is re-expanded to the raw [M, 28]
f16 layout on device -- and the bare paired-vs-raw gather.

Run: nohup python tools/round4_shade2.py > /tmp/r4/shade2.log 2>&1 &
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
    return float(jnp.sum(jnp.ravel(x)[::9973].astype(jnp.float32)))


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
    from rt_octree_tpu.ops.traversal import take_data_rows, upload_tree
    from rt_octree_tpu.render import renderer as RR

    print(f"devices: {jax.devices()}", flush=True)
    tree = n3tree.load(os.path.join(ROOT, ".bench_cache",
                                    "shell_d9_sh9.npz"))
    dt = upload_tree(tree, lut_levels=9)
    assert dt.data_paired, "expected the pair-packed upload"
    # control: raw f16 layout rebuilt on device
    raw = jax.jit(lambda d: jax.lax.bitcast_convert_type(
        d, jnp.float16).reshape(d.shape[0], -1)[:, :dt.data_dim])(dt.data)
    dt_raw = dt.replace(data=raw, data_paired=False)

    W = H = 800
    R = W * H
    spp = 6
    cap_h = R // 5
    n_h = 68400
    opt = RR.FrozenOptions.from_options(RenderOptions(
        spp=spp, denoise=False, step_size=1e-4, sigma_thresh=1e-2,
        background_brightness=1.0))

    n_data = int(dt.data.shape[0])
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

    @jax.jit
    def v_gather(dtree, sbuf):
        recs = sbuf[:, :-1]
        leafs, _ = RR._recs_split(recs, spp)
        vals = take_data_rows(dtree, leafs.reshape(-1))
        return jnp.sum(vals[::97, 0])

    @jax.jit
    def v_sbuf(dtree, sbuf, vdirs_full, n_h_j, rgba0):
        return RR._shade_sbuf(dtree, vdirs_full, sbuf, n_h_j, rgba0,
                              opt, spp, cap_h)

    a = v_sbuf(dt, sbuf, vdirs_full, n_h_j, rgba0)
    b = v_sbuf(dt_raw, sbuf, vdirs_full, n_h_j, rgba0)
    print(f"  paired-vs-raw rgba checksum: {sync(a):.4f} vs "
          f"{sync(b):.4f}", flush=True)
    timeit(v_gather, dt_raw, sbuf, label="data gather raw f16 x28")
    timeit(v_gather, dt, sbuf, label="data gather PAIRED f32 x14")
    timeit(v_sbuf, dt_raw, sbuf, vdirs_full, n_h_j, rgba0,
           label="_shade_sbuf raw f16 x28")
    timeit(v_sbuf, dt, sbuf, vdirs_full, n_h_j, rgba0,
           label="_shade_sbuf PAIRED f32 x14")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
