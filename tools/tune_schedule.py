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

    # ---------- survivor curve with empty-space skip ----------
    @jax.jit
    def setup(transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
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
    print(f"  skip_cap={dt.skip_cap}", flush=True)

    @jax.jit
    def survivors(dt, bundle):
        consts, state = RR._unpack_bundle(bundle, spp)
        outs = []
        st = state
        for k in range(64):
            st = RR._march_body(dt, opt, spp, consts, st)
            outs.append(jnp.sum(st[0].astype(jnp.int32)))
        return jnp.stack(outs), RR._pack_bundle(consts, st)

    sv, bundle64 = survivors(dt, bundle0)
    sv = np.asarray(sv)
    print(f"  survivors w/skip rounds 1..64: {sv.tolist()}", flush=True)

    @functools.partial(jax.jit, static_argnames=("steps",))
    def drain_count(dt, bundle, *, steps):
        consts, state = RR._unpack_bundle(bundle, spp)

        def cond(sv_):
            i, st = sv_
            return (i < steps) & jnp.any(st[0])

        def body(sv_):
            i, st = sv_
            return i + 1, RR._march_body(dt, opt, spp, consts, st)

        i, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
        # extras distribution at the end: slots >= 1 with hits
        extras = jnp.sum((RR._recs_split(st[5], spp)[1][:, 1:] > 0).astype(jnp.int32))
        return jnp.stack([i, jnp.sum(st[0].astype(jnp.int32)), extras])

    out = np.asarray(drain_count(dt, bundle64, steps=4096))
    print(f"  after 64: drained in {64 + out[0]} total rounds, "
          f"alive={out[1]}, extra-slot hits={out[2]} "
          f"({out[2]/R:.3f}/ray)", flush=True)

    # thin round cost with skip at widths
    @functools.partial(jax.jit, static_argnames=("rounds", "rsub"))
    def march_n(dt, bundle, *, rounds: int, rsub: int):
        consts, state = RR._unpack_bundle(bundle[:rsub], spp)

        def body(i, st):
            return RR._march_body(dt, opt, spp, consts, st)

        st = jax.lax.fori_loop(0, rounds, body, state)
        return st[5]

    for rsub in (640000, 163840, 40960, 8192):
        a = timeit(functools.partial(march_n, rounds=2, rsub=rsub), dt,
                   bundle0, label=f"thin+skip 2 rounds @{rsub}")
        b = timeit(functools.partial(march_n, rounds=10, rsub=rsub), dt,
                   bundle0, label=f"thin+skip 10 rounds @{rsub}")
        print(f"    -> per round @{rsub}: {(b-a)/8*1e3:.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
