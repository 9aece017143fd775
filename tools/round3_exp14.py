"""Round-3 exp14: shade-on-death measurement + dead-hit probe.

 A. Per-boundary dead-hit counts of DEFAULT_SCHEDULE on the bench shell
    scene at full res (sizes the dead_div cap divisors).
 B. Production frame timing through the new shade-on-death path
    (march + side-buffer shade fused, no denoise) vs the exp13 record
    (169.5-172.5 ms with the gather-merge + compacted-basis shade).

Run: nohup python tools/round3_exp14.py > /tmp/r3exp14.log 2>&1 &
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

    # ---- A: per-boundary dead-hit counts (stage-at-a-time, like the
    # tune_schedule3 protocol: each stage compiles once) ----
    @jax.jit
    def setup(dtree, transform, hi, lo):
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3
                                        ).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        consts, state = RR._init_march(dtree, dirs, cens, dst, opt)
        return RR._pack_bundle(consts, state)

    import functools

    @functools.partial(jax.jit, static_argnames=("steps", "brick", "t_in",
                                                  "cap"))
    def stage(dtree, pack, *, steps, brick, t_in, cap):
        consts, state = RR._unpack_bundle(pack, spp)
        st = RR._march_loop(dtree, opt, spp, consts, state, steps,
                            unroll=1, brick=brick, t_in=t_in,
                            early_exit=False)
        active = st[0]
        _, cnts = RR._recs_split(st[5], spp)
        dead_hit = (~active) & (cnts[:, 0] > 0)
        n_act = jnp.sum(active.astype(jnp.int32))
        n_dead = jnp.sum(dead_hit.astype(jnp.int32))
        idx = fast_nonzero(active, cap, active.shape[0])
        row = jnp.take(RR._pack_bundle(consts, st), idx, axis=0,
                       mode="fill", fill_value=0)
        c_consts, c_state = RR._unpack_bundle(row, spp)
        c_state = (c_state[0] & (idx < active.shape[0]),) + c_state[1:]
        return RR._pack_bundle(c_consts, c_state), n_act, n_dead

    pack = setup(dt, transform, hi, lo)
    print("boundary: entering-width  n_active  n_dead_hit  (dead_div to "
          "hold it = R/n_dead)", flush=True)
    total_dead = 0
    for i, (steps, frac, kind, t_in, dd) in enumerate(SCHED[:-1]):
        nxt = SCHED[i + 1]
        cap = max(int(R // nxt[1]), 1)
        pack, n_act, n_dead = stage(dt, pack, steps=steps,
                                    brick=kind == "brick", t_in=t_in,
                                    cap=cap)
        n_act, n_dead = int(n_act), int(n_dead)
        total_dead += n_dead
        div = R / max(n_dead, 1)
        print(f"  after stage {i} ({steps:3d} {kind:5s}): W={pack.shape[0]:7d}"
              f" act={n_act:7d} dead_hit={n_dead:6d} (div {div:8.1f})",
              flush=True)
    # drain remainder
    (steps, frac, kind, t_in, dd) = SCHED[-1]
    consts, state = RR._unpack_bundle(pack, spp)
    st = RR._march_loop(dt, opt, spp, consts, state, MAXS, unroll=2,
                        brick=kind == "brick", t_in=t_in)
    _, cnts = RR._recs_split(st[5], spp)
    n_fin = int(jnp.sum((cnts[:, 0] > 0).astype(jnp.int32)))
    print(f"  final block: W={pack.shape[0]} hit rows={n_fin}; "
          f"total deaths-with-hits={total_dead + n_fin}", flush=True)

    # ---- B: production frame ----
    @jax.jit
    def frame(dtree, transform, hi, lo):
        return RR._render_noisy(dtree, transform, hi, lo,
                                width=W, height=H, fx=cam.fx, fy=cam.fy,
                                opt=opt, n_chunks=1, max_steps=MAXS, inc=3,
                                schedule=SCHED, shade_cap_div=5)

    timeit(frame, dt, transform, hi, lo,
           label="full _render_noisy frame (shade-on-death)")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
