"""Roofline for the shipped shell frame (round 4, VERDICT item 1).

Derives the machine-model floor of the production march NUMERICALLY and
prints it next to staged measurements of the same stages:

1. re-measures the gather wall TODAY (dependent-gather rows/s at the
   shipped row widths: 8B thin LUT rows, 520B brick rows, 92B compaction
   bundle rows, 58B shade data rows);
2. computes the STATIC gather-row and round counts of the shipped
   schedule (stage caps are compile-time constants; only the drain's
   round count is dynamic -- measured here by alive-count bisection);
3. runs the tune_schedule3 stage-at-a-time protocol on the shipped
   schedule and prints, per stage: static rows, modeled floor
   (rows x measured wall + rounds x per-round overhead), measured ms.

Run: nohup python tools/roofline.py > /tmp/roofline.log 2>&1 &
"""

import functools
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


def timeit(fn, *args, reps=8, label="", quiet=False):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dtm = (time.time() - t0) / reps
    if not quiet:
        print(f"  {label:56s} {dtm*1e3:9.2f} ms", flush=True)
    return dtm


def measure_gather_walls():
    """Dependent-gather rows/s at the shipped row widths."""
    print("== gather wall today ==", flush=True)
    out = {}
    key = jax.random.PRNGKey(0)
    for label, rowbytes, width in (("thin-8B", 8, 640_000),
                                   ("brick-520B", 520, 110_000),
                                   ("bundle-92B", 92, 266_000),
                                   ("shade-58B", 58, 640_000)):
        cols = rowbytes // 4
        table = jax.random.normal(key, (1 << 20, cols), jnp.float32)
        if rowbytes in (58, 92):  # f16-ish rows: match the real dtype mix
            table = table.astype(jnp.bfloat16)
        idx0 = jax.random.randint(key, (width,), 0, 1 << 20)

        @jax.jit
        def chain(table, idx, n=8):
            acc = jnp.zeros((idx.shape[0],), jnp.float32)
            for _ in range(n):
                rows = jnp.take(table, idx, axis=0)
                acc = acc + rows[:, 0].astype(jnp.float32)
                # dependent next index (forces serialization like the march)
                idx = (idx + rows[:, -1].astype(jnp.int32) % 7 + 1) % (1 << 20)
            return acc + idx.astype(jnp.float32)

        dtm = timeit(chain, table, idx0, quiet=True)
        ns_row = dtm / (8 * width) * 1e9
        out[label] = ns_row
        print(f"  {label:12s} width {width:7d}: {ns_row:6.2f} ns/row "
              f"({1e3/ns_row:.0f}M rows/s)", flush=True)
    # per-round dispatch overhead: same chain at tiny width
    table = jax.random.normal(key, (1 << 20, 2), jnp.float32)
    idx0 = jax.random.randint(key, (1024,), 0, 1 << 20)

    @jax.jit
    def chain_tiny(table, idx):
        acc = jnp.zeros((idx.shape[0],), jnp.float32)
        for _ in range(64):
            rows = jnp.take(table, idx, axis=0)
            acc = acc + rows[:, 0]
            idx = (idx + rows[:, 1].astype(jnp.int32) % 7 + 1) % (1 << 20)
        return acc + idx.astype(jnp.float32)

    dtm = timeit(chain_tiny, table, idx0, quiet=True)
    out["round-overhead"] = dtm / 64 * 1e3  # ms per dependent round
    print(f"  per-round overhead (1k width, 64 serial): "
          f"{out['round-overhead']*1e3:.0f} us/round", flush=True)
    return out


def main():
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import n3tree
    from rt_octree_tpu.ops.compaction import fast_nonzero
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render import renderer as RR
    from rt_octree_tpu.utils.rng import pcg32_uniforms_range

    print(f"devices: {jax.devices()}", flush=True)
    walls = measure_gather_walls()

    tree = n3tree.load(os.path.join(ROOT, ".bench_cache",
                                    "shell_d9_sh9.npz"))
    dt = upload_tree(tree, lut_levels=9)
    W = H = 800
    spp = 6
    R = W * H
    cam = Camera(width=W, height=H)
    opt = RR.FrozenOptions.from_options(
        RenderOptions(spp=spp, denoise=False))
    transform = jnp.asarray(cam.transform, jnp.float32)
    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)

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
                 RR._recs_init(dt, R, spp))
        return RR._pack_bundle(consts, state)

    bundle0 = setup(transform, hi, lo)
    bundle0.block_until_ready()

    @functools.partial(jax.jit, static_argnames=("rounds", "kind", "t_in"))
    def run_stage(dt, bundle, *, rounds: int, kind: str, t_in: int = 4):
        consts, state = RR._unpack_bundle(bundle, spp)

        def body(i, st):
            if kind == "brick":
                return RR._march_body_brick(dt, opt, spp, consts, st,
                                            t_in=t_in)
            return RR._march_body(dt, opt, spp, consts, st)

        st = jax.lax.fori_loop(0, rounds, body, state)
        return RR._pack_bundle(consts, st)

    @functools.partial(jax.jit, static_argnames=("cap",))
    def compact_stage(bundle, *, cap: int):
        consts, state = RR._unpack_bundle(bundle, spp)
        Rcur = state[0].shape[0]
        idx = fast_nonzero(state[0], cap, Rcur)
        row = jnp.take(bundle, idx, axis=0, mode="fill", fill_value=0)
        c_consts, c_state = RR._unpack_bundle(row, spp)
        c_state = (c_state[0] & (idx < Rcur),) + c_state[1:]
        return RR._pack_bundle(c_consts, c_state)

    def alive(bundle):
        return int(jnp.sum(RR._unpack_bundle(bundle, spp)[1][0]))

    # the shipped DEFAULT_SCHEDULE in rounds (t_in=4 mid, drain measured)
    SCHED = ((2, 1.0, "thin", 4), (4, 2.4, "thin", 4),
             (10, 3.5, "thin", 4), (6, 5.8, "brick", 4),
             (8, 10.5, "brick", 4), (10, 22.0, "brick", 4),
             (12, 40.0, "brick", 4), (None, 64.0, "brick", 4))

    NS = {"thin": walls["thin-8B"], "brick": walls["brick-520B"]}
    OVH = walls["round-overhead"]  # ms/round
    CNS = walls["bundle-92B"]

    bundle = bundle0
    rows_model = {"thin": 0.0, "brick": 0.0, "compact": 0.0}
    t_meas_total = 0.0
    t_model_total = 0.0
    print("== staged march (shipped schedule) ==", flush=True)
    for si, (rounds, frac, kind, t_in) in enumerate(SCHED):
        cap = max(int(R // frac), 1)
        n_active = alive(bundle)
        if cap < bundle.shape[0] and n_active <= cap:
            t = timeit(functools.partial(compact_stage, cap=cap), bundle,
                       label=f"compact {bundle.shape[0]} -> {cap}")
            model = (bundle.shape[0] + cap) * CNS * 1e-6  # ms
            print(f"      model {model:8.2f} ms "
                  f"({bundle.shape[0]}+{cap} rows x {CNS:.1f} ns)",
                  flush=True)
            rows_model["compact"] += bundle.shape[0] + cap
            t_meas_total += t * 1e3
            t_model_total += model
            bundle = compact_stage(bundle, cap=cap)
            bundle.block_until_ready()
        if rounds is None:
            # drain: count rounds to empty in chunks
            pre = bundle
            drained_rounds = 0
            while alive(bundle) > 0 and drained_rounds < 400:
                bundle = run_stage(dt, bundle, rounds=10, kind=kind,
                                   t_in=t_in)
                drained_rounds += 10
            print(f"  drain measured: ~{drained_rounds} rounds "
                  f"(t_in={t_in}) @{bundle.shape[0]}", flush=True)
            t = timeit(functools.partial(
                run_stage, rounds=drained_rounds, kind=kind, t_in=t_in),
                dt, pre,
                label=f"drain {kind} x{drained_rounds}r @{bundle.shape[0]}")
            rows = drained_rounds * bundle.shape[0]
            sub = 2.1 if t_in == 12 else 1.0  # t_in VPU sub-step factor
            model = rows * NS[kind] * sub * 1e-6 + drained_rounds * OVH
            rows_model["brick"] += rows
            t_meas_total += t * 1e3
            t_model_total += model
            print(f"      model {model:8.2f} ms ({rows/1e3:.0f}k rows x "
                  f"{NS[kind]*sub:.1f} ns + {drained_rounds} x "
                  f"{OVH*1e3:.0f} us)", flush=True)
            break
        t = timeit(functools.partial(run_stage, rounds=rounds, kind=kind,
                                     t_in=t_in),
                   dt, bundle,
                   label=f"{kind} x{rounds}r @{bundle.shape[0]}")
        rows = rounds * bundle.shape[0]
        model = rows * NS[kind] * 1e-6 + rounds * OVH
        rows_model[kind] += rows
        t_meas_total += t * 1e3
        t_model_total += model
        print(f"      model {model:8.2f} ms ({rows/1e3:.0f}k rows x "
              f"{NS[kind]:.1f} ns + {rounds} x {OVH*1e3:.0f} us)",
              flush=True)
        bundle = run_stage(dt, bundle, rounds=rounds, kind=kind, t_in=t_in)
        bundle.block_until_ready()

    print("== totals ==", flush=True)
    print(f"  static rows: thin {rows_model['thin']/1e6:.2f}M  "
          f"brick {rows_model['brick']/1e6:.2f}M  "
          f"compact {rows_model['compact']/1e6:.2f}M", flush=True)
    print(f"  march model floor {t_model_total:.1f} ms  "
          f"staged measured {t_meas_total:.1f} ms  "
          f"ratio {t_meas_total/max(t_model_total,1e-9):.2f}", flush=True)

    # shade floor: rows = hit_cap * spp at the shade-58B wall
    hit_cap = R // 5  # bench-probed shade_cap_div ~5
    shade_rows = hit_cap * spp
    print(f"  shade gather floor: {shade_rows/1e6:.2f}M rows x "
          f"{walls['shade-58B']:.1f} ns = "
          f"{shade_rows*walls['shade-58B']*1e-6:.1f} ms "
          f"(measured final-shade piece: see exp15)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
