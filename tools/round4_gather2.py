"""Round-4 follow-up: can the shade data gather beat ~30 ns/row?

round4_gather.py pinned the wall: 16 ns/row at a 1M-row table vs 30 at
13M, insensitive to index order and to f16-vs-bf16.  This measures the
remaining unknowns that could still move the shipped [640k, 28] f16
gather (17.5 ms of the 33.4 ms shade piece):

  cliff      table rows 1M/2M/4M/8M/13M (where does 16 -> 30 happen?)
  lanes      28 f16 cols vs the same 56 bytes as 14 f32 (bitcast pairs:
             if the cost is per-LANE shuffle work, halving lanes halves
             the gather)
  pad32      28 vs 32 f16 cols (64B-aligned rows)
  width      640k vs 326k rows (linearity check at the 13M table)

Run: nohup python tools/round4_gather2.py > /tmp/r4/gather2.log 2>&1 &
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

WIDTH = 640_000
COLS = 28


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[::9973].astype(jnp.float32)))


def timeit(fn, *args, width=WIDTH, reps=8, label=""):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    ns = dt / width * 1e9
    print(f"  {label:46s} {dt*1e3:8.2f} ms  {ns:6.2f} ns/row", flush=True)
    return dt


@jax.jit
def g16(table, idx):
    rows = jnp.take(table, idx, axis=0)
    return jnp.sum(rows.astype(jnp.float32), axis=1)


@jax.jit
def g_pair(table_f32, idx):
    """Gather 14 f32 lanes (the same 56 bytes), decode back to 28 f16."""
    rows = jnp.take(table_f32, idx, axis=0)
    f16 = jax.lax.bitcast_convert_type(rows, jnp.float16)  # [w, 14, 2]
    return jnp.sum(f16.reshape(rows.shape[0], -1).astype(jnp.float32),
                   axis=1)


@jax.jit
def g_quad(table_i32x2, idx):
    """Gather 7 float32x2-packed lanes... kept simple: 7 i32 cols of a
    [N, 7, 2]->[N, 14] f32 re-layout is identical to g_pair; instead
    test 8 f32 cols (32B rows, half the data) for a pure-lane-count
    scaling point."""
    rows = jnp.take(table_i32x2, idx, axis=0)
    return jnp.sum(rows, axis=1)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)

    print("== cliff: 28-col f16 uniform gather vs table rows ==",
          flush=True)
    for n_rows in (1 << 20, 2 << 20, 4 << 20, 8 << 20, 13_000_000):
        table = jax.random.normal(
            key, (n_rows, COLS), jnp.float32).astype(jnp.float16)
        idx = jax.random.randint(key, (WIDTH,), 0, n_rows)
        timeit(g16, table, idx, label=f"{n_rows/1e6:.0f}M rows f16x28")
        del table

    print("== lane count at the 13M table ==", flush=True)
    n_rows = 13_000_000
    base = jax.random.normal(key, (n_rows, COLS), jnp.float32)
    idx = jax.random.randint(key, (WIDTH,), 0, n_rows)
    t16 = base.astype(jnp.float16)
    timeit(g16, t16, idx, label="13M f16 x28 lanes (56B)")
    tpair = jax.lax.bitcast_convert_type(
        t16.reshape(n_rows, COLS // 2, 2), jnp.float32)
    # checksum equality of the decode path
    a = g16(t16, idx[:1024])
    b = g_pair(tpair, idx[:1024])
    print(f"  pair-decode checksum: {float(jnp.sum(a)):.4f} vs "
          f"{float(jnp.sum(b)):.4f}", flush=True)
    timeit(g_pair, tpair, idx, label="13M f32-bitcast x14 lanes (56B)")
    t32_8 = base[:, :8]
    timeit(g_quad, t32_8, idx, label="13M f32 x8 lanes (32B)")
    t16_pad = jnp.pad(t16, ((0, 0), (0, 4)))
    timeit(g16, t16_pad, idx, label="13M f16 x32 lanes (64B)")
    del t16_pad

    print("== width linearity at the 13M table ==", flush=True)
    timeit(g16, t16, idx[:326_000], width=326_000,
           label="13M f16 x28, width 326k")
    timeit(g_pair, tpair, idx[:326_000], width=326_000,
           label="13M f32x14, width 326k")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
