"""Round-4: what makes the shade data gather 27 ns/row?

tools/round4_shade.py measured the real [768k] gather of 58B f16 rows
at ~27 ns/row where the roofline microbench said 6.1 -- but the
microbench used a bfloat16 table of 1M rows while tree.data is float16
with ~13M rows.  This discriminates dtype vs table-size vs index
locality:

  rows x dtypes:  f16 / bf16 / i16(bitcast) / f32(116B)
  table sizes:    1M / 13M rows
  index pattern:  uniform-random / sorted / clustered (real marches
                  gather spatially-local leaves)

Run: nohup python tools/round4_gather.py > /tmp/r4/gather.log 2>&1 &
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

WIDTH = 768_000
COLS = 29


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[::9973].astype(jnp.float32)))


def timeit(fn, *args, reps=8, label=""):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    ns = dt / WIDTH * 1e9
    print(f"  {label:46s} {dt*1e3:8.2f} ms  {ns:6.2f} ns/row", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def g(table, idx):
        rows = jnp.take(table, idx, axis=0)
        return jnp.sum(rows.astype(jnp.float32), axis=1)

    @jax.jit
    def g32(table, idx):
        rows = jnp.take(table, idx, axis=0).astype(jnp.float32)
        return jnp.sum(rows, axis=1)

    for n_rows in (1 << 20, 13_000_000):
        base = jax.random.normal(key, (n_rows, COLS), jnp.float32)
        idx_u = jax.random.randint(key, (WIDTH,), 0, n_rows)
        idx_s = jnp.sort(idx_u)
        # clustered: ~120k distinct cluster centers, 6 nearby each
        cent = jax.random.randint(key, (WIDTH // 6,), 0, n_rows - 8)
        off = jax.random.randint(jax.random.PRNGKey(1), (WIDTH // 6, 6),
                                 0, 8)
        idx_c = (cent[:, None] + off).reshape(-1)
        for dname, dt_ in (("f16", jnp.float16), ("bf16", jnp.bfloat16),
                           ("f32", jnp.float32)):
            table = base.astype(dt_)
            timeit(g, table, idx_u,
                   label=f"{n_rows//1_000_000}M rows {dname} uniform")
            if dname == "f16":
                timeit(g32, table, idx_u,
                       label=f"{n_rows//1_000_000}M rows {dname}->f32 in-g")
                timeit(g, table, idx_s,
                       label=f"{n_rows//1_000_000}M rows {dname} sorted")
                timeit(g, table, idx_c,
                       label=f"{n_rows//1_000_000}M rows {dname} clustered")
        # i16 view of the f16 table (same bits, integer dtype)
        tab_i = jax.lax.bitcast_convert_type(base.astype(jnp.float16),
                                             jnp.int16)

        @jax.jit
        def gi(table, idx):
            rows = jnp.take(table, idx, axis=0)
            f16 = jax.lax.bitcast_convert_type(rows, jnp.float16)
            return jnp.sum(f16.astype(jnp.float32), axis=1)

        timeit(gi, tab_i, idx_u,
               label=f"{n_rows//1_000_000}M rows i16-bitcast uniform")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
