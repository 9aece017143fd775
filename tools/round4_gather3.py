"""Round-4: the LUT gather is the thin round's cost (8.3 ms/round at
640k = 13 ns/row from the 134M-row depth-9 LUT -- tools/round4_thin.py,
vs the roofline chain's 5.24).  Measures whether the LUT row can be
made cheaper:

  8B vs 4B rows at the 134M-row table (would a packed single-lane
  LUT pay?), width dependence, and a dependent-chain replica of the
  roofline protocol to explain the 5.24-vs-13 discrepancy (the chain
  derives the next index from the row's LOW BITS -> indices collapse
  to the table's head -> page-cache friendly; the march's indices
  span the full table).

Run: nohup python tools/round4_gather3.py > /tmp/r4/gather3.log 2>&1 &
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

N_ROWS = 512 ** 3  # the depth-9 LUT
ROUNDS = 8


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[::9973].astype(jnp.float32)))


def timeit(fn, *args, width, reps=8, label=""):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    ns = dt / (width * ROUNDS) * 1e9
    print(f"  {label:52s} {dt*1e3:8.2f} ms  {ns:6.2f} ns/row",
          flush=True)
    return dt


# tables are jit ARGUMENTS -- closing over them bakes gigabytes into
# the uploaded HLO (the remote_compile tunnel chokes; cf. round4_thin)
@jax.jit
def chain2(table, idx0):
    """Serial chain of ROUNDS gathers, next index = f(row) spanning the
    FULL table (multiplicative hash of the row value + position)."""
    def body(i, idx):
        row = jnp.take(table, idx, axis=0)
        v = row if row.ndim == 1 else row[:, 0]
        return (idx * jnp.int32(1664525) + v
                + jnp.int32(1013904223)) % jnp.int32(N_ROWS)
    return jax.lax.fori_loop(0, ROUNDS, body, idx0)


@jax.jit
def chain_lowbits(table, idx0):
    """The roofline protocol's flaw candidate: next index from the
    row's low bits -> indices collapse near the table head."""
    def body(i, idx):
        row = jnp.take(table, idx, axis=0)
        v = row if row.ndim == 1 else row[:, 0]
        return (idx + (v & 1)) % jnp.int32(N_ROWS)
    return jax.lax.fori_loop(0, ROUNDS, body, idx0)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    t8 = jax.random.randint(key, (N_ROWS, 2), 0, 1 << 30, jnp.int32)
    t4 = t8[:, 0]

    for width in (640_000, 266_000, 110_000):
        idx0 = jax.random.randint(key, (width,), 0, N_ROWS, jnp.int32)
        timeit(chain2, t8, idx0, width=width,
               label=f"134M x 8B rows, full-span chain, w={width//1000}k")
        timeit(chain2, t4, idx0, width=width,
               label=f"134M x 4B rows, full-span chain, w={width//1000}k")
    idx0 = jax.random.randint(key, (640_000,), 0, N_ROWS, jnp.int32)
    timeit(chain_lowbits, t8, idx0, width=640_000,
           label="134M x 8B rows, LOW-BITS chain (stationary idx)")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
