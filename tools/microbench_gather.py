"""TPU microbenchmarks that drive the march-v2 design.

Measures, on the real chip:
  A. XLA serial dependent-gather cost vs (n_indices, row_width) -- the
     march's per-round cost model (PERF.md "Measured machine
     characteristics").
  B. Pallas per-row async-copy (DMA) issue cost from HBM with K copies in
     flight -- viability of a DMA-pipelined gather march.
  C. Pallas in-kernel VMEM table gather (jnp.take lowering) -- viability
     of a VMEM-resident traversal table.
  D. One-hot MXU gather for small tables.

Run: nohup python tools/microbench_gather.py > /tmp/microbench.log 2>&1 &
"""

import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def sync(x):
    return float(jnp.sum(x[::97]))


def timeit(fn, *args, reps=5):
    sync(fn(*args).reshape(-1))  # compile + drain
    sync(fn(*args).reshape(-1))  # warm
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out.reshape(-1))
    return (time.time() - t0) / reps


# ---------------------------------------------------------------------------
# A. XLA serial dependent gathers
# ---------------------------------------------------------------------------

def bench_xla_serial_gather():
    print("== A. XLA serial dependent gather ==", flush=True)
    S = 1 << 22  # 4M rows

    @functools.partial(jax.jit, static_argnames=("steps", "width"))
    def chain(table, idx0, *, steps: int, width: int):
        def body(i, idx):
            row = jnp.take(table, idx, axis=0)
            return (idx + row[:, 0]) & (S - 1)
        return jax.lax.fori_loop(0, steps, body, idx0)

    rng = np.random.default_rng(0)
    for width_i32 in (2, 16, 128, 256, 512, 1024):
        table = jnp.asarray(
            rng.integers(1, 1000, (S, width_i32), dtype=np.int32))
        for n_idx in (8192, 32768, 131072, 655360):
            idx0 = jnp.asarray(
                rng.integers(0, S, (n_idx,), dtype=np.int32))
            reps = 10 if n_idx <= 131072 else 4
            t8 = timeit(functools.partial(chain, steps=8, width=width_i32),
                        table, idx0, reps=reps)
            t72 = timeit(functools.partial(chain, steps=72, width=width_i32),
                         table, idx0, reps=reps)
            per_round = (t72 - t8) / 64
            print(f"  rows={width_i32*4:5d}B n_idx={n_idx:6d}: "
                  f"{per_round*1e3:7.3f} ms/round "
                  f"({n_idx/per_round/1e6:7.1f} M rows/s, "
                  f"{n_idx*width_i32*4/per_round/2**30:6.1f} GiB/s)",
                  flush=True)
        del table


# ---------------------------------------------------------------------------
# B. Pallas per-row DMA gather
# ---------------------------------------------------------------------------

def bench_pallas_dma():
    print("== B. Pallas per-row DMA gather from HBM ==", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = 1 << 22

    def make(n_idx, width_i32, nbuf, rounds):
        def kernel(idx_ref, table_ref, out_ref, scratch, sems):
            def round_body(r, _):
                def get_dma(slot, i):
                    return pltpu.make_async_copy(
                        table_ref.at[idx_ref[i]], scratch.at[slot],
                        sems.at[slot])

                for i in range(min(nbuf, n_idx)):
                    get_dma(i, i).start()

                def body(i, acc):
                    slot = jax.lax.rem(i, nbuf)
                    get_dma(slot, i).wait()
                    acc = acc + scratch[slot, 0]
                    nxt = i + nbuf

                    @pl.when(nxt < n_idx)
                    def _():
                        get_dma(slot, nxt).start()
                    return acc

                return jax.lax.fori_loop(0, n_idx, body, _)

            out_ref[0, 0] = jax.lax.fori_loop(0, rounds, round_body,
                                              jnp.int32(0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((nbuf, width_i32), jnp.int32),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )

    rng = np.random.default_rng(0)
    for width_i32 in (2, 128):
        table = jnp.asarray(
            rng.integers(1, 1000, (S, width_i32), dtype=np.int32))
        for n_idx in (1024, 8192):
            idx = jnp.asarray(rng.integers(0, S, (n_idx,), dtype=np.int32))
            for nbuf in (8, 32):
                try:
                    fn = jax.jit(make(n_idx, width_i32, nbuf, 4))
                    t = timeit(fn, idx, table) / 4
                    print(f"  rows={width_i32*4:5d}B n={n_idx:5d} "
                          f"nbuf={nbuf:3d}: {t*1e3:8.3f} ms/round "
                          f"({t/n_idx*1e9:7.1f} ns/row)", flush=True)
                except Exception as e:
                    print(f"  rows={width_i32*4}B n={n_idx} nbuf={nbuf}: "
                          f"FAIL {type(e).__name__}: {str(e)[:200]}",
                          flush=True)
        del table


# ---------------------------------------------------------------------------
# C. Pallas in-kernel VMEM gather
# ---------------------------------------------------------------------------

def bench_pallas_vmem_gather():
    print("== C. Pallas VMEM-table gather (jnp.take in kernel) ==",
          flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    for S, n_idx in ((1 << 14, 8192), (1 << 18, 8192), (1 << 20, 8192),
                     (1 << 18, 131072)):
        table = jnp.asarray(rng.integers(1, 1000, (S,), dtype=np.int32))
        idx0 = jnp.asarray(rng.integers(0, S, (n_idx,), dtype=np.int32))
        rounds = 16

        def kernel(idx_ref, table_ref, out_ref):
            def body(r, idx):
                v = jnp.take(table_ref[:], idx, axis=0)
                return (idx + v) & (S - 1)
            out_ref[:] = jax.lax.fori_loop(0, rounds, body, idx_ref[:])

        try:
            fn = jax.jit(pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n_idx,), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ))
            t = timeit(fn, idx0, table) / rounds
            print(f"  S={S:8d} ({S*4/2**20:5.1f}MB) n={n_idx:6d}: "
                  f"{t*1e3:8.4f} ms/round ({n_idx/t/1e6:8.1f} M/s)",
                  flush=True)
        except Exception as e:
            print(f"  S={S} n={n_idx}: FAIL {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


# ---------------------------------------------------------------------------
# D. one-hot MXU gather
# ---------------------------------------------------------------------------

def bench_onehot_gather():
    print("== D. one-hot MXU gather ==", flush=True)
    rng = np.random.default_rng(0)
    for S, n_idx, W in ((4096, 65536, 8), (16384, 65536, 8)):
        table = jnp.asarray(rng.standard_normal((S, W)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, S, (n_idx,), dtype=np.int32))

        @jax.jit
        def fn(table, idx):
            oh = jax.nn.one_hot(idx, S, dtype=jnp.bfloat16)
            return jnp.dot(oh, table.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        t = timeit(fn, table, idx)
        print(f"  S={S:6d} n={n_idx:6d} W={W}: {t*1e3:8.3f} ms "
              f"({n_idx/t/1e6:8.1f} M rows/s)", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        bench_xla_serial_gather()
    if which in ("all", "b"):
        bench_pallas_dma()
    if which in ("all", "c"):
        bench_pallas_vmem_gather()
    if which in ("all", "d"):
        bench_onehot_gather()
    print("DONE", flush=True)
