"""TPU microbenchmarks that drive the march-kernel design.

Measures (on the real chip through the axon tunnel):
  basic   - trivial pallas kernel compiles + runs
  vgather - per-lane VMEM gather (take_along_axis) inside pallas
  dma     - dynamic-index row DMA HBM->VMEM throughput inside pallas
  xgather - XLA gather: per-round cost vs index count and row width,
            for chains of dependent gathers (the march's structure)
  loop    - while_loop(any(active)) vs fori_loop round overhead

Usage: python tools/tpu_probe.py [probe ...]   (default: all)
Writes one line per measurement; safe to run under nohup and poll.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    # forced readback: block_until_ready is unreliable through the tunnel
    return float(jnp.sum(x.reshape(-1)[::997]))


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn(*args))
    return (time.perf_counter() - t0) / n


def probe_basic():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + 1.0

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    out = f(x)
    ok = bool(jnp.allclose(out, x * 2 + 1))
    print(f"[basic] pallas on {jax.devices()[0].device_kind}: ok={ok}",
          flush=True)


def probe_vgather():
    """Per-lane VMEM gather: out[i,l] = table[idx[i,l], l]."""
    T, R = 4096, 1024  # table rows, result rows

    def kernel(tab_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def f(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    tab = jnp.asarray(np.random.rand(T, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, T, (R, 128)), jnp.int32)
    try:
        out = f(tab, idx)
        ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
        ok = bool(np.allclose(np.asarray(out), ref))
        dt = timeit(f, tab, idx, n=10)
        print(f"[vgather] ok={ok} {R*128} elems in {dt*1e3:.3f} ms "
              f"-> {R*128/dt/1e6:.0f} M elems/s", flush=True)
    except Exception as e:
        print(f"[vgather] UNSUPPORTED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


def probe_vgather_loop():
    """Chained per-lane VMEM gathers (march-like dependency)."""
    T, R, K = 8192, 2048, 32

    def kernel(tab_ref, idx_ref, o_ref):
        def body(_, cur):
            g = jnp.take_along_axis(tab_ref[:], cur, axis=0)
            return (cur + g.astype(jnp.int32) + 1) % T
        out = jax.lax.fori_loop(0, K, body, idx_ref[:])
        o_ref[:] = out

    @jax.jit
    def f(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    tab = jnp.asarray(np.random.randint(0, 3, (T, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, T, (R, 128)), jnp.int32)
    try:
        dt = timeit(f, tab, idx, n=10)
        per_round = dt / K
        print(f"[vgather_loop] K={K} chained rounds of {R}x128: "
              f"{dt*1e3:.3f} ms total, {per_round*1e6:.1f} us/round, "
              f"{R*128*K/dt/1e6:.0f} M elems/s", flush=True)
    except Exception as e:
        print(f"[vgather_loop] UNSUPPORTED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


def probe_dma(n_rows=4096, width=128):
    """Dynamic-index row DMA HBM->VMEM, double buffered."""
    M = 1 << 20  # 1M rows x width f32

    def kernel(idx_ref, tab_hbm, o_ref):
        def body(scratch, sem):
            def get(slot, i):
                return pltpu.make_async_copy(
                    tab_hbm.at[idx_ref[i]], scratch.at[slot], sem.at[slot])
            get(0, 0).start()

            def loop(i, acc):
                slot = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)

                @pl.when(i + 1 < n_rows)
                def _():
                    get(nxt, i + 1).start()
                get(slot, i).wait()
                return acc + scratch[slot]

            acc = jax.lax.fori_loop(
                0, n_rows, loop, jnp.zeros((1, width), jnp.float32))
            o_ref[:] = acc

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, 1, width), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    @jax.jit
    def f(idx, tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, width), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tab)

    tab = jnp.asarray(np.random.rand(M, width), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, M, (n_rows,)), jnp.int32)
    try:
        dt = timeit(f, idx, tab, n=5)
        print(f"[dma] {n_rows} row-DMAs ({width*4}B rows, 2-buf): "
              f"{dt*1e3:.3f} ms -> {n_rows/dt/1e6:.2f} M rows/s, "
              f"{dt/n_rows*1e9:.0f} ns/row", flush=True)
    except Exception as e:
        print(f"[dma] UNSUPPORTED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def probe_xgather():
    """Dependent-gather chain cost vs index count / row width (jnp path,
    exactly the march's structure: scan of gathers)."""
    M = 1 << 20
    K = 16
    for n_idx in (1024, 16384, 131072, 655360):
        for width in (2, 16, 128):
            tab = jnp.asarray(
                np.random.randint(1, 5, (M, width)), jnp.int32)

            @jax.jit
            def f(idx, tab=tab, n_idx=n_idx):
                def body(cur, _):
                    row = jnp.take(tab, cur, axis=0)
                    nxt = (cur + row[:, 0] + 7) % M
                    return nxt, ()
                out, _ = jax.lax.scan(body, idx, None, length=K)
                return out

            idx = jnp.asarray(np.random.randint(0, M, (n_idx,)), jnp.int32)
            dt = timeit(f, idx, n=5)
            per_round = dt / K
            print(f"[xgather] n={n_idx:7d} width={width:3d} "
                  f"({width*4:4d}B): {per_round*1e3:7.3f} ms/round, "
                  f"{n_idx/per_round/1e6:7.1f} M rows/s", flush=True)


def probe_loop():
    """while_loop(any(alive)) vs scan: per-round overhead at small widths."""
    M = 1 << 20
    tab = jnp.asarray(np.random.randint(1, 5, (M, 2)), jnp.int32)
    K = 64
    for n_idx in (4096, 65536):
        idx0 = jnp.asarray(np.random.randint(0, M, (n_idx,)), jnp.int32)

        @jax.jit
        def f_while(idx):
            def cond(sv):
                step, cur = sv
                return (step < K) & jnp.any(cur >= 0)

            def body(sv):
                step, cur = sv
                row = jnp.take(tab, cur, axis=0)
                return step + 1, (cur + row[:, 0] + 7) % M

            _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), idx))
            return out

        @jax.jit
        def f_scan(idx):
            def body(cur, _):
                row = jnp.take(tab, cur, axis=0)
                return (cur + row[:, 0] + 7) % M, ()
            out, _ = jax.lax.scan(body, idx, None, length=K)
            return out

        dt_w = timeit(f_while, idx0, n=5)
        dt_s = timeit(f_scan, idx0, n=5)
        print(f"[loop] n={n_idx}: while={dt_w/K*1e3:.3f} ms/round, "
              f"scan={dt_s/K*1e3:.3f} ms/round", flush=True)


PROBES = {
    "basic": probe_basic,
    "vgather": probe_vgather,
    "vgather_loop": probe_vgather_loop,
    "dma": probe_dma,
    "xgather": probe_xgather,
    "loop": probe_loop,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}", flush=True)
    for name in names:
        t0 = time.time()
        try:
            PROBES[name]()
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:500]}",
                  flush=True)
        print(f"[{name}] done in {time.time()-t0:.1f}s", flush=True)
