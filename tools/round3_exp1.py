"""Round-3 experiment 1 (run on TPU, background):

  A. Compaction pack-gather width regimes: is the 136B bundle row
     (34 i32 cols at spp=6) row-width-bound (the measured 47-58M rows/s
     anomaly for 64-136B rows), and would padding to 256/512B or
     slimming to ~96B pay?  Drives VERDICT round-3 item 1(b).
  B. Staged timing of the shipped schedule with the BATCHED brick body
     (one [R,t_in,spp] crossing pass instead of t_in sequential
     _step_update calls) -- compare against the PERF.md round-2 staged
     table (brick stages 19.0/13.8/10.8/13.9 + drain 31.6 ms).

Run: nohup python tools/round3_exp1.py > /tmp/r3exp1.log 2>&1 &
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
    sync(out)
    dt = (time.time() - t0) / reps
    print(f"  {label:56s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def bench_bundle_widths():
    print("== A. pack-gather width regimes (640k table, 266k/183k idx) ==",
          flush=True)
    rng = np.random.default_rng(0)
    S = 640_000

    @functools.partial(jax.jit, static_argnames=("cap",))
    def packgather(table, mask, *, cap: int):
        from rt_octree_tpu.ops.compaction import fast_nonzero
        idx = fast_nonzero(mask, cap, S)
        return jnp.take(table, idx, axis=0, mode="fill", fill_value=0)

    mask_np = np.zeros(S, bool)
    mask_np[rng.choice(S, 210_000, replace=False)] = True
    mask = jnp.asarray(mask_np)
    for cols in (16, 24, 34, 48, 64, 96, 128):
        table = jnp.asarray(
            rng.integers(0, 1000, (S, cols), dtype=np.int32))
        for cap in (266_666, 182_857):
            timeit(functools.partial(packgather, cap=cap), table, mask,
                   label=f"  pack {cols*4:4d}B rows -> cap {cap}")


def main():
    print(f"devices: {jax.devices()}", flush=True)
    bench_bundle_widths()
    print("== B. staged schedule with batched brick body ==", flush=True)
    from tools import tune_schedule3
    tune_schedule3.main()


if __name__ == "__main__":
    main()
