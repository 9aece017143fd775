"""rt-octree-tpu: TPU-native rebuild of RT-Octree (LumiOwO/RT-Octree).

Real-time PlenOctree volume rendering with batched regular tracking
(a stochastic fixed-sample-count free-flight estimator) and a GuidanceNet
kernel-prediction denoiser, re-designed for TPU: JAX/XLA for the compute
graph, Pallas for hot kernels, jax.sharding for multi-chip scaling.

Layer map (mirrors reference SURVEY.md section 1):
  io/        tree + pose + image IO            (ref: renderer/src/n3tree.cpp, main_headless.cpp)
  core/      camera, render options, oracle    (ref: src/camera.cpp, render_options.hpp)
  ops/       traversal, sampling, SH, filter   (ref: cuda/rt_core.cuh, denoiser/extension/filtering.cu)
  models/    GuidanceNet (Flax)                (ref: denoiser/network.py)
  render/    fused frame renderer              (ref: src/cuda/volrend.cu, denoiser.cpp)
  train/     denoiser training stack           (ref: denoiser/runner.py, dataset.py, metrics.py)
  parallel/  device-mesh sharding helpers      (no reference equivalent; TPU-native extension)
  apps/      CLI entry points                  (ref: main_headless.cpp, main_anim.cpp)
  utils/     RNG, timer, misc                  (ref: 3rdparty/pcg32.h, render_context.hpp Timer)
"""

__version__ = "0.1.0"
