"""Multi-chip scaling via jax.sharding device meshes.

The reference is strictly single-GPU (SURVEY.md section 2.3): its only
parallelism is per-pixel SIMT within one kernel.  On TPU pods the natural
extensions are:

  * rendering: rays are embarrassingly parallel -> shard the pixel/ray
    axis across the whole mesh ("dp" x "sp" flattened); the octree is
    replicated (tens-to-hundreds of MB; fits HBM per chip).  XLA inserts
    the all-gather only at image assembly, riding ICI.
  * denoiser training: batch data-parallel over "dp" with spatial ("sp")
    sharding of the image height inside the conv/filter stack; XLA
    partitions the convolutions with halo exchanges and psums gradients.

Both paths are exercised on a virtual CPU mesh in tests and by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.guidance_net import GuidanceNet, GuidanceNetConfig
from ..ops.filtering import guided_filter_batch
from ..render.renderer import FrozenOptions, make_sorted_dst, trace_rays
from ..train.metrics import smape_loss


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """2-D (dp, sp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    dp = 2 if (n > 1 and n % 2 == 0) else 1
    sp = n // dp
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


# ---------------------------------------------------------------------------
# sharded rendering
# ---------------------------------------------------------------------------

def make_sharded_ray_tracer(mesh: Mesh, tree, opt: FrozenOptions,
                            max_steps: int = 512):
    """Returns a jitted fn tracing a [R]-ray batch sharded over all mesh
    devices; tree replicated."""
    ray_sharding = NamedSharding(mesh, P(("dp", "sp")))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(None, ray_sharding, ray_sharding, ray_sharding,
                      ray_sharding),
        out_shardings=ray_sharding)
    def traced(tree_arrays, dirs, vdirs, cens, dst):
        return trace_rays(tree_arrays, dirs, vdirs, cens, dst, opt,
                          max_steps=max_steps)

    tree = jax.device_put(tree, repl)
    return functools.partial(traced, tree)


def render_rays_sharded(mesh: Mesh, tree, dirs, vdirs, cens, uniforms,
                        opt: FrozenOptions, max_steps: int = 512):
    tracer = make_sharded_ray_tracer(mesh, tree, opt, max_steps)
    dst = make_sorted_dst(uniforms)
    return tracer(jnp.asarray(dirs), jnp.asarray(vdirs), jnp.asarray(cens),
                  dst)


def make_sharded_frame_renderer(mesh: Mesh, tree, width: int, height: int,
                                fx: float, fy: float, opt: FrozenOptions,
                                inc: int = 3, max_steps: int = 2048):
    """Whole-frame renderer with rays sharded over the mesh.

    Ray generation, PCG32 sampling, the march, shading, compositing and
    aux assembly all run SPMD; XLA keeps per-shard work local and only
    all-gathers at the [8,H,W]/[H,W,4] outputs.  The per-frame host
    traffic is the 3x4 pose and the RNG state (~60 bytes)."""
    from ..render.renderer import _render_noisy

    repl = NamedSharding(mesh, P())
    img_sharding = NamedSharding(mesh, P(("dp", "sp"), None, None))
    aux_sharding = NamedSharding(mesh, P(None, ("dp", "sp"), None))

    @functools.partial(
        jax.jit,
        in_shardings=(None, repl, repl, repl),
        out_shardings=(img_sharding, aux_sharding))
    def frame(tree_arrays, transform, state_hi, state_lo):
        # non-compacting schedule: wavefront compaction's global nonzero
        # would force cross-shard gathers; per-shard full-width marching
        # keeps all traversal traffic local to each chip
        return _render_noisy(
            tree_arrays, transform, state_hi, state_lo, width=width,
            height=height, fx=fx, fy=fy, opt=opt, n_chunks=1,
            max_steps=max_steps, inc=inc, schedule=((max_steps, 1),))

    tree = jax.device_put(tree, repl)
    return functools.partial(frame, tree)


# ---------------------------------------------------------------------------
# sharded training
# ---------------------------------------------------------------------------

def make_sharded_train_step(mesh: Mesh, cfg: GuidanceNetConfig,
                            optimizer=None, loss_fn=smape_loss):
    """Data-parallel (batch over dp) + spatially-sharded (H over sp)
    GuidanceNet training step; params/opt state replicated, gradient psum
    inserted by XLA from the shardings."""
    if optimizer is None:
        optimizer = optax.chain(
            optax.add_decayed_weights(5e-4), optax.adam(1e-4))
    model = GuidanceNet(cfg)

    batch_sharding = NamedSharding(mesh, P("dp", None, "sp", None))
    img_sharding = NamedSharding(mesh, P("dp", "sp", None, None))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, batch_sharding, img_sharding,
                      img_sharding),
        out_shardings=(repl, repl, repl))
    def step(params, opt_state, aux, img_in, img_gt):
        def loss_of(p):
            aux_nhwc = jnp.moveaxis(aux, 1, -1)
            weight, guidance = model.apply({"params": p}, aux_nhwc)
            out = guided_filter_batch(weight, guidance, img_in)
            return loss_fn(out[..., :3], img_gt[..., :3])

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, optimizer
