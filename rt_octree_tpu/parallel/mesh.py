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
                                inc: int = 3, max_steps: int = 2048,
                                schedule=None, net_cfg=None,
                                net_params=None, render_scale: float = 1.0):
    """Whole-frame renderer with rays sharded over the mesh.

    Ray generation, PCG32 sampling, compositing and aux assembly run SPMD
    under jit (elementwise; XLA keeps them local); the march itself runs
    inside ``shard_map`` so every chip executes the full *compacting*
    wavefront schedule on its local ray shard -- the single-chip 3x
    optimization survives multi-chip, because the nonzero/pack of each
    shard stays shard-local instead of becoming a global cross-chip
    gather.

    When ``net_cfg``/``net_params`` carry a compact GuidanceNet and
    ``opt.denoise`` is set, the denoiser runs FUSED in the same jit (the
    reference's single-stream render->denoise pipeline,
    cuda_renderer.cpp:96-156): rays flattened row-major over ("dp","sp")
    ARE height rows, so the aux buffer is already H-sharded for the conv
    stack and the guided filter -- XLA partitions both with halo
    exchanges over ICI; no resharding sits between march and denoise.
    Outputs all-gather at the [H,W,4]/[8,H,W] boundary.  The per-frame
    host traffic is the 3x4 pose and RNG state (~60B).

    ``render_scale`` < 1 is fast mode (render/renderer.py fast path,
    PERF.md round-4 ladder): every shard marches its slice of the INNER
    resolution (focal scaled, same field of view) and the noisy image +
    aux rows joint-upsample bilinearly to the output size before the
    fused denoise -- the guided filter doubles as the upsampler.  The
    upsample happens on the H-sharded rows, so XLA partitions it with
    the same halo exchanges as the conv stack; the row-count saving is
    per-chip.  The inner pixel count must stay divisible by the mesh
    size (same constraint the full-res path puts on width*height)."""
    from ..render.renderer import (
        DEFAULT_SCHEDULE, device_camera_rays, maybe_world2ndc,
        rodrigues_jnp, trace_rays)
    from ..utils.rng import pcg32_uniforms_range

    if schedule is None:
        schedule = DEFAULT_SCHEDULE
    if not (0.0 < render_scale <= 1.0):
        raise ValueError("render_scale must be in (0, 1]")
    iw = max(1, round(width * render_scale))
    ih = max(1, round(height * render_scale))
    fast = (iw, ih) != (width, height)
    # factory-time validation (ADVICE r4): a non-divisible inner
    # resolution otherwise surfaces as an opaque shard_map/XLA
    # partitioning error at trace time
    n_dev = mesh.size
    if (iw * ih) % n_dev or ih % n_dev:
        raise ValueError(
            f"render_scale={render_scale} gives inner resolution "
            f"{iw}x{ih}; both ih and iw*ih must divide the device mesh "
            f"size {n_dev} (H rows are sharded over {mesh.axis_names})")
    if fast and height % n_dev:
        raise ValueError(
            f"fast mode upsamples to {width}x{height}, whose H={height} "
            f"rows must divide the device mesh size {n_dev}")
    fx_in, fy_in = fx * (iw / width), fy * (ih / height)
    repl = NamedSharding(mesh, P())
    ray_axes = ("dp", "sp")
    img_sharding = NamedSharding(mesh, P(ray_axes, None, None))
    aux_sharding = NamedSharding(mesh, P(None, ray_axes, None))
    R = iw * ih
    spp = opt.spp
    denoise = bool(opt.denoise) and net_cfg is not None

    classic = getattr(opt, "estimator", "rt") == "classic"

    def local_trace(tree_arrays, d, v, c, dst, tm):
        if classic:
            from ..render.renderer import trace_rays_classic
            return trace_rays_classic(tree_arrays, d, v, c, opt,
                                      tmax_bg=tm, max_steps=max_steps)
        return trace_rays(tree_arrays, d, v, c, dst, opt, tmax_bg=tm,
                          max_steps=max_steps, schedule=schedule)

    # check_vma off: the march seeds its while_loop carry with local zeros
    # (unvarying) that join varying per-shard values; there are no
    # collectives inside, so the replication check has nothing to protect.
    sharded_trace = jax.shard_map(
        local_trace, mesh=mesh,
        in_specs=(P(), P(ray_axes), P(ray_axes), P(ray_axes), P(ray_axes),
                  P(ray_axes)),
        out_specs=P(ray_axes), check_vma=False)

    @functools.partial(
        jax.jit,
        in_shardings=(None, repl, repl, repl, None),
        out_shardings=(img_sharding, aux_sharding))
    def frame(tree_arrays, transform, state_hi, state_lo, params):
        dirs, cens = device_camera_rays(transform, iw, ih, fx_in, fy_in)
        vdirs = rodrigues_jnp(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
        wdirs, wcens = maybe_world2ndc(tree_arrays, dirs, cens)
        uniforms = pcg32_uniforms_range(
            state_hi, state_lo, n=R * spp, inc=inc).reshape(R, spp)
        dst = make_sorted_dst(uniforms)
        tmax_bg = jnp.full((R,), 1e9, jnp.float32)

        out = sharded_trace(tree_arrays, wdirs, vdirs, wcens, dst, tmax_bg)
        from ..render.renderer import (_denoise, aux_from_composite,
                                       composite)
        img, outc = composite(out, iw, ih, opt.background_brightness)
        if fast:
            # joint upsample to the output resolution on the sharded
            # rows; the H-axis constraint keeps the resize (and the
            # denoise behind it) partitioned instead of gathered
            img = jax.lax.with_sharding_constraint(
                jax.image.resize(img, (height, width, 4), "bilinear"),
                img_sharding)
            outc = jax.lax.with_sharding_constraint(
                jax.image.resize(outc.reshape(ih, iw, 4),
                                 (height, width, 4), "bilinear"),
                img_sharding).reshape(width * height, 4)
        if denoise:
            # NHWC aux built straight from the composited rows (no CHW
            # round-trip), kept H-sharded (rows == rays) for the
            # conv/filter stack
            aux_nhwc = jax.lax.with_sharding_constraint(
                aux_from_composite(outc, width, height, "nhwc"),
                NamedSharding(mesh, P(ray_axes, None, None)))
            img = _denoise(aux_nhwc, img, params, net_cfg)
        aux = aux_from_composite(outc, width, height)
        return img, aux

    tree = jax.device_put(tree, repl)
    if denoise:
        net_params = jax.device_put(net_params, repl)

    def render(transform, state_hi, state_lo):
        return frame(tree, transform, state_hi, state_lo,
                     net_params if denoise else 0)

    return render


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
            out = guided_filter_batch(weight, guidance, img_in,
                                      supports=cfg.supports())
            return loss_fn(out[..., :3], img_gt[..., :3])

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, optimizer
