"""Off-device .gnet evaluation on a quality-kit test split.

For each test pose of a kit (transforms_test.json + test/*.png GT +
spp_6/test/buf_*.bin aux dumps), computes whole-image PSNR / object-
masked PSNR / SSIM of (a) the noisy input frame (aux channels 0-3, the
same composited rgba the renderer displays) and (b) the guided-filter
output of one or more .gnet artifacts.  Pure CPU (JAX_PLATFORMS=cpu):
the bufs already carry the noisy render, so no march is needed --
evaluation of a freshly trained net runs with the tunnel down and is
protocol-identical to bench.quality_report's inputs.

Usage:
    JAX_PLATFORMS=cpu python tools/eval_gnet_kit.py <kit_dir> \
        <net1.gnet> [net2.gnet ...]
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def metrics(pred_rgb, gt_rgb, alpha):
    import jax.numpy as jnp
    from rt_octree_tpu.train.metrics import ssim as ssim_fn
    se = (pred_rgb - gt_rgb) ** 2
    mask = (alpha > 0.0).astype(np.float32)[..., None]
    mse = float(np.mean(se))
    mse_obj = float(np.sum(se * mask) / max(np.sum(mask) * 3.0, 1.0))
    s = float(ssim_fn(jnp.asarray(pred_rgb)[None], jnp.asarray(gt_rgb)[None]))
    return (-10.0 * np.log10(max(mse, 1e-12)),
            -10.0 * np.log10(max(mse_obj, 1e-12)), s)


def main(argv):
    kit = argv[0]
    nets = argv[1:]
    from rt_octree_tpu.io.images import read_png
    from rt_octree_tpu.models.guidance_net import (
        GuidanceNetCompact, load_compact)
    from rt_octree_tpu.ops.filtering import guided_filter
    import jax.numpy as jnp

    with open(os.path.join(kit, "transforms_test.json")) as f:
        frames = json.load(f)["frames"]

    loaded = []
    for p in nets:
        cfg, params, meta = load_compact(p, with_meta=True)
        loaded.append((p, cfg, params, meta))
        print(f"net {p}: identity_level={cfg.identity_level} meta={meta}")

    acc = {"noisy": []}
    for p, *_ in loaded:
        acc[p] = []
    for fr in frames:
        name = os.path.basename(fr["file_path"])
        gt_path = os.path.join(kit, "test", f"{name}.png")
        buf_path = os.path.join(kit, "spp_6", "test", f"buf_{name}.bin")
        if not (os.path.exists(gt_path) and os.path.exists(buf_path)):
            print(f"skip {name} (missing gt or buf)")
            continue
        gt = read_png(gt_path)[..., :3].astype(np.float32) / 255.0
        H, W = gt.shape[:2]
        aux = np.fromfile(buf_path, np.float32).reshape(8, H, W)
        noisy = aux[:4].transpose(1, 2, 0)
        alpha = aux[3]
        acc["noisy"].append(metrics(noisy[..., :3], gt, alpha))
        aux_nhwc = jnp.asarray(aux.transpose(1, 2, 0))[None]
        for p, cfg, params, _meta in loaded:
            w, g = GuidanceNetCompact(cfg).apply({"params": params},
                                                 aux_nhwc)
            out = guided_filter(w[0], g[0], jnp.asarray(noisy),
                                supports=cfg.supports())
            acc[p].append(metrics(np.asarray(out)[..., :3], gt, alpha))
        print(f"[{name}] done", flush=True)

    for k, v in acc.items():
        m = np.mean(np.asarray(v), axis=0)
        print(f"{k}: psnr={m[0]:.3f} psnr_obj={m[1]:.3f} ssim={m[2]:.5f}")


if __name__ == "__main__":
    main(sys.argv[1:])
