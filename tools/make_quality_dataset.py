"""Build the denoiser quality dataset from the bench scene.

Renders, for a set of orbit poses around the synthetic shell octree:
  * noisy SPP=6 aux buffers (``buf_<name>.bin``, the --write_buffer
    format, main_headless.cpp:512-523), and
  * converged ground truth via the classic exponential-transmittance
    estimator (shaders/rt.frag:222-327) -- the deterministic limit of the
    regular-tracking expectation, i.e. a noise-free GT.

Output directory matches the blender dataset layout consumed by
train/dataset.py, so the canonical training protocol (10x10 slices,
bs=32, SMAPE) runs on it unchanged.

Run: nohup python tools/make_quality_dataset.py > /tmp/quality_ds.log 2>&1 &
"""

import json
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

OUT = os.path.join(ROOT, ".bench_cache", "quality_ds")
N_TRAIN = int(os.environ.get("QD_TRAIN", "32"))
N_TEST = int(os.environ.get("QD_TEST", "8"))
SPP = 6
RES = int(os.environ.get("QD_RES", "800"))


def orbit_pose(azim: float, elev: float, radius: float = 5.02):
    from rt_octree_tpu.core.camera import Camera
    c = radius * np.array([np.cos(elev) * np.cos(azim),
                           np.cos(elev) * np.sin(azim),
                           np.sin(elev)], np.float32)
    cam = Camera(width=RES, height=RES, center=c,
                 v_back=c / np.linalg.norm(c))
    return cam


def main():
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import n3tree
    from rt_octree_tpu.io.images import write_png
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer

    print(f"devices: {jax.devices()}", flush=True)
    tree = n3tree.load(os.path.join(ROOT, ".bench_cache",
                                    "shell_d9_sh9.npz"))
    dt = upload_tree(tree, lut_levels=9)

    rng = np.random.default_rng(7)
    poses = {"train": [], "test": []}
    for split, n in (("train", N_TRAIN), ("test", N_TEST)):
        for i in range(n):
            azim = rng.uniform(0, 2 * np.pi)
            elev = rng.uniform(np.deg2rad(-25), np.deg2rad(65))
            poses[split].append(orbit_pose(azim, elev))

    cam0 = poses["train"][0]
    noisy_opt = RenderOptions(spp=SPP, denoise=False)
    gt_opt = RenderOptions(spp=1, denoise=False, estimator="classic")
    r_noisy = Renderer(dt, RES, RES, cam0.fx, cam0.fy, options=noisy_opt)
    r_gt = Renderer(dt, RES, RES, cam0.fx, cam0.fy, options=gt_opt,
                    max_steps=16384)

    for split in ("train", "test"):
        os.makedirs(os.path.join(OUT, split), exist_ok=True)
        os.makedirs(os.path.join(OUT, f"spp_{SPP}", split), exist_ok=True)
        frames = []
        for i, cam in enumerate(poses[split]):
            name = f"r_{i}"
            img_n, aux = r_noisy.render(cam.transform)
            r_noisy.advance_rng()
            img_gt, _ = r_gt.render(cam.transform)
            aux = np.asarray(aux)
            img_gt = np.asarray(img_gt)
            aux.astype(np.float32).tofile(
                os.path.join(OUT, f"spp_{SPP}", split, f"buf_{name}.bin"))
            write_png(os.path.join(OUT, split, f"{name}.png"),
                      img_gt[..., :3])
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :] = cam.transform
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})
            print(f"[{split} {i+1}/{len(poses[split])}] "
                  f"gt_mean={img_gt[..., :3].mean():.4f} "
                  f"noisy_alpha_max={aux[3].max():.3f}", flush=True)
        with open(os.path.join(OUT, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 2 * np.arctan(
                RES / (2 * cam0.fx)), "frames": frames}, f)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
