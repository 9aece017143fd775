"""Build a denoiser quality dataset from a bench scene.

Renders, for a set of poses over a synthetic bench octree:
  * noisy SPP=6 aux buffers (``buf_<name>.bin``, the --write_buffer
    format, main_headless.cpp:512-523), and
  * converged ground truth via the classic exponential-transmittance
    estimator (shaders/rt.frag:222-327) -- the deterministic limit of the
    regular-tracking expectation, i.e. a noise-free GT.

Output directory matches the blender dataset layout consumed by
train/dataset.py, so the canonical training protocol (10x10 slices,
bs=32, SMAPE) runs on it unchanged.

Scenes (QD_SCENE): ``shell`` (default; orbit poses, the headline bench
scene), ``solid`` (orbit poses, hard-surface companion), ``blobs``
(LLFF-style forward-facing poses with the NDC warp at the canonical
1008x756 -- the third bench scene).  QD_SPLITS=test builds only the
held-out GT kit (cheap; used by bench.py's per-scene quality gates),
the default ``train,test`` builds the full training set too.

Run: nohup python tools/make_quality_dataset.py > /tmp/quality_ds.log 2>&1 &
"""

import json
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax
import jax.numpy as jnp

# honor the env var over the site hook's default platform (lets
# JAX_PLATFORMS=cpu build scaled-down kits off-device)
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

SCENE = os.environ.get("QD_SCENE", "shell")
CACHE = os.environ.get("RT_BENCH_CACHE") or os.path.join(ROOT,
                                                         ".bench_cache")
OUT = os.environ.get("QD_OUT") or os.path.join(
    CACHE, "quality_ds" if SCENE == "shell" else f"quality_ds_{SCENE}")
# GT-only kits skip the noisy SPP renders + buf dumps: bench.py's
# quality gates need only transforms_test.json + test/*.png GT (the
# noisy side is rendered live); the bufs matter only for training.
GT_ONLY = os.environ.get("QD_GT_ONLY", "") == "1"
# GT-only defaults to the test split alone: converged-GT train frames
# without bufs cannot be used for training and are expensive to render.
_default_splits = "test" if GT_ONLY else "train,test"
SPLITS = [s for s in os.environ.get("QD_SPLITS", _default_splits).split(",")
          if s]
if GT_ONLY and "train" in SPLITS:
    print("[warn] QD_GT_ONLY with a 'train' split renders converged-GT "
          "train frames that have no aux bufs and cannot train a net",
          file=sys.stderr)
N_TRAIN = int(os.environ.get("QD_TRAIN", "32"))
N_TEST = int(os.environ.get("QD_TEST", "8"))
SPP = 6
RES = int(os.environ.get("QD_RES", "800"))
# blobs = the LLFF NDC bench scene: canonical factor-4 resolution
NDC = SCENE == "blobs"
# tt = the TanksAndTemples-resolution bench regime: the solid
# hard-surface tree at the canonical 1920x1080 (main_headless.cpp:274-275)
TREE_KIND = {"tt": "solid"}.get(SCENE, SCENE)
QD_SCALE = float(os.environ.get("QD_SCALE", "1"))
if NDC:
    W, H, FOCAL = int(1008 * QD_SCALE), int(756 * QD_SCALE), 800.0 * QD_SCALE
elif SCENE == "tt":
    W, H = int(1920 * QD_SCALE), int(1080 * QD_SCALE)
    FOCAL = 1158.0 * QD_SCALE  # bench.py tt_scene_fps focal
else:
    W = H = int(RES * QD_SCALE)
    FOCAL = None  # Camera default focal


def orbit_pose(azim: float, elev: float, radius: float = 5.02):
    from rt_octree_tpu.core.camera import Camera
    c = radius * np.array([np.cos(elev) * np.cos(azim),
                           np.cos(elev) * np.sin(azim),
                           np.sin(elev)], np.float32)
    kw = {"fx": FOCAL, "fy": FOCAL} if FOCAL else {}
    cam = Camera(width=W, height=H, center=c,
                 v_back=c / np.linalg.norm(c), **kw)
    return cam


def forward_pose(jx: float, jy: float, jz: float, tx: float, ty: float):
    """LLFF-style forward-facing pose: small translation jitter, nearly
    parallel view directions (the capture regime NDC was designed for,
    volrend.cu:35-56)."""
    from rt_octree_tpu.core.camera import Camera
    back = np.array([tx, ty, 1.0], np.float32)
    back /= np.linalg.norm(back)
    cam = Camera(width=W, height=H, fx=FOCAL, fy=FOCAL,
                 center=np.array([jx, jy, jz], np.float32),
                 v_back=back)
    return cam


def main():
    from bench import get_tree
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io.images import write_png
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.render.schedule import auto_schedule

    print(f"devices: {jax.devices()}  scene={SCENE} splits={SPLITS} "
          f"{W}x{H} ndc={NDC}", flush=True)
    tree = get_tree(TREE_KIND)
    if NDC:
        tree.use_ndc = True
        tree.ndc_width = float(W)
        tree.ndc_height = float(H)
        tree.ndc_focal = FOCAL
    dt = upload_tree(tree, lut_levels=min(9, tree.max_depth))

    rng = np.random.default_rng(7)
    poses = {}
    for split, n in (("train", N_TRAIN), ("test", N_TEST)):
        poses[split] = []
        for i in range(n):
            if NDC:
                poses[split].append(forward_pose(
                    rng.uniform(-0.2, 0.2), rng.uniform(-0.15, 0.15),
                    rng.uniform(0.15, 0.45),
                    rng.uniform(-0.08, 0.08), rng.uniform(-0.08, 0.08)))
            else:
                azim = rng.uniform(0, 2 * np.pi)
                elev = rng.uniform(np.deg2rad(-25), np.deg2rad(65))
                poses[split].append(orbit_pose(azim, elev))

    cam0 = poses["train"][0]
    noisy_opt = RenderOptions(spp=SPP, denoise=False)
    gt_opt = RenderOptions(spp=1, denoise=False, estimator="classic")
    # non-shell scenes need their own survivor-curve schedule (the
    # shell-tuned defaults overflow or under-run elsewhere, PERF.md)
    r_noisy = None
    if not GT_ONLY:
        kw = {}
        if SCENE != "shell":
            kw["schedule"] = auto_schedule(dt, [cam0.transform], noisy_opt,
                                           cam0.fx, cam0.fy, W, H)
            print(f"auto schedule: {kw['schedule']}", flush=True)
        # shell keeps the bench-tuned DEFAULT_SCHEDULE (passing None
        # explicitly would override the Renderer default and crash)
        r_noisy = Renderer(dt, W, H, cam0.fx, cam0.fy, options=noisy_opt,
                           **kw)
    r_gt = Renderer(dt, W, H, cam0.fx, cam0.fy, options=gt_opt,
                    max_steps=16384)

    # GT frames cross the tunnel as u8 (x255 truncation ON DEVICE --
    # bit-identical to io.images.to_uint8 since both are IEEE f32
    # multiply + truncating cast): 1.9MB/pose instead of 10MB at the
    # ~8-15 MB/s link.  Scalar stats ride along so no float frame ever
    # crosses.
    @jax.jit
    def _gt_pack(img):
        rgb = img[..., :3]
        u8 = (jnp.clip(rgb, 0.0, 1.0) * 255).astype(jnp.uint8)
        return u8, jnp.mean(rgb)

    for split in SPLITS:
        os.makedirs(os.path.join(OUT, split), exist_ok=True)
        if not GT_ONLY:
            # only a trainable kit carries the noisy aux-buf directory;
            # an empty spp_<N>/ would make a GT-only kit look trainable
            os.makedirs(os.path.join(OUT, f"spp_{SPP}", split),
                        exist_ok=True)
        frames = []
        for i, cam in enumerate(poses[split]):
            name = f"r_{i}"
            alpha_max = float("nan")
            if not GT_ONLY:
                img_n, aux = r_noisy.render(cam.transform)
                r_noisy.advance_rng()
                # TRAIN bufs may cross the tunnel as f16 (halves the
                # dominant per-pose readback; ~5e-4 rel rounding on
                # *training inputs* only).  TEST bufs always cross f32:
                # they are eval-protocol inputs (eval_gnet_kit noisy
                # PSNR) and stay bit-exact.  QD_F16_TRAIN_BUFS=0 forces
                # f32 everywhere.
                f16_ok = (split == "train" and os.environ.get(
                    "QD_F16_TRAIN_BUFS", "1") == "1")
                if f16_ok:
                    aux = np.asarray(aux.astype(jnp.float16))
                else:
                    aux = np.asarray(aux)
                aux.astype(np.float32).tofile(os.path.join(
                    OUT, f"spp_{SPP}", split, f"buf_{name}.bin"))
                alpha_max = float(aux[3].max())
            img_gt, _ = r_gt.render(cam.transform)
            gt_u8, gt_mean = _gt_pack(img_gt)
            write_png(os.path.join(OUT, split, f"{name}.png"),
                      np.asarray(gt_u8))
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :] = cam.transform
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})
            print(f"[{split} {i+1}/{len(poses[split])}] "
                  f"gt_mean={float(gt_mean):.4f} "
                  f"noisy_alpha_max={alpha_max:.3f}", flush=True)
        with open(os.path.join(OUT, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 2 * np.arctan(
                W / (2 * cam0.fx)), "frames": frames}, f)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
