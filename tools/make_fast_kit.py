"""Build a FAST-MODE denoiser training kit by distillation.

The round-4 fast-mode ladder (tools/round4_fast.py) measured that the
shell-trained GuidanceNet adds only +0.7 dB on render_scale=0.5 frames:
joint-upsampled noisy input is out of its training distribution.  This
tool builds a kit whose

  * inputs are fast-mode aux buffers (march at QD_FAST_SCALE of the
    output resolution, image+aux bilinearly joint-upsampled -- exactly
    what the production fast path feeds the net), and
  * training targets are TEACHER frames: the committed full-resolution
    pipeline (SPP=6 march + shell-trained denoise, 54.8 dB vs real GT).

Distillation sidesteps the expensive converged-GT renders for the train
split (a teacher frame costs ~160 ms vs ~minutes for the classic
marcher); the ceiling is the teacher's quality.  The TEST split is NOT
distilled: it reuses the committed real-GT kit (benchmarks/quality --
classic-marcher converged renders) with freshly rendered fast-mode
bufs, so every reported number stays anchored to real ground truth.

Layout matches train/dataset.py's blender reader, so the canonical
training protocol (10x10 slices, bs=32, SMAPE; denoiser/runner.py
parity) runs unchanged:

    OUT/transforms_{train,test}.json
    OUT/{train,test}/r_*.png         teacher (train) / real GT (test)
    OUT/spp_6/{train,test}/buf_*.bin fast-mode aux dumps

Run: nohup python tools/make_fast_kit.py > /tmp/r4/fastkit.log 2>&1 &
"""

import json
import os
import shutil
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

RS = float(os.environ.get("QD_FAST_SCALE", "0.5"))
N_TRAIN = int(os.environ.get("QD_TRAIN", "32"))
RES = int(os.environ.get("QD_RES", "800"))
SPP = 6
# shell | blobs (LLFF/NDC) | tt (TanksAndTemples-resolution, solid tree)
SCENE = os.environ.get("QD_SCENE", "shell")
QD_SCALE = float(os.environ.get("QD_SCALE", "1"))  # shrink for smoke
OUT = os.environ.get("QD_OUT") or os.path.join(
    ROOT, ".bench_cache",
    "quality_ds_fast" if SCENE == "shell" else f"quality_ds_fast_{SCENE}")
GT_KIT = os.environ.get("QD_GT_KIT") or os.path.join(
    ROOT, "benchmarks",
    "quality" if SCENE == "shell" else f"quality_{SCENE}")
SPLITS = [s for s in os.environ.get("QD_SPLITS", "train,test").split(",")
          if s]
# the tt regime is the solid hard-surface tree at the big-frame
# resolution (bench.py tt_scene_fps; main_headless.cpp:274-275)
TREE_KIND = {"tt": "solid"}.get(SCENE, SCENE)

if SCENE == "blobs":
    # canonical LLFF factor-4 resolution + NDC warp (bench llff scene)
    W, H, FOCAL = int(1008 * QD_SCALE), int(756 * QD_SCALE), 800.0 * QD_SCALE
elif SCENE == "tt":
    W, H = int(1920 * QD_SCALE), int(1080 * QD_SCALE)
    FOCAL = 1158.0 * QD_SCALE  # bench.py tt_scene_fps focal
else:
    W = H = int(RES * QD_SCALE)
    FOCAL = None  # Camera default focal


def main():
    from bench import get_tree
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io.images import write_png
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.render.schedule import auto_schedule

    print(f"devices: {jax.devices()}  scene={SCENE}  scale={RS}  "
          f"out={OUT}", flush=True)
    tree = get_tree(TREE_KIND)
    if SCENE == "blobs":
        tree.use_ndc = True
        tree.ndc_width = float(W)
        tree.ndc_height = float(H)
        tree.ndc_focal = FOCAL
    dt = upload_tree(tree, lut_levels=min(9, tree.max_depth))
    # QD_LOD=<d>: the STUDENT marches the depth-capped LOD tree
    # (io/lod.py) -- matches the production llff interactive rung
    # (bench.py: lod d8 x fast s=0.5), whose input distribution differs
    # from the full-depth fast path.  The teacher stays full-depth
    # full-res: the quality anchor does not move.
    lod_d = int(os.environ.get("QD_LOD", "0"))
    if lod_d:
        from rt_octree_tpu.io.lod import build_lod
        tree_s = build_lod(tree, lod_d)
        dt_s = upload_tree(tree_s, lut_levels=min(9, tree_s.max_depth))
        print(f"[fastkit] student tree: LOD depth {lod_d} "
              f"({tree_s.capacity} nodes)", flush=True)
    else:
        dt_s = dt
    opt_t = RenderOptions(spp=SPP, denoise=True, step_size=1e-4,
                          sigma_thresh=1e-2, background_brightness=1.0)
    opt_s = RenderOptions(spp=SPP, denoise=False, step_size=1e-4,
                          sigma_thresh=1e-2, background_brightness=1.0)
    kwf = {"fx": FOCAL, "fy": FOCAL} if FOCAL else {}
    cam0 = Camera(width=W, height=H, **kwf)

    # teacher: the committed full-resolution pipeline
    sch_t, div_t = auto_schedule(dt, [cam0.transform], opt_t, cam0.fx,
                                 cam0.fy, W, H, with_shade_div=True)
    teacher = Renderer(dt, W, H, cam0.fx, cam0.fy, options=opt_t,
                       schedule=sch_t, shade_cap_div=div_t)
    teacher.set_denoiser(os.path.join(GT_KIT, "trained.gnet"))
    if not teacher.denoise_recommended:
        # hard-surface kits record that full-res filtering COSTS quality
        # (PERF.md per-scene denoiser finding); the honest teacher is the
        # ADVISED production config -- the near-converged noisy frame
        teacher.options.denoise = False
        print("[fastkit] teacher denoise OFF (kit advice)", flush=True)

    # student input: the production fast path (march at RS, denoise off,
    # aux joint-upsampled to the output resolution)
    iw, ih = max(1, round(W * RS)), max(1, round(H * RS))
    sch_s, div_s = auto_schedule(dt_s, [cam0.transform], opt_s,
                                 cam0.fx * (iw / W), cam0.fy * (ih / H),
                                 iw, ih, with_shade_div=True)
    student = Renderer(dt_s, W, H, cam0.fx, cam0.fy, options=opt_s,
                       schedule=sch_s, shade_cap_div=div_s,
                       render_scale=RS)

    import jax.numpy as jnp

    # teacher frames cross the tunnel as u8 (device-side x255 truncation,
    # bit-identical to io.images.to_uint8): 1/16 the bytes of the f32
    # frame at the ~8-15 MB/s link
    @jax.jit
    def _gt_u8(img):
        return (jnp.clip(img[..., :3], 0.0, 1.0) * 255).astype(jnp.uint8)

    def dump(split, name, transform, gt_png=None):
        """Render the student buf for one pose; write GT (teacher render
        unless a real-GT png is supplied).  TRAIN bufs may cross the
        tunnel as f16 (QD_F16_TRAIN_BUFS=0 forces f32); TEST bufs are
        always f32 -- they are eval-protocol inputs."""
        img_s, aux = student.render(transform)
        student.advance_rng()
        if (split == "train"
                and os.environ.get("QD_F16_TRAIN_BUFS", "1") == "1"):
            aux_np = np.asarray(aux.astype(jnp.float16))
        else:
            aux_np = np.asarray(aux)
        aux_np.astype(np.float32).tofile(
            os.path.join(OUT, f"spp_{SPP}", split, f"buf_{name}.bin"))
        if gt_png is None:
            img_t, _ = teacher.render(transform)
            teacher.advance_rng()
            write_png(os.path.join(OUT, split, f"{name}.png"),
                      np.asarray(_gt_u8(img_t)))
        else:
            shutil.copyfile(gt_png, os.path.join(OUT, split,
                                                 f"{name}.png"))

    # ---- train split: orbit poses, teacher targets -------------------
    if "train" in SPLITS:
        split = "train"
        os.makedirs(os.path.join(OUT, split), exist_ok=True)
        os.makedirs(os.path.join(OUT, f"spp_{SPP}", split), exist_ok=True)
        rng = np.random.default_rng(20230418)
        frames = []
        for i in range(N_TRAIN):
            if SCENE == "blobs":
                # LLFF forward-facing jitter (same distribution as
                # tools/make_quality_dataset.py's blobs kit)
                back = np.array([rng.uniform(-0.08, 0.08),
                                 rng.uniform(-0.08, 0.08), 1.0],
                                np.float32)
                back /= np.linalg.norm(back)
                cam = Camera(width=W, height=H, center=np.array(
                    [rng.uniform(-0.2, 0.2), rng.uniform(-0.15, 0.15),
                     rng.uniform(0.15, 0.45)], np.float32),
                    v_back=back, **kwf)
            else:
                azim = rng.uniform(0, 2 * np.pi)
                elev = rng.uniform(np.deg2rad(-25), np.deg2rad(65))
                c = 5.02 * np.array([np.cos(elev) * np.cos(azim),
                                     np.cos(elev) * np.sin(azim),
                                     np.sin(elev)], np.float32)
                cam = Camera(width=W, height=H, center=c,
                             v_back=c / np.linalg.norm(c), **kwf)
            name = f"r_{i}"
            dump(split, name, cam.transform)
            c2w = np.eye(4, dtype=np.float32)
            c2w[:3, :] = cam.transform
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})
            print(f"[train {i + 1}/{N_TRAIN}]", flush=True)
        with open(os.path.join(OUT, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x":
                       2 * np.arctan(W / (2 * cam0.fx)),
                       "frames": frames}, f)

    # ---- test split: committed REAL-GT poses + fast-mode bufs --------
    if "test" in SPLITS:
        split = "test"
        os.makedirs(os.path.join(OUT, split), exist_ok=True)
        os.makedirs(os.path.join(OUT, f"spp_{SPP}", split), exist_ok=True)
        with open(os.path.join(GT_KIT, "transforms_test.json")) as f:
            tj = json.load(f)
        for i, fr in enumerate(tj["frames"]):
            name = os.path.basename(fr["file_path"])
            pose = np.asarray(fr["transform_matrix"], np.float32)[:3]
            # same per-pose seed as bench.quality_report so the kit's
            # test numbers are comparable with the bench gate
            student.rng.seed(20230418, 1)
            dump(split, name, pose,
                 gt_png=os.path.join(GT_KIT, "test", f"{name}.png"))
            print(f"[test {i + 1}/{len(tj['frames'])}]", flush=True)
        with open(os.path.join(OUT, f"transforms_{split}.json"), "w") as f:
            json.dump(tj, f)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
