"""CPU smoke of the per-scene quality gates (bench.quality_report).

Loads a companion scene exactly as bench.py's companion section does
(same tree, options, auto-tuned schedule), attaches the newest
scene-trained .gnet, and runs bench.quality_report over the kit's
held-out poses — validating the whole per-scene quality chain
(kit layout -> scene denoiser -> metrics) off-device before any TPU
bench spends tunnel time on it.

Run: JAX_PLATFORMS=cpu python tools/smoke_scene_quality.py [solid|tt|blobs]
Env: SQ_POSES (default 2) limits the pose count for speed.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("RT_BENCH_QPOSES", os.environ.get("SQ_POSES", "2"))

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    import numpy as np

    import bench
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.render.schedule import auto_schedule

    scene = sys.argv[1] if len(sys.argv) > 1 else "solid"
    if scene == "solid":
        W = H = 800
        focal = None
        tree = bench.get_tree("solid")
    elif scene == "tt":
        W, H, focal = 1920, 1080, 1158.0
        tree = bench.get_tree("solid")
    elif scene == "blobs":
        W, H, focal = 1008, 756, 800.0
        tree = bench.get_tree("blobs")
        tree.use_ndc = True
        tree.ndc_width, tree.ndc_height, tree.ndc_focal = float(W), float(H), focal
    else:
        raise SystemExit(f"unknown scene {scene}")

    dt = upload_tree(tree, lut_levels=min(9, tree.max_depth))
    opt = RenderOptions(spp=6, denoise=True, step_size=1e-4,
                        sigma_thresh=1e-2, background_brightness=1.0)
    kwargs = {} if focal is None else {"fx": focal, "fy": focal}
    cam = Camera(width=W, height=H, **kwargs)
    sched, shade_div = auto_schedule(dt, [cam.transform], opt, cam.fx,
                                     cam.fy, W, H, with_shade_div=True)
    r = Renderer(dt, W, H, cam.fx, cam.fy, options=opt,
                 schedule=sched, shade_cap_div=shade_div)
    bench.scene_denoiser(r, scene, None, None)
    if r.net_cfg is None:
        raise SystemExit(f"no denoiser found for {scene}; train first")
    qual = bench.quality_report(r, bench.scene_kits(scene), scene)
    if qual is None:
        raise SystemExit("quality_report returned None (kit missing?)")
    gain = qual["denoised"]["psnr"] - qual["noisy"]["psnr"]
    print(f"SMOKE {scene}: {qual}")
    print(f"SMOKE {scene} OK: {gain:+.2f} dB over {qual['poses']} poses")
    # A negative gain is a legitimate measurement on hard-surface scenes
    # (the SPP=6 render is already near-converged; see PERF.md), so the
    # gain check is advisory unless explicitly required.
    if os.environ.get("SQ_REQUIRE_GAIN") == "1":
        assert gain > 0.0, f"denoiser did not improve PSNR ({gain:+.2f} dB)"


if __name__ == "__main__":
    main()
