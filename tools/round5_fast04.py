"""Round-5: the 30-FPS crossing rung with the TRAINED fast-mode net.

Round 4's ladder measured s=0.4 (32.1 FPS) only with the full-res
shell net, which is nearly inert on joint-upsampled input (41.2 dB);
the distillation net (benchmarks/quality/fast.gnet, trained at s=0.5)
lifted the s=0.5 rung from 43.8 to 50.3 dB.  This measures whether it
also holds at s=0.4 — i.e. what quality the >=30 FPS configuration
actually ships with — against the same committed 8-pose real-GT kit.

Run AFTER bench (one TPU process at a time):
    nohup python tools/round5_fast04.py > /tmp/r5_fast04.log 2>&1 &
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    from bench import _timed_fps, get_tree, quality_report
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.render.schedule import auto_schedule

    print(f"devices: {jax.devices()}", flush=True)
    tree = get_tree("shell")
    dt = upload_tree(tree, lut_levels=min(9, tree.max_depth))
    opt = RenderOptions(spp=6, denoise=True, step_size=1e-4,
                        sigma_thresh=1e-2, background_brightness=1.0)
    cam = Camera(width=800, height=800)
    kits = [os.path.join(ROOT, "benchmarks", "quality")]
    fast_net = os.path.join(ROOT, "benchmarks", "quality", "fast.gnet")

    for scale in (0.4, float(os.environ.get("R5_SCALE2", "0.45"))):
        iw = ih = max(1, round(800 * scale))
        fx, fy = cam.fx * (iw / 800), cam.fy * (ih / 800)
        sched, div = auto_schedule(dt, [cam.transform], opt, fx, fy,
                                   iw, ih, with_shade_div=True)
        print(f"[s={scale}] auto schedule: {sched} div={div}", flush=True)
        r = Renderer(dt, 800, 800, cam.fx, cam.fy, options=opt,
                     schedule=sched, shade_cap_div=div,
                     render_scale=scale)
        r.set_denoiser(fast_net)
        label = f"fastnet_s{scale}"
        fps = _timed_fps(r, cam.transform, label)
        q = quality_report(r, kits, label)
        print(f"RESULT {label}: fps={fps:.2f} quality={q}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
