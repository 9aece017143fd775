"""Round-4: fast-mode ladder measurement (sub-res march + joint upsample).

The published roofline (PERF.md round 4) proves the canonical 800x800
shell frame is gather-row bound at ~138 ms (~7.2 FPS); the measured
escape hatch is fewer rays.  This sweeps the additive fast mode
(render_scale < 1: march at inner res, bilinear joint-upsample through
the fused denoise) and the LOD tree (io/lod.py) on the shell bench
scene, reporting device ms/frame + denoise quality vs the committed
8-pose GT kit for each rung.

Run: nohup python tools/round4_fast.py > /tmp/r4/fast.log 2>&1 &
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    from bench import _timed_fps, get_tree, quality_report, scene_kits
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io.lod import build_lod
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.render.schedule import auto_schedule

    print(f"devices: {jax.devices()}", flush=True)
    tree = get_tree("shell")
    trees = {"full": tree}
    dts = {}
    opt = RenderOptions(spp=6, denoise=True, step_size=1e-4,
                        sigma_thresh=1e-2, background_brightness=1.0)
    cam = Camera(width=800, height=800)
    kits = ["/does/not/exist",
            os.path.join(ROOT, "benchmarks", "quality")]

    configs = [
        ("full", 1.0),    # reference point (the shipped frame)
        ("full", 0.5),
        ("full", 0.4),
        ("lod8", 0.5),
        ("lod8", 1.0),
    ]
    for kind, scale in configs:
        if kind.startswith("lod") and kind not in trees:
            d = int(kind[3:])
            t0 = time.time()
            trees[kind] = build_lod(tree, d)
            print(f"[{kind}] built: {tree.n_nodes} -> "
                  f"{trees[kind].n_nodes} nodes ({time.time()-t0:.0f}s)",
                  flush=True)
        if kind not in dts:
            t = trees[kind]
            dts[kind] = upload_tree(t, lut_levels=min(9, t.max_depth))
        dt = dts[kind]
        iw = ih = max(1, round(800 * scale))
        fx, fy = cam.fx * (iw / 800), cam.fy * (ih / 800)
        t0 = time.time()
        sched, div = auto_schedule(dt, [cam.transform], opt, fx, fy,
                                   iw, ih, with_shade_div=True)
        print(f"[{kind} s={scale}] auto schedule ({time.time()-t0:.0f}s): "
              f"{sched} div={div}", flush=True)
        r = Renderer(dt, 800, 800, cam.fx, cam.fy, options=opt,
                     schedule=sched, shade_cap_div=div,
                     render_scale=scale)
        r.set_denoiser(os.path.join(ROOT, "benchmarks", "quality",
                                    "trained.gnet"))
        label = f"{kind}_s{scale}"
        fps = _timed_fps(r, cam.transform, label)
        q = quality_report(r, kits, label)
        print(f"RESULT {label}: fps={fps:.2f} quality={q}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
