"""Round-4: TT-resolution (1920x1080) per-phase decomposition.

The full bench measures the tt regime at 161.7 ms/frame denoise-on but
never splits it.  This runs the three-phase timer (render / net /
filter -- the reference's RenderContext::Timer protocol) on the exact
bench configuration, denoise on and off, to attribute the frame and
size the denoise_recommended=false advice's win.

Run: nohup python tools/round4_tt_phases.py > /tmp/r4/tt_phases.log 2>&1 &
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    from bench import get_tree, scene_denoiser
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer, render_timed
    from rt_octree_tpu.render.schedule import auto_schedule
    from rt_octree_tpu.utils.timer import PhaseTimer, sync

    print(f"devices: {jax.devices()}", flush=True)
    W, H, focal = 1920, 1080, 1158.0
    tree = get_tree("solid")
    dt = upload_tree(tree, lut_levels=min(9, tree.max_depth))
    opt = RenderOptions(spp=6, denoise=True, step_size=1e-4,
                        sigma_thresh=1e-2, background_brightness=1.0)
    cam = Camera(width=W, height=H, fx=focal, fy=focal)
    sched, shade_div = auto_schedule(dt, [cam.transform], opt, cam.fx,
                                     cam.fy, W, H, with_shade_div=True)
    r = Renderer(dt, W, H, cam.fx, cam.fy, options=opt,
                 schedule=sched, shade_cap_div=shade_div)
    scene_denoiser(r, "tt", None, None, fallbacks=("solid",))

    for denoise in (True, False):
        r.options.denoise = denoise
        timer = PhaseTimer()
        img = render_timed(r, cam.transform, timer)
        sync(img)
        r.advance_rng()
        timer.reset()
        for _ in range(8):
            # render_timed syncs each phase and counts the frame itself
            img = render_timed(r, cam.transform, timer)
            r.advance_rng()
        print(f"== denoise={denoise} ==", flush=True)
        print(timer.report(), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
