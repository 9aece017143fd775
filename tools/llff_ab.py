"""LLFF/NDC schedule A/B (round 4, VERDICT item 2).

The round-3 LLFF frame (1911 ms) spent its time in a ~110-round drain at
~0.5R width because the survivor probe stopped at checkpoint 70 while
the blobs scene's heavy tail (tools/llff_diag.py: median 22, p90 236
steps/ray) keeps falling to ~330.  With the deep-tail checkpoints the DP
can compact the tail; this script times the round-3 schedule against the
newly derived one on the canonical LLFF bench frame.

Run: nohup python tools/llff_ab.py > /tmp/llff_ab.log 2>&1 &
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

# round-3 shipped auto-schedule on this scene (BENCH_r03 bench log)
OLD_SCHED = ((11, 1.0, "thin", 4, 1024.0), (11, 1.4, "thin", 4, 1024.0),
             (48, 1.7, "brick", 4, 1024.0), (80, 1.8, "brick", 4, 1024.0),
             (0, 1.9, "brick", 4, 29.9))
OLD_DIV = 2


def timed_frames(r, transform, label, frames=6):
    checksum = jax.jit(lambda x: jnp.sum(x[::97, ::89]))

    def frame():
        img, _ = r.render(transform, want_aux=False)
        r.advance_rng()
        return img

    t0 = time.time()
    float(checksum(frame()))
    print(f"  {label}: compile+first {time.time()-t0:.1f}s", flush=True)
    for _ in range(2):
        float(checksum(frame()))
    t0 = time.time()
    acc = None
    for _ in range(frames):
        c = checksum(frame())
        acc = c if acc is None else acc + c
    float(acc)
    dtf = (time.time() - t0) / frames
    print(f"  {label}: {dtf*1000:.1f} ms/frame ({1.0/dtf:.2f} FPS)",
          flush=True)
    return dtf


def main():
    from bench import get_tree
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.render.schedule import auto_schedule

    print(f"devices: {jax.devices()}", flush=True)
    W, H, focal = 1008, 756, 800.0
    tree = get_tree("blobs")
    tree.use_ndc = True
    tree.ndc_width = float(W)
    tree.ndc_height = float(H)
    tree.ndc_focal = focal
    dt = upload_tree(tree, lut_levels=min(9, tree.max_depth))
    opt = RenderOptions(spp=6, denoise=True, step_size=1e-4,
                        sigma_thresh=1e-2, background_brightness=1.0)
    cam = Camera(width=W, height=H, fx=focal, fy=focal)
    cam.center = np.array([0.02, 0.01, 0.3], np.float32)
    cam.v_back = np.array([0.0, 0.0, 1.0], np.float32)
    cam.v_world_up = np.array([0.0, 1.0, 0.0], np.float32)
    cam.update()

    t0 = time.time()
    sched, shade_div = auto_schedule(dt, [cam.transform], opt, cam.fx,
                                     cam.fy, W, H, with_shade_div=True)
    print(f"new auto schedule ({time.time()-t0:.0f}s): "
          f"{[(s[0], round(s[1],1), s[2], s[3], round(s[4],1)) for s in sched]} "
          f"shade_div={shade_div}", flush=True)

    gnet = os.path.join(ROOT, "benchmarks", "quality_blobs", "trained.gnet")

    r_old = Renderer(dt, W, H, cam.fx, cam.fy, options=opt,
                     schedule=OLD_SCHED, shade_cap_div=OLD_DIV)
    if os.path.exists(gnet):
        r_old.set_denoiser(gnet)
    t_old = timed_frames(r_old, cam.transform, "OLD (round-3) schedule")

    r_new = Renderer(dt, W, H, cam.fx, cam.fy, options=opt,
                     schedule=sched, shade_cap_div=shade_div)
    if os.path.exists(gnet):
        r_new.set_denoiser(gnet)
    t_new = timed_frames(r_new, cam.transform, "NEW (deep-tail) schedule")

    print(f"speedup: {t_old/t_new:.2f}x  "
          f"({t_old*1e3:.0f} -> {t_new*1e3:.0f} ms)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
