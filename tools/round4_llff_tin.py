"""Round-4: LLFF/NDC brick t_in A/B.

tools/llff_ab.py measured the deep-tail schedule at only 1.07x (1676 ->
1561 ms): compaction is not the LLFF lever.  tools/llff_diag.py says
86% of all steps sit in level-9 fringe cells -- the WHOLE LLFF march
looks like the shell's drain regime, where t_in=12 measured -10 ms
(PERF.md round-3).  This times the deep-tail schedule with t_in 4/8/12
substituted into every brick stage.

Run: nohup python tools/round4_llff_tin.py > /tmp/r4/llff_tin.log 2>&1 &
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

# deep-tail auto schedule measured by tools/llff_ab.py (1561 ms)
BASE = ((11, 1.0, "thin", 4, 1024.0), (11, 1.4, "thin", 4, 1024.0),
        (48, 1.7, "brick", 4, 1024.0), (80, 1.8, "brick", 4, 1024.0),
        (80, 1.9, "brick", 4, 29.9), (108, 2.4, "brick", 4, 8.4),
        (136, 3.2, "brick", 4, 9.3), (160, 5.6, "brick", 4, 5.1),
        (216, 10.5, "brick", 4, 7.6), (0, 24.6, "brick", 4, 11.6))
DIV = 2


def with_tin(sched, t_in):
    return tuple((s, d, k, t_in if k == "brick" else t, dd)
                 for (s, d, k, t, dd) in sched)


def timed_frames(r, transform, label, frames=5):
    checksum = jax.jit(lambda x: jnp.sum(x[::97, ::89]))

    def frame():
        img, _ = r.render(transform, want_aux=False)
        r.advance_rng()
        return img

    t0 = time.time()
    float(checksum(frame()))
    print(f"  {label}: compile+first {time.time()-t0:.1f}s", flush=True)
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

    print(f"devices: {jax.devices()}", flush=True)
    W, H, focal = 1008, 756, 800.0
    tree = get_tree("blobs")
    tree.use_ndc = True
    tree.ndc_width = float(W)
    tree.ndc_height = float(H)
    tree.ndc_focal = focal
    dtd = upload_tree(tree, lut_levels=min(9, tree.max_depth))
    opt = RenderOptions(spp=6, denoise=True, step_size=1e-4,
                        sigma_thresh=1e-2, background_brightness=1.0)
    cam = Camera(width=W, height=H, fx=focal, fy=focal)
    cam.center = np.array([0.02, 0.01, 0.3], np.float32)
    cam.v_back = np.array([0.0, 0.0, 1.0], np.float32)
    cam.v_world_up = np.array([0.0, 1.0, 0.0], np.float32)
    cam.update()
    gnet = os.path.join(ROOT, "benchmarks", "quality_blobs",
                        "trained.gnet")

    best = (None, 1e9)
    for t_in in (4, 8, 12):
        r = Renderer(dtd, W, H, cam.fx, cam.fy, options=opt,
                     schedule=with_tin(BASE, t_in), shade_cap_div=DIV)
        if os.path.exists(gnet):
            r.set_denoiser(gnet)
        dtf = timed_frames(r, cam.transform, f"t_in={t_in}")
        if dtf < best[1]:
            best = (t_in, dtf)
    print(f"best: t_in={best[0]} at {best[1]*1e3:.1f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
