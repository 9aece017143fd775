"""Round-4: LLFF/NDC brick-from-step-0 A/B.

The LLFF roofline (tools/roofline_llff.py) measures the two leading
thin stages at ~9.8 ms/round (~18 ns/row in situ) while brick t_in=8
rounds deliver ~6x cheaper cell steps in this 84%-occupied regime;
BRICK_FROM=14 is a shell-tuned heuristic (early orbit-scene space is
EMPTY, where thin skip-jumps beat brick's 4-cell rounds).  This times
the stock auto schedule against one derived with BRICK_FROM=0 (same
probe, same caps): if bricks-from-entry win, derive_schedule should
pick brick_from adaptively with the existing long-tail detection.

Run: nohup python tools/round4_llff_brick0.py > /tmp/r4/llff_brick0.log 2>&1 &
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
    from rt_octree_tpu.render import schedule as S
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

    fracs = S.probe_survivors(dtd, [cam.transform[:3]], opt, cam.fx,
                              cam.fy, W, H, probe_res=200)
    shade_div = S.derive_shade_div(float(fracs[-1]))
    print(f"  shade_div={shade_div}", flush=True)
    results = {}
    imgs = {}
    for label, bf in (("stock bf=14", 14), ("brick-from-0", 0)):
        old = S.BRICK_FROM
        S.BRICK_FROM = bf
        try:
            sched = S.derive_schedule(fracs, margin=1.4)
        finally:
            S.BRICK_FROM = old
        print(f"  {label} schedule: "
              f"{[(s, round(d, 1), k, t, round(dd, 1)) for s, d, k, t, dd in sched]}",
              flush=True)
        r = Renderer(dtd, W, H, cam.fx, cam.fy, options=opt,
                     schedule=sched, shade_cap_div=shade_div)
        if os.path.exists(gnet):
            r.set_denoiser(gnet)
        results[label] = timed_frames(r, cam.transform, label)
        img, _ = r.render(cam.transform, want_aux=False)
        imgs[label] = float(jnp.sum(jnp.abs(img[::13, ::11])))
    ks = list(results)
    print(f"  checksum: {imgs[ks[0]]:.4f} vs {imgs[ks[1]]:.4f} "
          f"(exactness is schedule-independent only through identical "
          f"RNG consumption; compare magnitudes)", flush=True)
    print(f"speedup: {results[ks[0]]/results[ks[1]]:.2f}x", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
