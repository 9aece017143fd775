"""Deep-tree (depth-11) march benchmark on the real TPU.

Builds (once, cached) a depth-11 shell PlenOctree -- the real-scale
tree class VERDICT round 2 flagged as silently degraded -- uploads it
through the sparse/indirect brick path (LUT anchored at level 9, one
520B brick row per internal cell), checks a small crop against the
NumPy oracle, then times full 800x800 SPP=6 frames with an auto-tuned
schedule.

Run: nohup python tools/bench_deep.py > /tmp/bench_deep.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "axon")

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

CACHE = os.path.join(ROOT, ".bench_cache")
DEPTH = int(os.environ.get("RT_DEEP_DEPTH", "11"))
FRAMES = int(os.environ.get("RT_DEEP_FRAMES", "10"))


def get_tree():
    """Depth-11 tree = the cached depth-9 shell refined 2 levels at its
    occupied deepest leaves (a dense 2048^3 occupancy grid would need
    tens of GB; refinement gives the same surface-sparse deep class)."""
    from rt_octree_tpu.io import n3tree, synthetic
    path = os.path.join(CACHE, f"shell_d{DEPTH}_refined.npz")
    if os.path.exists(path):
        return n3tree.load(path)
    t0 = time.time()
    base = n3tree.load(os.path.join(CACHE, "shell_d9_sh9.npz"))
    res = 2 ** 9
    thickness = max(3.0 / res, 0.02)
    tree = synthetic.refine_tree(
        base,
        lambda p: synthetic.shell_sigma(p, thickness=thickness,
                                        amplitude=4.0 / thickness),
        synthetic.position_color, levels=DEPTH - 9)
    print(f"refined to depth-{tree.max_depth}: {tree.capacity} nodes "
          f"({time.time()-t0:.0f}s)", flush=True)
    synthetic.save_npz(tree, path)
    return tree


def main():
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer
    from rt_octree_tpu.render.schedule import auto_schedule

    print(f"devices: {jax.devices()}", flush=True)
    tree = get_tree()
    t0 = time.time()
    dt = upload_tree(tree, lut_levels=9)
    jax.block_until_ready(dt.lut)
    print(f"upload: lut_levels={dt.lut_levels} brick_levels="
          f"{dt.brick_levels} indirect={dt.brick_indirect} "
          f"bricks={dt.brick.shape} ({time.time()-t0:.0f}s)", flush=True)
    assert dt.brick_indirect, "expected the sparse/indirect brick path"

    opt = RenderOptions(spp=6, denoise=False)
    cam = Camera(width=800, height=800)

    # --- numerics canary: small crop vs the NumPy oracle ---
    size = 24
    ccam = Camera(width=size, height=size, fx=40.0, fy=40.0)
    copt = RenderOptions(spp=2, denoise=False)
    rs = Renderer(dt, size, size, 40.0, 40.0, options=copt)
    img = np.asarray(rs.render(ccam.transform)[0])
    ref_path = os.path.join(CACHE, f"canary_deep_d{DEPTH}.npy")
    if os.path.exists(ref_path):
        ref = np.load(ref_path)
    else:
        from rt_octree_tpu.core.oracle import render_frame_oracle
        from rt_octree_tpu.utils.rng import Pcg32
        t0 = time.time()
        ref, _ = render_frame_oracle(tree, ccam, copt, Pcg32(20230418))
        np.save(ref_path, ref)
        print(f"oracle crop: {time.time()-t0:.0f}s", flush=True)
    err = np.abs(img - ref).max()
    print(f"canary max err vs oracle: {err:.2e}", flush=True)
    assert err <= 1e-4, "deep-tree march diverged from the oracle"

    # --- timed frames, auto-tuned schedule ---
    t0 = time.time()
    sched, shade_div = auto_schedule(dt, [cam.transform], opt, cam.fx,
                                     cam.fy, 800, 800,
                                     with_shade_div=True)
    print(f"auto schedule ({time.time()-t0:.0f}s): "
          f"{[(s, round(d, 1), k, t, round(dd, 1)) for s, d, k, t, dd in sched]} "
          f"shade_div={shade_div}", flush=True)
    r = Renderer(dt, 800, 800, cam.fx, cam.fy, options=opt,
                 schedule=sched, shade_cap_div=shade_div)
    checksum = jax.jit(lambda x: jnp.sum(x[::97, ::89]))

    def frame():
        img, _ = r.render(cam.transform)
        r.advance_rng()
        return img

    t0 = time.time()
    float(checksum(frame()))
    print(f"compile+first frame: {time.time()-t0:.0f}s", flush=True)
    for _ in range(3):
        float(checksum(frame()))
    t0 = time.time()
    acc = None
    for _ in range(FRAMES):
        c = checksum(frame())
        acc = c if acc is None else acc + c
    float(acc)
    ms = (time.time() - t0) / FRAMES * 1000
    print(json.dumps({"metric": f"deep_d{DEPTH}_800x800_spp6_ms",
                      "ms_per_frame": round(ms, 1),
                      "fps": round(1000.0 / ms, 2)}), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
