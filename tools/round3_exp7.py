"""Round-3 exp7: fori vs early-exit while for fixed-budget mid stages,
in-jit on the shell bench march.

Run: nohup python tools/round3_exp7.py > /tmp/r3exp7.log 2>&1 &
"""
import functools, os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "axon")
import jax, jax.numpy as jnp
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".bench_cache", "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

def sync(x):
    return float(jnp.sum(jnp.ravel(jnp.asarray(x, jnp.float32))[::9973]))

def timeit(fn, *args, reps=6, label=""):
    sync(fn(*args)); sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / reps
    print(f"  {label:56s} {dt*1e3:9.2f} ms", flush=True)
    return dt

def main():
    from rt_octree_tpu.core.camera import Camera
    from rt_octree_tpu.core.options import RenderOptions
    from rt_octree_tpu.io import n3tree
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render import renderer as RR
    from rt_octree_tpu.utils.rng import pcg32_uniforms_range

    print(f"devices: {jax.devices()}", flush=True)
    W = H = 800; spp = 6; R = W * H
    cam = Camera(width=W, height=H)
    opt = RR.FrozenOptions.from_options(RenderOptions(spp=spp, denoise=False))
    transform = jnp.asarray(cam.transform, jnp.float32)
    hi, lo = jnp.uint32(0x12345678), jnp.uint32(0x9ABCDEF0)
    tree = n3tree.load(os.path.join(ROOT, ".bench_cache", "shell_d9_sh9.npz"))
    dt = upload_tree(tree, lut_levels=9)

    @functools.partial(jax.jit, static_argnames=("mid_fori",))
    def march_only(dtree, transform, hi, lo, *, mid_fori):
        RR._MID_FORI = mid_fori
        dirs, cens = RR.device_camera_rays(transform, W, H, cam.fx, cam.fy)
        uniforms = pcg32_uniforms_range(hi, lo, n=R * spp, inc=3).reshape(R, spp)
        dst = RR.make_sorted_dst(uniforms)
        consts, state = RR._init_march(dtree, dirs, cens, dst, opt)
        leafs, cnts = RR._march_schedule(dtree, opt, spp, consts, state,
                                         RR.DEFAULT_SCHEDULE, 8192)
        return jnp.sum(leafs) + jnp.sum(cnts)

    timeit(functools.partial(march_only, mid_fori=False),
           dt, transform, hi, lo, label="march [while mid stages]")
    timeit(functools.partial(march_only, mid_fori=True),
           dt, transform, hi, lo, label="march [fori mid stages]")
    a = march_only(dt, transform, hi, lo, mid_fori=False)
    b = march_only(dt, transform, hi, lo, mid_fori=True)
    print(f"  checksums equal: {float(a) == float(b)}", flush=True)
    print("DONE", flush=True)

if __name__ == "__main__":
    main()
