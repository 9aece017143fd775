"""Headless offline renderer / FPS benchmark CLI.

Reference: renderer/main_headless.cpp (flag surface at :202-223 plus the
common opts at src/opts.cpp:7-42) and its protocol: load poses by dataset
type, load tree, warm up 100 frames, render all poses with per-phase
timing, optionally dump PNGs (`-o`) or raw aux buffers (`--write_buffer`,
bit-compatible `buf_<name>.bin` float32 [8,H,W]), advance the RNG stream
by 2^32 between frames, and report per-phase ms + FPS.

Usage:
  python -m rt_octree_tpu.apps.headless TREE.npz POSES \
      [--dataset blender|tt|llff] [-o OUTDIR] [--write_buffer] \
      [--gnet ts.gnet] [--options opt.json] [--spp N] ...
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional, Sequence

import numpy as np

from ..core.camera import Camera
from ..core.options import RenderOptions
from ..io import n3tree
from ..io.poses import load_poses
from ..render.renderer import Renderer, render_timed
from ..ops.traversal import upload_tree
from ..utils.timer import PhaseTimer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "rtoctree-headless",
        description="Headless PlenOctree regular-tracking renderer (TPU)")
    p.add_argument("file", help="npz file storing octree data")
    p.add_argument("poses", help="pose source: transforms json (blender), "
                   "pose txt dir (tt), or poses_bounds.npy (llff)")
    p.add_argument("-o", "--write_images", default="",
                   help="output directory of images; if empty, DOES NOT "
                        "save (for timing only)")
    p.add_argument("-i", "--intrin", default="",
                   help="intrinsics 4x4 txt; overrides fx/fy")
    p.add_argument("-r", "--reverse_yz", action="store_true",
                   help="use OpenCV camera convention instead of NeRF")
    p.add_argument("--scale", type=float, default=1.0,
                   help="scaling to apply to image")
    p.add_argument("--max_imgs", type=int, default=0,
                   help="max images to render")
    p.add_argument("--options", default="", help="render options json")
    p.add_argument("--dataset", default="blender",
                   choices=["blender", "tt", "llff"])
    p.add_argument("--gnet", "--ts_module", dest="gnet", default="",
                   help="path to compact GuidanceNet (.gnet) artifact")
    p.add_argument("--write_buffer", action="store_true",
                   help="save auxiliary buffers instead of images")
    p.add_argument("--draw", default="",
                   help="npz drawlist file; meshes are rasterized and "
                        "composited (opts.cpp:10-11 / mesh drawlists)")
    p.add_argument("--grid", type=int, default=None, metavar="DEPTH",
                   help="show octree wireframe up to DEPTH")
    p.add_argument("--probe", default="",
                   help="x,y,z lumisphere probe point (draws the overlay)")
    # common opts (opts.cpp:7-42)
    p.add_argument("-w", "--width", type=int, default=800)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--fx", type=float, default=-1.0)
    p.add_argument("--fy", type=float, default=-1.0)
    p.add_argument("--bg", type=float, default=1.0)
    p.add_argument("-s", "--step_size", type=float, default=1e-4)
    p.add_argument("-e", "--stop_thresh", type=float, default=1e-2)
    p.add_argument("-a", "--sigma_thresh", type=float, default=1e-2)
    p.add_argument("--spp", type=int, default=None,
                   help="override spp from options")
    p.add_argument("--no-denoise", action="store_true")
    p.add_argument("--denoise-auto", action="store_true",
                   help="honor the .gnet artifact's denoise_recommended "
                        "advice (a scene-trained net records when the "
                        "measured quality gate shows filtering hurts, "
                        "e.g. hard surfaces near-converged at SPP=6)")
    p.add_argument("--warmup", type=int, default=100,
                   help="warm-up frame count (reference uses 100)")
    p.add_argument("--lut_levels", type=int, default=7)
    p.add_argument("--estimator", choices=("rt", "classic"), default=None,
                   help="override estimator: rt (regular tracking) or "
                        "classic (exponential transmittance, rt.frag)")
    p.add_argument("--profile", default="", metavar="DIR",
                   help="write a jax.profiler trace of the measured "
                        "frames into DIR (view with xprof/tensorboard)")
    p.add_argument("--auto_schedule", action="store_true",
                   help="probe this scene's survivor curve on the loaded "
                        "poses and tune the march compaction schedule "
                        "(replaces the bench-scene-tuned defaults)")
    p.add_argument("--render_scale", type=float, default=1.0,
                   help="fast mode: march at this fraction of the output "
                        "resolution and joint-upsample through the fused "
                        "denoise (output size unchanged; additive TPU "
                        "knob, no reference counterpart -- see PERF.md)")
    return p


def run(argv: Optional[Sequence[str]] = None) -> int:
    args = build_parser().parse_args(argv)

    ps = load_poses(args.dataset, args.poses, width=args.width,
                    height=args.height, reverse_yz=args.reverse_yz)
    width, height, fx, fy = ps.width, ps.height, ps.fx, ps.fy
    if args.fx > 0:
        fx = args.fx
        fy = args.fy if args.fy > 0 else fx
    if args.intrin:
        vals = np.loadtxt(args.intrin).reshape(-1)
        fx, fy = float(vals[0]), float(vals[5])

    tree = n3tree.load(args.file)
    if args.dataset == "llff":
        tree.use_ndc = True
        tree.ndc_width = width
        tree.ndc_height = height
        tree.ndc_focal = fx

    if args.scale != 1.0:
        ow, oh = width, height
        width = int(width * args.scale)
        height = int(height * args.scale)
        fx *= width / ow
        fy *= height / oh

    poses = ps.poses
    basenames = ps.basenames
    if args.max_imgs > 0:
        poses = poses[:args.max_imgs]
        basenames = basenames[:args.max_imgs]
    if len(poses) == 0:
        print("WARNING: No camera poses specified, quitting", file=sys.stderr)
        return 1

    if args.options:
        options = RenderOptions.from_json_file(args.options)
    else:
        options = RenderOptions(
            background_brightness=args.bg, step_size=args.step_size,
            stop_thresh=args.stop_thresh, sigma_thresh=args.sigma_thresh)
    if args.spp is not None:
        options.spp = args.spp
    if args.estimator is not None:
        options.estimator = args.estimator
    if args.no_denoise or not args.gnet:
        options.denoise = False
    if args.grid is not None:
        options.show_grid = True
        options.grid_max_depth = args.grid
    if args.probe:
        options.enable_probe = True
        options.probe = tuple(float(x) for x in args.probe.split(","))

    dt = upload_tree(tree, lut_levels=args.lut_levels)
    kw = {}
    if args.render_scale != 1.0:
        kw["render_scale"] = args.render_scale
    if args.auto_schedule:
        from ..render.schedule import auto_schedule
        probe_poses = poses[:: max(len(poses) // 3, 1)][:3]
        # fast mode marches at the inner resolution -- probe the
        # survivor curve there, not at the output size
        rs = kw.get("render_scale", 1.0)
        iw, ih = max(1, round(width * rs)), max(1, round(height * rs))
        kw["schedule"], kw["shade_cap_div"] = auto_schedule(
            dt, probe_poses, options, fx * (iw / width),
            fy * (ih / height), iw, ih, with_shade_div=True)
        print(f"[rtoctree] auto schedule: {kw['schedule']} "
              f"shade_div={kw['shade_cap_div']}", file=sys.stderr)
    renderer = Renderer(dt, width, height, fx, fy, options=options, **kw)
    if args.gnet:
        renderer.set_denoiser(args.gnet)
        if (args.denoise_auto and options.denoise
                and not renderer.denoise_recommended):
            print("[rtoctree] .gnet advises denoise off for this scene "
                  "(measured quality loss); honoring --denoise-auto",
                  file=sys.stderr)
            options.denoise = False
    if options.show_grid:
        renderer.set_grid_mesh(tree)

    draw_meshes = []
    if args.draw:
        from ..io.mesh import load_drawlist
        draw_meshes = [m for m in load_drawlist(args.draw) if m.visible]

    out_dir = args.write_images
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    # warm-up (main_headless.cpp:470-479)
    timer = PhaseTimer()
    cam = Camera(width, height, fx, fy)

    def render_once(cam):
        if draw_meshes or options.enable_probe:
            from ..utils.timer import T_RENDER, sync
            kw = {}
            if draw_meshes:
                from ..render.raster import rasterize_meshes
                bg = np.full(3, options.background_brightness, np.float32)
                color, depth = rasterize_meshes(draw_meshes, cam,
                                                background=bg)
                kw = dict(mesh_color=color, mesh_depth=depth)
            return render_timed(renderer, cam.transform, timer,
                                profile_dir=args.profile or None,
                                probe=options.enable_probe, **kw)
        return render_timed(renderer, cam.transform, timer,
                            profile_dir=args.profile or None)

    cam.set_pose(poses[0])
    for _ in range(args.warmup):
        render_once(cam)
        renderer.advance_rng()
    timer.reset()

    for i, pose in enumerate(poses):
        cam.set_pose(pose)
        img, aux = render_once(cam)
        renderer.advance_rng()
        if not out_dir:
            continue
        if args.write_buffer:
            buf = np.asarray(aux, np.float32)
            buf.tofile(os.path.join(out_dir, f"buf_{basenames[i]}.bin"))
        else:
            from ..io.images import write_png
            write_png(os.path.join(out_dir, f"{basenames[i]}.png"),
                      np.asarray(img))

    print(timer.report())
    return 0


def main() -> None:
    sys.exit(run())


if __name__ == "__main__":
    main()
