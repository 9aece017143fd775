"""Apps layer: mesh/drawlist/OBJ, rasterizer, anim, compress, tools,
probe, wireframe, headless CLI end-to-end."""

import json
import os

import numpy as np
import pytest

from rt_octree_tpu.core.camera import Camera
from rt_octree_tpu.core.options import RenderOptions
from rt_octree_tpu.io import mesh as M
from rt_octree_tpu.io import synthetic


# ---------------------------------------------------------------------------
# mesh + raster
# ---------------------------------------------------------------------------

def test_primitives():
    for m, fs in [(M.cube(), 3), (M.sphere(6, 8), 3),
                  (M.camera_frustum(), 2), (M.line((0, 0, 0), (1, 1, 1)), 2),
                  (M.lattice(4), 1), (M.points(np.zeros((5, 3))), 1)]:
        assert m.vert.shape[1] == 9
        assert m.face_size == fs
        assert m.faces.max(initial=0) < m.n_verts


def test_obj_roundtrip(tmp_path):
    obj = """
v 0 0 0 1 0 0
v 1 0 0 0 1 0
v 0 1 0 0 0 1
v 1 1 0
f 1 2 3
f 2 4 3
"""
    path = tmp_path / "t.obj"
    path.write_text(obj)
    m = M.load_obj(str(path))
    assert m.n_verts == 4
    assert len(m.faces) == 6
    np.testing.assert_allclose(m.vert[0, 3:6], [1, 0, 0])
    # normals estimated (all faces in z=0 plane -> |nz| == 1)
    np.testing.assert_allclose(np.abs(m.vert[:3, 8]), 1.0, atol=1e-5)


def test_obj_offs_sidecar(tmp_path):
    """<mesh>.obj.offs auto-offset: 'tx ty tz [scale]' applied at load
    (main.cpp:448-465); malformed sidecars leave the defaults."""
    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    path = tmp_path / "t.obj"
    path.write_text(obj)

    (tmp_path / "t.obj.offs").write_text("0.5 -1.0 2.0 3.0")
    m = M.load_obj(str(path))
    np.testing.assert_allclose(m.translation, [0.5, -1.0, 2.0])
    assert m.scale == 3.0
    # transform applies translation+scale to world-space verts
    np.testing.assert_allclose(m.transformed_positions()[0],
                               [0.5, -1.0, 2.0], atol=1e-6)

    (tmp_path / "t.obj.offs").write_text("0.5 -1.0 2.0")
    m = M.load_obj(str(path))
    np.testing.assert_allclose(m.translation, [0.5, -1.0, 2.0])
    assert m.scale == 1.0

    (tmp_path / "t.obj.offs").write_text("not a number")
    m = M.load_obj(str(path))
    np.testing.assert_allclose(m.translation, [0, 0, 0])
    assert m.scale == 1.0


def test_drawlist_roundtrip(tmp_path):
    path = str(tmp_path / "cams.draw.npz")
    t = np.array([[0, 0, 1], [1, 0, 1], [2, 0, 1]], np.float64)
    r = np.zeros((3, 3))
    np.savez_compressed(
        path, cameras="camerafrustum", cameras__t=t, cameras__r=r,
        cameras__focal_length=800.0, cameras__connect=1,
        cameras__color=np.array([1.0, 0.5, 0.0]))
    meshes = M.load_drawlist(path)
    assert len(meshes) == 1
    me = meshes[0]
    assert me.face_size == 2
    assert me.n_verts == 15  # 5 verts x 3 frustums
    # translations applied
    np.testing.assert_allclose(me.vert[0, :3], t[0], atol=1e-6)
    np.testing.assert_allclose(me.vert[5, :3], t[1], atol=1e-6)


def test_rasterizer_depth_and_color():
    from rt_octree_tpu.render.raster import rasterize_meshes
    cam = Camera(width=64, height=64, fx=64.0, fy=64.0)
    cam.center = np.array([0.0, 0.0, 2.0], np.float32)
    cam.v_back = np.array([0.0, 0.0, 1.0], np.float32)
    cam.v_world_up = np.array([0.0, 1.0, 0.0], np.float32)
    cam.update()
    cube = M.cube(color=(0.2, 0.9, 0.1))
    cube.unlit = True
    color, depth = rasterize_meshes([cube], cam, background=np.ones(3))
    cy, cx = 32, 32
    assert np.isfinite(depth[cy, cx])
    # front face at z=0.5 -> distance 1.5 from camera at z=2
    assert depth[cy, cx] == pytest.approx(1.5, abs=0.05)
    np.testing.assert_allclose(color[cy, cx], [0.2, 0.9, 0.1], atol=1e-5)
    assert not np.isfinite(depth[0, 0])
    np.testing.assert_allclose(color[0, 0], 1.0)


def test_render_with_mesh_compositing():
    import jax.numpy as jnp
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer
    tree = synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4)
    dt = upload_tree(tree)
    cam = Camera(width=16, height=16, fx=30.0, fy=30.0)
    r = Renderer(dt, 16, 16, cam.fx, cam.fy,
                 options=RenderOptions(spp=2, denoise=False))
    # mesh plane right in front of the camera occludes everything
    depth = np.full((16, 16), 0.05, np.float32)
    col = np.full((16, 16, 3), 0.5, np.float32)
    img, aux = r.render(cam.transform, mesh_color=col, mesh_depth=depth)
    np.testing.assert_allclose(np.asarray(img)[..., :3], 0.5, atol=1e-6)


# ---------------------------------------------------------------------------
# probe + wireframe
# ---------------------------------------------------------------------------

def test_probe_query_and_overlay():
    import jax.numpy as jnp
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.probe import (
        apply_probe_overlay, retrieve_cursor_lumisphere)
    from rt_octree_tpu.core.oracle import query_single_from_root
    tree = synthetic.make_synthetic_tree("shell", depth=4, basis_dim=4)
    dt = upload_tree(tree)
    probe = np.array([0.0, 0.0, 0.6], np.float32)
    coeffs = np.asarray(retrieve_cursor_lumisphere(dt, probe))
    p = tree.offset + tree.scale * probe
    sub, _, _ = query_single_from_root(tree, p.copy())
    np.testing.assert_allclose(
        coeffs, tree.data[sub, :tree.data_dim - 1].astype(np.float32))

    cam = Camera(width=64, height=64)
    img = jnp.zeros((64, 64, 4))
    out = np.asarray(apply_probe_overlay(
        img, dt, cam.transform, jnp.asarray(coeffs), probe_disp_size=20))
    # disc center colored, far corner untouched
    assert out[15, 64 - 15, :3].sum() > 0
    assert out[63, 0, :3].sum() == 0


def test_wireframe():
    from rt_octree_tpu.io.wireframe import gen_wireframe
    tree = synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4)
    verts = gen_wireframe(tree, max_depth=2)
    assert verts.shape[1] == 9
    assert len(verts) % 24 == 0  # 24 vertices (12 edges) per cube
    # all positions within the world-space bounds of the tree
    world = verts[:, :3] * tree.scale + tree.offset
    assert (world >= -1e-4).all() and (world <= 1 + 1e-4).all()


# ---------------------------------------------------------------------------
# anim
# ---------------------------------------------------------------------------

def test_anim_keyframes_roundtrip(tmp_path):
    from rt_octree_tpu.apps import anim
    cam = Camera()
    k0 = anim.AnimKF.from_renderer(cam, RenderOptions(spp=2), duration=0.5)
    cam2 = Camera()
    cam2.center = np.array([3.0, 0.0, 1.0], np.float32)
    cam2.update()
    k1 = anim.AnimKF.from_renderer(cam2, RenderOptions(spp=2))
    path = str(tmp_path / "kf.json")
    anim.save_keyframes(path, [k0, k1], fps=10)
    kfs, fps = anim.load_keyframes(path)
    assert fps == 10 and len(kfs) == 2
    np.testing.assert_allclose(kfs[1].center, cam2.center)

    # spherical interpolation preserves radius continuity
    mid = anim.sphc_interp(k0.center, k1.center, np.zeros(3), 0.5)
    r0 = np.linalg.norm(k0.center)
    r1 = np.linalg.norm(k1.center)
    assert np.linalg.norm(mid) == pytest.approx((r0 + r1) / 2, rel=1e-5)

    camt, optt = anim.interp_keyframes(kfs[0], kfs[1], 0.25)
    assert optt.spp == 2


def test_anim_offline_render(tmp_path):
    from rt_octree_tpu.apps import anim
    calls = []

    def factory(cam, options):
        calls.append(cam.center.copy())
        return np.zeros((8, 8, 4), np.float32)

    cam = Camera()
    k0 = anim.AnimKF.from_renderer(cam, RenderOptions(), duration=0.4)
    k1 = anim.AnimKF.from_renderer(cam, RenderOptions())
    n = anim.render_animation(factory, [k0, k1], fps=10,
                              out_dir=str(tmp_path / "out"), width=8,
                              height=8)
    assert n == 4
    assert len(os.listdir(tmp_path / "out")) == 4


# ---------------------------------------------------------------------------
# compress
# ---------------------------------------------------------------------------

def test_median_cut():
    from rt_octree_tpu.apps.compress import median_cut
    rng = np.random.default_rng(0)
    # two well-separated clusters must map to distinct codes
    pts = np.concatenate([rng.normal(0, 0.01, (500, 3)),
                          rng.normal(5, 0.01, (500, 3))])
    colors, ids = median_cut(pts, bits=4)
    assert set(ids[:500]) != set(ids[500:])
    err = np.abs(colors[ids] - pts).max()
    assert err < 0.1


def test_compress_roundtrip(tmp_path):
    from rt_octree_tpu.apps.compress import compress_tree_dict
    from rt_octree_tpu.io import n3tree
    tree = synthetic.make_synthetic_tree("shell", depth=4, basis_dim=4)
    z = synthetic.tree_to_npz_dict(tree)
    zc = compress_tree_dict(z, bits=8, sigma_thresh=1.0, retain=1)
    assert "quant_colors" in zc and "data" not in zc
    t2 = n3tree.from_npz_dict(zc)
    assert t2.data.shape == tree.data.shape
    # occupied voxels' retained coeff 0 must match exactly; quantized
    # coeffs approximately
    occ = tree.data[:, -1].astype(np.float32) > 1.0
    basis = 4
    for c in range(3):
        np.testing.assert_allclose(
            t2.data[occ, c * basis].astype(np.float32),
            tree.data[occ, c * basis].astype(np.float32), atol=1e-3)
        q_err = np.abs(
            t2.data[occ, c * basis + 1].astype(np.float32) -
            tree.data[occ, c * basis + 1].astype(np.float32))
        assert np.median(q_err) < 0.05
    # sub-threshold sigma zeroed
    assert (t2.data[~occ, -1] == 0).all()


# ---------------------------------------------------------------------------
# tools + cli
# ---------------------------------------------------------------------------

def test_extract_tools(tmp_path):
    from rt_octree_tpu.apps.tools import (
        extract_cams_drawlist, extract_test_poses)
    scene = tmp_path / "lego"
    os.makedirs(scene)
    frames = [{"file_path": f"./test/r_{i}",
               "transform_matrix": np.eye(4).tolist()} for i in range(3)]
    for split in ("test", "train"):
        with open(scene / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)
    assert extract_test_poses(str(tmp_path)) == 1
    assert os.path.exists(scene / "pose" / "r_0.txt")
    assert os.path.exists(scene / "intrinsics.txt")
    K = np.loadtxt(scene / "intrinsics.txt")
    assert K[0, 0] == pytest.approx(400 / np.tan(0.345))

    assert extract_cams_drawlist(str(tmp_path)) == 1
    dl = scene / "lego_cams.draw.npz"
    assert dl.exists()
    meshes = M.load_drawlist(str(dl))
    assert meshes[0].face_size == 2


def test_rotvec_matches_scipy(np_rng):
    from rt_octree_tpu.apps.tools import rotation_matrix_to_rotvec
    from scipy.spatial.transform import Rotation
    R = Rotation.random(16, random_state=0)
    got = rotation_matrix_to_rotvec(R.as_matrix())
    np.testing.assert_allclose(got, R.as_rotvec(), atol=1e-6)


def test_headless_cli_end_to_end(tmp_path):
    """Full pipeline through the CLI: synthetic tree + blender poses ->
    PNGs and bit-compatible aux dumps."""
    from rt_octree_tpu.apps.headless import run
    from rt_octree_tpu.io.images import read_aux_buffer

    tree = synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4)
    tree_path = str(tmp_path / "tree.npz")
    synthetic.save_npz(tree, tree_path)
    poses = {"camera_angle_x": 0.8, "frames": [
        {"file_path": "./test/r_0",
         "transform_matrix": Camera().transform.tolist() + [[0, 0, 0, 1]]},
    ]}
    poses_path = str(tmp_path / "transforms_test.json")
    with open(poses_path, "w") as f:
        json.dump(poses, f)

    out_dir = str(tmp_path / "out")
    rc = run([tree_path, poses_path, "-o", out_dir, "-w", "16",
              "--height", "16", "--spp", "2", "--warmup", "1",
              "--lut_levels", "2"])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "r_0.png"))

    rc = run([tree_path, poses_path, "-o", out_dir, "--write_buffer",
              "-w", "16", "--height", "16", "--spp", "2", "--warmup", "0",
              "--lut_levels", "2"])
    assert rc == 0
    aux = read_aux_buffer(os.path.join(out_dir, "buf_r_0.bin"), 16, 16)
    assert aux.shape == (8, 16, 16)
    np.testing.assert_allclose(aux[4:], aux[:4] ** 2, atol=1e-6)

    # fast mode: march at half res, output image size unchanged
    out_fast = str(tmp_path / "out_fast")
    rc = run([tree_path, poses_path, "-o", out_fast,
              "-w", "16", "--height", "16", "--spp", "2", "--warmup", "0",
              "--lut_levels", "2", "--render_scale", "0.5"])
    assert rc == 0
    from rt_octree_tpu.io.images import read_png
    img = read_png(os.path.join(out_fast, "r_0.png"))
    assert img.shape[:2] == (16, 16)


def test_cli_dispatcher(capsys):
    from rt_octree_tpu.apps.cli import main
    assert main(["--help"]) == 0
    assert main(["bogus"]) == 2


def test_render_with_probe_and_grid():
    from rt_octree_tpu.ops.traversal import upload_tree
    from rt_octree_tpu.render.renderer import Renderer
    tree = synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4)
    dt = upload_tree(tree)
    cam = Camera(width=32, height=32, fx=50.0, fy=50.0)
    opt = RenderOptions(spp=1, denoise=False, enable_probe=True,
                        probe=(0.0, 0.0, 0.6), probe_disp_size=10,
                        show_grid=True, grid_max_depth=1)
    r = Renderer(dt, 32, 32, cam.fx, cam.fy, options=opt)
    r.set_grid_mesh(tree)
    img, aux = r.render_with_probe(cam.transform)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    # grid wireframe must darken some background pixels (blue lines)
    assert (img[..., 2] != img[..., 0]).any() or (img[..., :3] < 1).any()


def test_headless_with_drawlist_and_grid(tmp_path):
    from rt_octree_tpu.apps.headless import run
    tree = synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4)
    tree_path = str(tmp_path / "tree.npz")
    synthetic.save_npz(tree, tree_path)
    poses = {"camera_angle_x": 0.8, "frames": [
        {"file_path": "./test/r_0",
         "transform_matrix": Camera().transform.tolist() + [[0, 0, 0, 1]]}]}
    poses_path = str(tmp_path / "transforms_test.json")
    with open(poses_path, "w") as f:
        json.dump(poses, f)
    dl = str(tmp_path / "d.draw.npz")
    np.savez_compressed(dl, marker="cube",
                        marker__color=np.array([0.9, 0.1, 0.1]),
                        marker__scale=0.4)
    out_dir = str(tmp_path / "out")
    rc = run([tree_path, poses_path, "-o", out_dir, "-w", "16",
              "--height", "16", "--spp", "1", "--warmup", "0",
              "--lut_levels", "2", "--draw", dl, "--grid", "1",
              "--probe", "0,0,0.6"])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "r_0.png"))


def test_train_export_render_roundtrip(tmp_path):
    """The full contract loop: render buffers -> train denoiser ->
    compact export -> headless render consumes the artifact."""
    import imageio.v2 as imageio
    from rt_octree_tpu.apps.headless import run
    from rt_octree_tpu.train.config import parse_args
    from rt_octree_tpu.train.dataset import BlenderDataset, DatasetConfig
    from rt_octree_tpu.train.logger import BaseLogger
    from rt_octree_tpu.train.runner import Runner

    # scene + poses
    tree = synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4)
    tree_path = str(tmp_path / "tree.npz")
    synthetic.save_npz(tree, tree_path)
    frames = [{"file_path": f"./test/r_{i}",
               "transform_matrix": Camera().transform.tolist() +
               [[0, 0, 0, 1]]} for i in range(2)]
    meta = {"camera_angle_x": 0.8, "frames": frames}
    data_dir = tmp_path / "scene"
    for split in ("train", "test"):
        os.makedirs(data_dir / split, exist_ok=True)
        with open(data_dir / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)

    # 1) dump aux buffers via the CLI (the --write_buffer protocol)
    for split in ("train", "test"):
        rc = run([tree_path, str(data_dir / f"transforms_{split}.json"),
                  "-o", str(data_dir / "spp_2" / split), "--write_buffer",
                  "-w", "20", "--height", "20", "--spp", "2",
                  "--warmup", "0", "--lut_levels", "2"])
        assert rc == 0
        # GT images (use the clean-ish render itself as stand-in GT)
        for i in range(2):
            buf = np.fromfile(
                data_dir / "spp_2" / split / f"buf_r_{i}.bin",
                dtype=np.float32).reshape(8, 20, 20)
            img = (np.clip(buf[:3].transpose(1, 2, 0), 0, 1) * 255
                   ).astype(np.uint8)
            imageio.imwrite(data_dir / split / f"r_{i}.png", img)

    # 2) train two epochs + export
    args = parse_args([
        "--task", "train", "--data_dir", str(data_dir),
        "--logs_root", str(tmp_path / "logs"), "--exp_name", "e2e",
        "--dataset_type", "blender", "--spp", "2", "--nx", "2", "--ny", "2",
        "--mid_channels", "8", "--num_layers", "2", "--num_branches", "2",
        "--kernel_levels", "2", "--in_channels", "8", "--lr", "0.001",
        "--epochs", "2", "--batch_size", "4", "--i_save", "2",
        "--i_test", "100"])
    ds = BlenderDataset(DatasetConfig(
        data_dir=str(data_dir), dataset_type="blender", spp=2, nx=2, ny=2))
    Runner(args, dataset=ds, logger=BaseLogger(args)).train()
    gnet = os.path.join(args.work_dir, "ts_000002.gnet")
    assert os.path.exists(gnet)

    # 3) render with the trained denoiser through the CLI
    out_dir = str(tmp_path / "final")
    rc = run([tree_path, str(data_dir / "transforms_test.json"),
              "-o", out_dir, "-w", "20", "--height", "20", "--spp", "2",
              "--warmup", "0", "--lut_levels", "2", "--gnet", gnet])
    assert rc == 0
    img = imageio.imread(os.path.join(out_dir, "r_0.png"))
    assert img.shape[:2] == (20, 20)


def test_web_viewer_end_to_end(tmp_path):
    """Drive the interactive viewer over HTTP: page, frame, drag events,
    option changes (the reference GUI/web surface, main.cpp:238-261 +
    web/main_web.cpp, reinterpreted as server-side TPU rendering)."""
    import json
    import threading
    import urllib.request

    from rt_octree_tpu.apps.viewer import ViewerState, make_handler
    from rt_octree_tpu.io import synthetic
    from http.server import ThreadingHTTPServer

    tree_path = str(tmp_path / "tree.npz")
    synthetic.save_npz(
        synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4),
        tree_path)
    state = ViewerState(tree_path, width=24, height=24, lut_levels=0,
                        spp=1)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(f"{base}/", timeout=120).read()
        assert b"rt-octree-tpu" in page
        png1 = urllib.request.urlopen(f"{base}/frame.png", timeout=600
                                      ).read()
        assert png1[:4] == b"\x89PNG"

        def post(ev):
            req = urllib.request.Request(
                f"{base}/event", data=json.dumps(ev).encode(),
                method="POST")
            urllib.request.urlopen(req, timeout=600).read()

        post({"type": "begin_drag", "x": 5, "y": 5, "pan": False,
              "about_origin": True})
        post({"type": "drag_update", "x": 15, "y": 9})
        post({"type": "end_drag"})
        png2 = urllib.request.urlopen(f"{base}/frame.png", timeout=600
                                      ).read()
        assert png2 != png1  # the orbit moved the camera
        post({"type": "options", "spp": 2, "denoise": False,
              "estimator": "classic", "bg": 0.5, "show_grid": False})
        st = json.loads(urllib.request.urlopen(f"{base}/state",
                                               timeout=120).read())
        assert st["options"]["spp"] == 2
        assert st["options"]["estimator"] == "classic"
        png3 = urllib.request.urlopen(f"{base}/frame.png", timeout=600
                                      ).read()
        assert png3[:4] == b"\x89PNG"
        assert st["frames"] >= 2

        # -- visualization panel (main.cpp:287-325): each control changes
        #    the frame --
        def frame():
            return urllib.request.urlopen(f"{base}/frame.png",
                                          timeout=600).read()

        post({"type": "options", "render_bbox": [0.3, 0.3, 0.3,
                                                 0.7, 0.7, 0.7]})
        png_bbox = frame()
        assert png_bbox != png3
        post({"type": "options", "render_bbox": [0, 0, 0, 1, 1, 1],
              "basis_minmax": [0, 0]})
        png_bmm = frame()
        assert png_bmm != png_bbox
        post({"type": "options", "basis_minmax": [0, 24],
              "rot_dirs": [0.0, 0.9, 0.0]})
        png_rot = frame()
        assert png_rot != png_bmm
        post({"type": "options", "rot_dirs": [0.0, 0.0, 0.0]})

        # -- probe inspector (main.cpp:401-437) --
        post({"type": "options", "enable_probe": True,
              "probe": [0.0, 0.0, 0.5], "probe_disp_size": 8})
        png_probe = frame()
        assert png_probe != png_rot
        post({"type": "options", "enable_probe": False})

        # -- keyboard navigation --
        post({"type": "key", "key": "w", "fast": False})
        st2 = json.loads(urllib.request.urlopen(f"{base}/state",
                                                timeout=120).read())
        assert st2["center"] != st["center"]

        # -- mesh load + visibility (main.cpp:439-465) --
        # triangle IN FRONT of the volume (the narrow-FOV test camera
        # sees the opaque shell everywhere, so only the depth clip is
        # observable): plane z=2.5 sits between camera (~z 4) and shell
        obj = tmp_path / "tri.obj"
        obj.write_text("v -6 -6 2.5 1 0 0\nv 6 -6 2.5 1 0 0\n"
                       "v 0 6 2.5 1 0 0\nf 1 2 3\n")
        png_nomesh = frame()
        post({"type": "load_mesh", "path": str(obj)})
        st3 = json.loads(urllib.request.urlopen(f"{base}/state",
                                                timeout=120).read())
        assert len(st3["meshes"]) == 1
        png_mesh = frame()
        assert png_mesh != png_nomesh
        post({"type": "mesh_vis", "index": 0, "visible": False})
        post({"type": "clear_meshes"})

        # -- tree load-at-runtime (main_web.cpp load_local) --
        tree2 = tmp_path / "tree2.npz"
        synthetic.save_npz(
            synthetic.make_synthetic_tree("blobs", depth=3, basis_dim=1),
            str(tree2))
        png_before_load = frame()
        post({"type": "load_tree", "path": str(tree2)})
        png_after_load = frame()
        assert png_after_load != png_before_load
        req = urllib.request.Request(
            f"{base}/event", data=json.dumps(
                {"type": "load_tree", "path": "/no/such.npz"}).encode(),
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=120)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # -- invalid option: 400, live options untouched --
        req = urllib.request.Request(
            f"{base}/event", data=json.dumps(
                {"type": "options", "spp": 5}).encode(), method="POST")
        try:
            urllib.request.urlopen(req, timeout=120)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        st4 = json.loads(urllib.request.urlopen(f"{base}/state",
                                                timeout=120).read())
        assert st4["options"]["spp"] == 2  # unchanged
        assert frame()[:4] == b"\x89PNG"  # renderer still healthy

        # -- fast mode (render_scale): renderer rebuilds around the
        #    inner march resolution, output size unchanged --
        post({"type": "options", "render_scale": 0.5})
        st5 = json.loads(urllib.request.urlopen(f"{base}/state",
                                                timeout=120).read())
        assert st5["render_scale"] == 0.5
        assert state.renderer.inner_width == 12
        assert frame()[:4] == b"\x89PNG"
        req = urllib.request.Request(
            f"{base}/event", data=json.dumps(
                {"type": "options", "render_scale": 0}).encode(),
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=120)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        post({"type": "options", "render_scale": 1.0})
        assert state.renderer.inner_width == 24
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_web_viewer_remote_load(tmp_path):
    """load_remote over HTTP with fetch progress (main_web.cpp:139-171,
    276-295 + the report_progress protocol): trees and meshes load from
    URLs with extension auto-dispatch; failures surface via /state."""
    import functools
    import json
    import threading
    import time
    import urllib.request
    from http.server import (SimpleHTTPRequestHandler,
                             ThreadingHTTPServer)

    from rt_octree_tpu.apps.viewer import ViewerState, make_handler
    from rt_octree_tpu.io import synthetic

    # a static file server standing in for the remote host
    files = tmp_path / "remote"
    files.mkdir()
    synthetic.save_npz(
        synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4),
        str(files / "tree.npz"))
    synthetic.save_npz(
        synthetic.make_synthetic_tree("blobs", depth=3, basis_dim=1),
        str(files / "tree2.npz"))
    (files / "tri.obj").write_text(
        "v -6 -6 2.5 1 0 0\nv 6 -6 2.5 1 0 0\nv 0 6 2.5 1 0 0\nf 1 2 3\n")
    fsrv = ThreadingHTTPServer(
        ("127.0.0.1", 0), functools.partial(
            SimpleHTTPRequestHandler, directory=str(files)))
    furl = f"http://127.0.0.1:{fsrv.server_address[1]}"
    threading.Thread(target=fsrv.serve_forever, daemon=True).start()

    state = ViewerState(str(files / "tree.npz"), width=24, height=24,
                        lut_levels=0, spp=1)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def post(ev):
            req = urllib.request.Request(
                f"{base}/event", data=json.dumps(ev).encode(),
                method="POST")
            urllib.request.urlopen(req, timeout=600).read()

        def get_state():
            return json.loads(urllib.request.urlopen(
                f"{base}/state", timeout=120).read())

        def wait_load(timeout=600.0):
            t0 = time.time()
            while time.time() - t0 < timeout:
                st = get_state()
                if st["load_progress"] > 100 or st["load_progress"] < 0:
                    return st
                time.sleep(0.1)
            raise AssertionError("remote load timed out")

        def frame():
            return urllib.request.urlopen(f"{base}/frame.png",
                                          timeout=600).read()

        png0 = frame()

        # auto-dispatch: .obj URL -> mesh
        post({"type": "load_remote", "url": f"{furl}/tri.obj"})
        st = wait_load()
        assert st["load_progress"] == 101.0 and st["load_error"] == ""
        st = get_state()
        assert len(st["meshes"]) == 1 and st["meshes"][0]["name"]
        png_mesh = frame()
        assert png_mesh != png0
        post({"type": "clear_meshes"})

        # auto-dispatch: other URL -> octree (swaps the scene)
        post({"type": "load_remote", "url": f"{furl}/tree2.npz"})
        st = wait_load()
        assert st["load_progress"] == 101.0 and st["load_error"] == ""
        png_tree2 = frame()
        assert png_tree2 != png0

        # the load_tree panel event accepts URLs too
        post({"type": "load_tree", "path": f"{furl}/tree.npz"})
        assert wait_load()["load_progress"] == 101.0

        # a failed fetch surfaces the error without breaking the viewer
        post({"type": "load_remote", "url": f"{furl}/missing.npz"})
        st = wait_load()
        assert st["load_progress"] == -1.0
        assert "missing.npz" in st["load_error"]
        assert frame()[:4] == b"\x89PNG"
    finally:
        httpd.shutdown()
        httpd.server_close()
        fsrv.shutdown()
        fsrv.server_close()


def test_web_viewer_anim_editor(tmp_path):
    """The keyframe animation editor surface (main_anim.cpp:350-925):
    add/set/goto/edit/delete keyframes from live state, timeline seek,
    save/load JSON, and the offline PNG export with progress polling."""
    import json
    import threading
    import time
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    import imageio.v2 as imageio

    from rt_octree_tpu.apps.viewer import ViewerState, make_handler
    from rt_octree_tpu.io import synthetic

    tree_path = str(tmp_path / "tree.npz")
    synthetic.save_npz(
        synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4),
        tree_path)
    state = ViewerState(tree_path, width=24, height=24, lut_levels=0,
                        spp=1)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def post(ev):
            req = urllib.request.Request(
                f"{base}/event", data=json.dumps(ev).encode(),
                method="POST")
            urllib.request.urlopen(req, timeout=600).read()

        def get_state():
            return json.loads(urllib.request.urlopen(
                f"{base}/state", timeout=120).read())

        def frame():
            return urllib.request.urlopen(f"{base}/frame.png",
                                          timeout=600).read()

        # keyframe 0 at the start pose; keyframe 1 after an orbit drag
        post({"type": "anim_add", "duration": 0.2, "spherical": True,
              "loops": 0})
        post({"type": "begin_drag", "x": 4, "y": 4, "pan": False,
              "about_origin": True})
        post({"type": "drag_update", "x": 18, "y": 10})
        post({"type": "end_drag"})
        post({"type": "anim_add", "duration": 0.2})
        st = get_state()
        assert len(st["anim"]["keyframes"]) == 2
        assert st["anim"]["keyframes"][0]["duration"] == 0.2
        center_at_kf1 = st["center"]

        # seek to the midpoint: camera moves off both keyframes
        post({"type": "anim_seek", "t": 0.5})
        mid = get_state()["center"]
        assert mid != center_at_kf1
        png_mid = frame()

        # goto restores keyframe 1's exact pose
        post({"type": "anim_goto", "index": 1})
        assert get_state()["center"] == center_at_kf1
        assert frame() != png_mid

        # edit + set + delete
        post({"type": "anim_edit", "index": 0, "duration": 0.3,
              "loops": 1})
        st = get_state()
        assert st["anim"]["keyframes"][0]["duration"] == 0.3
        assert st["anim"]["keyframes"][0]["loops"] == 1
        post({"type": "anim_edit", "index": 0, "duration": 0.2,
              "loops": 0})
        post({"type": "anim_set", "index": 1})  # refresh from live state
        post({"type": "anim_add", "duration": 1.0})
        post({"type": "anim_del", "index": 2})
        assert len(get_state()["anim"]["keyframes"]) == 2

        # save / load round-trip
        kf_json = str(tmp_path / "kf.json")
        post({"type": "anim_fps", "fps": 10})
        post({"type": "anim_save", "path": kf_json})
        assert json.load(open(kf_json))["fps"] == 10
        post({"type": "anim_load", "path": kf_json})
        assert len(get_state()["anim"]["keyframes"]) == 2

        # offline export: 0.2 s at 10 fps = 2 frames, polled to done
        out_dir = str(tmp_path / "anim_out")
        post({"type": "anim_render", "out_dir": out_dir})
        t0 = time.time()
        while time.time() - t0 < 600:
            p = get_state()["anim"]["progress"]
            if p > 100 or p < 0:
                break
            time.sleep(0.1)
        st = get_state()
        assert st["anim"]["progress"] == 101.0, st["anim"]["error"]
        img = imageio.imread(os.path.join(out_dir, "000000.png"))
        assert img.shape[:2] == (24, 24)
        assert os.path.exists(os.path.join(out_dir, "000001.png"))

        # -- keyframed mesh manipulation (main_anim.cpp MeshState) --
        # a cube whose translation differs between two keyframes lerps
        # across the timeline and spins a full turn via anim_rotate_all
        post({"type": "add_primitive", "kind": "cube"})
        post({"type": "mesh_edit", "index": 0,
              "translation": [0.0, 0.0, 1.0]})
        post({"type": "anim_set", "index": 0})
        post({"type": "mesh_edit", "index": 0,
              "translation": [1.0, 0.0, 1.0]})
        post({"type": "anim_set", "index": 1})
        post({"type": "anim_rotate_all", "index": 0})
        post({"type": "anim_seek", "t": 0.5})
        st = get_state()
        m = st["meshes"][0]
        assert abs(m["translation"][0] - 0.5) < 1e-5
        assert abs(m["rotation"][2] - np.pi) < 1e-4  # half the extra turn
        post({"type": "anim_goto", "index": 0})
        m = get_state()["meshes"][0]
        assert abs(m["translation"][0]) < 1e-6
        post({"type": "mesh_del", "index": 0})
        assert len(get_state()["meshes"]) == 0

        # validation: bad index / too-few keyframes -> HTTP 400
        for bad in ({"type": "anim_goto", "index": 7},
                    {"type": "anim_edit", "index": 0, "duration": -1},
                    {"type": "anim_render", "out_dir": ""}):
            req = urllib.request.Request(
                f"{base}/event", data=json.dumps(bad).encode(),
                method="POST")
            try:
                urllib.request.urlopen(req, timeout=120)
                assert False, f"expected HTTP 400 for {bad}"
            except urllib.error.HTTPError as e:
                assert e.code == 400
        assert frame()[:4] == b"\x89PNG"  # editor errors never wedge it
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_cli_render_tt_dataset_e2e(tmp_path):
    """Headless CLI over a TanksAndTemples-style pose dir (intrinsics.txt
    + pose/*.txt, OpenCV convention -- main_headless.cpp:273-297)."""
    import subprocess
    import sys

    from rt_octree_tpu.io import synthetic

    tree_path = str(tmp_path / "tree.npz")
    synthetic.save_npz(
        synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4),
        tree_path)
    pose_dir = tmp_path / "pose"
    pose_dir.mkdir()
    m = np.eye(4)
    m[:3, 3] = [0.0, 0.0, -2.5]  # OpenCV looks +z; flipped by convention
    np.savetxt(pose_dir / "1_000.txt", m)
    np.savetxt(tmp_path / "intrinsics.txt", np.diag([60.0, 60.0, 1, 1]))
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "rt_octree_tpu.apps.cli", "render",
         tree_path, str(pose_dir), "--dataset", "tt", "--scale",
         str(16 / 1920), "--warmup", "0", "--spp", "1", "--lut_levels",
         "0", "-o", str(out)],
        capture_output=True, text=True, timeout=1200,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = list(out.glob("*.png"))
    assert len(pngs) == 1


def test_cli_render_llff_dataset_e2e(tmp_path):
    """Headless CLI over an LLFF poses_bounds.npy (factor-4 resolution,
    recentering, NDC rays -- main_headless.cpp:298-370)."""
    import subprocess
    import sys

    from tests.test_poses import _make_llff_pb
    from rt_octree_tpu.io import synthetic

    tree_path = str(tmp_path / "tree.npz")
    synthetic.save_npz(
        synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4),
        tree_path)
    np.save(tmp_path / "poses_bounds.npy", _make_llff_pb())
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "rt_octree_tpu.apps.cli", "render",
         tree_path, str(tmp_path / "poses_bounds.npy"), "--dataset",
         "llff", "--scale", str(16 / 1008), "--warmup", "0", "--spp",
         "1", "--max_imgs", "2", "--lut_levels", "0", "-o", str(out)],
        capture_output=True, text=True, timeout=1200,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = list(out.glob("*.png"))
    assert len(pngs) == 2


def test_quality_kit_dataset_e2e(tmp_path):
    """The denoiser quality-evidence chain end-to-end at tiny scale:
    tools/make_quality_dataset.py builds a held-out GT kit (classic
    converged GT + SPP=6 aux dumps, the reference's buf_*.bin protocol,
    main_headless.cpp:512-523), and bench.quality_report consumes it,
    reporting PSNR/PSNR_obj/SSIM for noisy and denoised renders."""
    import subprocess
    import sys
    import textwrap

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = tmp_path / "cache"
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "RT_BENCH_CACHE": str(cache), "RT_BENCH_DEPTH": "5",
           "QD_SCENE": "solid", "QD_SPLITS": "test", "QD_TEST": "1",
           # the uniform-protocol gate asserts poses == RT_BENCH_QPOSES
           # (default 8); this tiny kit has exactly one pose
           "RT_BENCH_QPOSES": "1",
           "QD_RES": "64"}
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools",
                                      "make_quality_dataset.py")],
        capture_output=True, text=True, timeout=1200, cwd=root, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    kit = cache / "quality_ds_solid"
    assert (kit / "transforms_test.json").exists()
    assert (kit / "test" / "r_0.png").exists()
    buf = kit / "spp_6" / "test" / "buf_r_0.bin"
    assert buf.stat().st_size == 8 * 64 * 64 * 4

    script = textwrap.dedent("""
        import json, os, sys
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, %r)
        import bench
        from rt_octree_tpu.core.camera import Camera
        from rt_octree_tpu.core.options import RenderOptions
        from rt_octree_tpu.io import n3tree
        from rt_octree_tpu.models.guidance_net import (
            GuidanceNetConfig, compact_params, init_params)
        from rt_octree_tpu.ops.traversal import upload_tree
        from rt_octree_tpu.render.renderer import Renderer
        tree = n3tree.load(os.path.join(%r, "solid_d5_sh9.npz"))
        dt = upload_tree(tree, lut_levels=5)
        cam = Camera(width=64, height=64)
        r = Renderer(dt, 64, 64, cam.fx, cam.fy,
                     options=RenderOptions(spp=6, denoise=True))
        cfg = GuidanceNetConfig()
        r.set_denoiser(cfg, compact_params(
            cfg, init_params(cfg, jax.random.PRNGKey(0))))
        q = bench.quality_report(r, [%r], "kit-e2e")
        print("QJSON:" + json.dumps(q))
    """) % (root, str(cache), str(kit))
    r2 = subprocess.run([sys.executable, "-c", script],
                        capture_output=True, text=True, timeout=1200,
                        cwd=root, env=env)
    assert r2.returncode == 0, (r2.stdout[-2000:], r2.stderr[-2000:])
    line = [l for l in r2.stdout.splitlines() if l.startswith("QJSON:")]
    assert line, r2.stdout[-2000:]
    q = json.loads(line[0][len("QJSON:"):])
    assert q["poses"] == 1
    for mode in ("noisy", "denoised"):
        assert np.isfinite(q[mode]["psnr"])
        assert np.isfinite(q[mode]["psnr_obj"])
        assert 0.0 < q[mode]["ssim"] <= 1.0
    # the noisy SPP=6 render against the classic converged GT must be in
    # a sane PSNR range (it is the signal the denoiser trains on)
    assert q["noisy"]["psnr"] > 15.0


def test_fast_kit_dataset_e2e(tmp_path):
    """The fast-mode distillation chain end-to-end at tiny scale:
    tools/make_fast_kit.py builds a kit (fast-mode aux bufs in, teacher
    frames as train targets, real-GT kit as the test anchor) and the
    canonical training protocol runs on it and exports a .gnet."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = tmp_path / "cache"
    base_env = {**os.environ, "JAX_PLATFORMS": "cpu",
                "RT_BENCH_CACHE": str(cache), "RT_BENCH_DEPTH": "5"}

    # 1. a tiny REAL-GT kit (classic converged GT, test split only)
    env = {**base_env, "QD_SCENE": "shell", "QD_GT_ONLY": "1",
           "QD_SPLITS": "test", "QD_TEST": "1", "QD_RES": "64"}
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools",
                                      "make_quality_dataset.py")],
        capture_output=True, text=True, timeout=1200, cwd=root, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    gt_kit = cache / "quality_ds"
    assert (gt_kit / "test" / "r_0.png").exists()

    # 2. a teacher artifact in the kit (random init is fine at e2e scale)
    from rt_octree_tpu.models.guidance_net import (
        GuidanceNetConfig, compact_and_export, init_params)
    import jax
    cfg = GuidanceNetConfig()
    compact_and_export(cfg, init_params(cfg, jax.random.PRNGKey(0)),
                       str(gt_kit / "trained.gnet"))

    # 3. the fast-mode distillation kit against that GT kit
    out_kit = tmp_path / "fast_kit"
    env = {**base_env, "QD_GT_KIT": str(gt_kit), "QD_OUT": str(out_kit),
           "QD_RES": "64", "QD_TRAIN": "1", "QD_FAST_SCALE": "0.5"}
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "make_fast_kit.py")],
        capture_output=True, text=True, timeout=1200, cwd=root, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert (out_kit / "transforms_train.json").exists()
    assert (out_kit / "transforms_test.json").exists()
    assert (out_kit / "train" / "r_0.png").exists()  # teacher frame
    # test GT is the REAL-GT kit's png, copied verbatim
    gt_src = (gt_kit / "test" / "r_0.png").read_bytes()
    assert (out_kit / "test" / "r_0.png").read_bytes() == gt_src
    for split in ("train", "test"):
        buf = out_kit / "spp_6" / split / "buf_r_0.bin"
        assert buf.stat().st_size == 8 * 64 * 64 * 4  # full-res layout

    # 4. the canonical training protocol consumes it and exports
    r = subprocess.run(
        [sys.executable, "-m", "rt_octree_tpu.train.main",
         "--config", os.path.join(root, "configs", "blender.txt"),
         "--task", "train", "--data_dir", str(out_kit),
         "--logs_root", str(tmp_path / "logs"), "--exp_name", "fast",
         "--epochs", "2", "--i_test", "2", "--i_save", "2",
         "--nx", "4", "--ny", "4"],  # 16x16 slices of the 64x64 frames
        capture_output=True, text=True, timeout=1200, cwd=root,
        env=base_env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    work = tmp_path / "logs" / "fast"
    assert list(work.glob("ts_*.gnet")), list(work.iterdir())
