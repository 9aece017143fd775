"""Pose loaders: blender/tt/llff formats + camera conventions."""

import json
import os

import numpy as np
import pytest

from rt_octree_tpu.io import poses as P


def test_blender(tmp_path):
    m = np.eye(4)
    m[:3, 3] = [1, 2, 3]
    meta = {"camera_angle_x": 0.6911,
            "frames": [{"file_path": "./test/r_0",
                        "transform_matrix": m.tolist()}]}
    path = tmp_path / "transforms_test.json"
    path.write_text(json.dumps(meta))
    ps = P.load_blender(str(path))
    assert ps.basenames == ["r_0"]
    # fx = 0.5*W/tan(0.5*angle)
    assert ps.fx == pytest.approx(0.5 * 800 / np.tan(0.5 * 0.6911))
    np.testing.assert_allclose(ps.poses[0], m[:3, :4])


def test_tt_dir(tmp_path):
    pose_dir = tmp_path / "pose"
    os.makedirs(pose_dir)
    m = np.eye(4)
    m[:3, 3] = [0.5, 0, 1]
    np.savetxt(pose_dir / "0_001.txt", m)
    K = np.diag([1200.0, 1150.0, 1.0, 1.0])
    np.savetxt(tmp_path / "intrinsics.txt", K)
    ps = P.load_tt(str(pose_dir))
    assert ps.fx == 1200.0 and ps.fy == 1150.0
    assert ps.width == 1920 and ps.height == 1080
    # OpenCV convention applied by load_poses for tt
    ps2 = P.load_poses("tt", str(pose_dir))
    np.testing.assert_allclose(ps2.poses[0][:, 1], -ps.poses[0][:, 1])
    np.testing.assert_allclose(ps2.poses[0][:, 2], -ps.poses[0][:, 2])
    np.testing.assert_allclose(ps2.poses[0][:, 3], ps.poses[0][:, 3])


def test_tt_multi_matrix_file(tmp_path):
    pose_dir = tmp_path / "pose"
    os.makedirs(pose_dir)
    m1, m2 = np.eye(4), np.eye(4)
    m2[:3, 3] = [1, 1, 1]
    with open(pose_dir / "traj.txt", "w") as f:
        np.savetxt(f, m1)
        np.savetxt(f, m2)
    np.savetxt(tmp_path / "intrinsics.txt", np.diag([1.0, 1, 1, 1]))
    ps = P.load_tt(str(pose_dir))
    assert len(ps.poses) == 2
    assert ps.basenames == ["traj_000000", "traj_000001"]


def _make_llff_pb(n=6):
    rng = np.random.default_rng(0)
    pb = np.zeros((n, 17))
    for i in range(n):
        ang = 2 * np.pi * i / n * 0.1
        # columns: [down, right, back, center, hwf]
        down = np.array([0, -1, 0])
        right = np.array([np.cos(ang), 0, np.sin(ang)])
        back = np.cross(right, down) * -1
        back /= np.linalg.norm(back)
        center = np.array([0.1 * i, 0.05, 1.0 + 0.01 * i])
        m = np.stack([down, right, back, center], axis=1)
        hwf = np.array([756 * 4, 1008 * 4, 800.0 * 4])
        block = np.concatenate([m, hwf[:, None]], axis=1)
        pb[i, :15] = block.reshape(-1)
        pb[i, 15:] = [1.2 + 0.1 * i, 20.0]
    return pb


def test_llff(tmp_path):
    pb = _make_llff_pb()
    path = tmp_path / "poses_bounds.npy"
    np.save(path, pb)
    ps = P.load_llff(str(path))
    assert (ps.width, ps.height) == (1008, 756)
    assert ps.fx == pytest.approx(800.0)
    assert len(ps.poses) == 6
    # recentered: average pose ~ identity rotation
    avg = P.poses_avg(ps.poses)
    np.testing.assert_allclose(avg[:, :3], np.eye(3), atol=1e-5)
    # rotations remain orthonormal
    for p in ps.poses:
        R = p[:, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)


def test_llff_ndc_sidecar(tmp_path):
    from rt_octree_tpu.io import n3tree, synthetic
    tree = synthetic.make_synthetic_tree("shell", depth=3, basis_dim=4)
    tree_path = str(tmp_path / "fern.npz")
    synthetic.save_npz(tree, tree_path)
    np.save(tmp_path / "fern_poses_bounds.npy", _make_llff_pb())
    t2 = n3tree.load(tree_path)
    assert t2.use_ndc
    assert t2.ndc_width == 1008 * 4
    assert t2.ndc_focal == pytest.approx(3200.0)
    np.testing.assert_allclose(np.linalg.norm(t2.ndc_avg_back), 1.0,
                               atol=1e-6)
