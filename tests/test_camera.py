"""Camera drag/pan/zoom state machine (camera.cpp:78-138 semantics)."""

import numpy as np

from rt_octree_tpu.core.camera import Camera


def _make():
    return Camera(width=800, height=600)


def test_pan_translates_center_along_saved_axes():
    cam = _make()
    right0, up0 = cam.v_right.copy(), cam.v_up.copy()
    c0 = cam.center.copy()
    cam.begin_drag(100.0, 100.0, is_pan=True, about_origin=False)
    cam.drag_update(110.0, 105.0)
    scale = -2.0 * cam.movement_speed / 800.0  # max(W, H)
    expect = c0 + 10.0 * scale * right0 - 5.0 * scale * up0
    np.testing.assert_allclose(cam.center, expect, atol=1e-6)
    # back vector untouched by panning
    np.testing.assert_allclose(cam.v_back,
                               [-0.7071068, 0.0, 0.7071068], atol=1e-6)


def test_pan_about_origin_moves_origin_too():
    cam = _make()
    cam.begin_drag(0.0, 0.0, is_pan=True, about_origin=True)
    cam.drag_update(40.0, -20.0)
    shift = cam.center - np.array([-3.55, 0.0, 3.55], np.float32)
    np.testing.assert_allclose(cam.origin, shift, atol=1e-6)


def test_rotate_keeps_orthonormal_frame():
    cam = _make()
    cam.begin_drag(0.0, 0.0, is_pan=False, about_origin=False)
    cam.drag_update(37.0, 12.0)
    T = cam.transform[:, :3]
    np.testing.assert_allclose(T.T @ T, np.eye(3), atol=1e-5)
    assert abs(np.linalg.norm(cam.v_back) - 1.0) < 1e-5
    # rotation changed the view direction
    assert np.linalg.norm(cam.v_back - [-0.7071068, 0.0, 0.7071068]) > 1e-3


def test_rotate_about_origin_preserves_orbit_radius():
    cam = _make()
    r0 = np.linalg.norm(cam.center - cam.origin)
    cam.begin_drag(0.0, 0.0, is_pan=False, about_origin=True)
    cam.drag_update(80.0, 25.0)
    assert abs(np.linalg.norm(cam.center - cam.origin) - r0) < 1e-4
    # view keeps facing through the origin-ish hemisphere
    assert np.dot(cam.v_back, cam.center - cam.origin) > 0


def test_pole_flip_guard_blocks_overshoot():
    cam = _make()
    cam.begin_drag(0.0, 0.0, is_pan=False, about_origin=False)
    back_before = cam.v_back.copy()
    # an absurd vertical drag would tilt past the world-up pole; the
    # state machine must refuse (camera.cpp:107-112)
    cam.drag_update(0.0, 4000.0)
    np.testing.assert_allclose(cam.v_back, back_before, atol=1e-6)


def test_incremental_drag_matches_single_drag():
    a, b = _make(), _make()
    a.begin_drag(0.0, 0.0, is_pan=False, about_origin=True)
    a.drag_update(10.0, 5.0)
    a.drag_update(30.0, 15.0)  # deltas are from drag start, not last event
    b.begin_drag(0.0, 0.0, is_pan=False, about_origin=True)
    b.drag_update(30.0, 15.0)
    np.testing.assert_allclose(a.transform, b.transform, atol=1e-6)


def test_move_during_drag_shifts_drag_anchor():
    cam = _make()
    cam.begin_drag(0.0, 0.0, is_pan=True, about_origin=False)
    cam.move(np.array([1.0, 2.0, 3.0], np.float32))
    c_after_move = cam.center.copy()
    cam.drag_update(0.0, 0.0)  # zero-delta drag must not undo the move
    np.testing.assert_allclose(cam.center, c_after_move, atol=1e-6)
    cam.end_drag()
    assert not cam.is_dragging()


def test_set_pose_then_drag_uses_pose_axes():
    cam = _make()
    pose = np.eye(4)[:3].astype(np.float32)
    pose[:, 3] = [0.0, 0.0, 5.0]
    cam.set_pose(pose)
    cam.begin_drag(0.0, 0.0, is_pan=True, about_origin=False)
    cam.drag_update(100.0, 0.0)
    # right axis of the set pose is +x
    assert abs(cam.center[1]) < 1e-6 and abs(cam.center[2] - 5.0) < 1e-6
    assert cam.center[0] != 0.0
