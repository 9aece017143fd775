"""Camera model and ray generation.

Reference: renderer/src/camera.cpp:26-76 (transform orthonormalization,
projection, default pose), renderer/src/cuda/volrend.cu:24-34
(screen2worlddir: note the reference deliberately does NOT add the usual
half-pixel center offset), camera.hpp:12 (default focal 1111.11).

The camera-to-world transform is stored as a 3x4 float32 matrix whose
columns are [right, up, back, center] -- identical layout to the glm
mat4x3 uploaded to the GPU as 12 floats.
"""

from __future__ import annotations

import dataclasses

import numpy as np

DEFAULT_FOCAL_LENGTH = 1111.11


@dataclasses.dataclass
class Camera:
    width: int = 800
    height: int = 800
    fx: float = DEFAULT_FOCAL_LENGTH
    fy: float = -1.0
    # c2w: columns right, up, back, center
    transform: np.ndarray = None
    center: np.ndarray = None
    v_back: np.ndarray = None
    v_world_up: np.ndarray = None
    origin: np.ndarray = None
    movement_speed: float = 1.0

    def __post_init__(self):
        if self.fx < 0:
            self.fx = DEFAULT_FOCAL_LENGTH
        if self.fy < 0:
            self.fy = self.fx
        if self.center is None:
            self.center = np.array([-3.55, 0.0, 3.55], np.float32)
        if self.v_back is None:
            self.v_back = np.array([-0.7071068, 0.0, 0.7071068], np.float32)
        if self.v_world_up is None:
            self.v_world_up = np.array([0.0, 0.0, 1.0], np.float32)
        if self.origin is None:
            self.origin = np.zeros(3, np.float32)
        if self.transform is None:
            self.update()

    def update(self, transform_from_vecs: bool = True) -> None:
        """Rebuild c2w from {center, v_back, v_world_up} (camera.cpp:47-56)."""
        if transform_from_vecs:
            back = self.v_back / np.linalg.norm(self.v_back)
            right = np.cross(self.v_world_up, back)
            right = right / np.linalg.norm(right)
            up = np.cross(back, right)
            self.transform = np.stack(
                [right, up, back, self.center], axis=1).astype(np.float32)

    def set_pose(self, c2w: np.ndarray) -> None:
        """Set the full 3x4 c2w pose (columns right/up/back/center)."""
        c2w = np.asarray(c2w, np.float32)
        if c2w.shape == (4, 4):
            c2w = c2w[:3, :]
        assert c2w.shape == (3, 4)
        self.transform = np.ascontiguousarray(c2w)
        self.center = self.transform[:, 3].copy()
        self.v_back = self.transform[:, 2].copy()

    @property
    def w2c(self) -> np.ndarray:
        R = self.transform[:, :3]
        t = self.transform[:, 3]
        out = np.zeros((3, 4), np.float32)
        out[:, :3] = R.T
        out[:, 3] = -R.T @ t
        return out


def camera_rays(cam: Camera) -> tuple[np.ndarray, np.ndarray]:
    """Per-pixel world-space (dir, origin) for the full image.

    Matches volrend.cu:24-34: x index is column, y index is row, pixel (0,0)
    at top-left, integer pixel coordinates (no half-pixel offset), looking
    down -z in camera space.
    Returns dirs [H*W, 3] (normalized), origins [3].
    """
    W, H = cam.width, cam.height
    ix = np.arange(W, dtype=np.float32)
    iy = np.arange(H, dtype=np.float32)
    x = (ix[None, :] - 0.5 * W) / cam.fx
    y = -(iy[:, None] - 0.5 * H) / cam.fy
    xyz = np.stack(
        [np.broadcast_to(x, (H, W)), np.broadcast_to(y, (H, W)),
         -np.ones((H, W), np.float32)], axis=-1)
    R = cam.transform[:, :3]  # columns right, up, back
    dirs = xyz.reshape(-1, 3) @ R.T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs.astype(np.float32), cam.transform[:, 3].astype(np.float32)


def rodrigues(aa: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Axis-angle rotation of view dirs (volrend.cu:58-73)."""
    aa = np.asarray(aa, np.float32)
    angle = float(np.linalg.norm(aa))
    if angle < 1e-6:
        return dirs
    k = aa / angle
    cos_a, sin_a = np.cos(angle), np.sin(angle)
    cross = np.cross(np.broadcast_to(k, dirs.shape), dirs)
    dot = dirs @ k
    return (dirs * cos_a + cross * sin_a +
            k[None, :] * dot[:, None] * (1.0 - cos_a)).astype(np.float32)
