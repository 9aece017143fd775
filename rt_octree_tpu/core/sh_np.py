"""NumPy spherical-basis evaluation (oracle side).

Reference: renderer/include/volrend/internal/lumisphere.hpp:8-91.
SH coefficients from github.com/google/spherical-harmonics.
"""

from __future__ import annotations

import numpy as np

from ..io.n3tree import BasisFormat

SH_C0 = 0.28209479177387814


def eval_sh_basis_np(basis_dim: int, dirs: np.ndarray) -> np.ndarray:
    """dirs [..., 3] (unit) -> [..., basis_dim]."""
    shape = dirs.shape[:-1]
    out = np.zeros(shape + (basis_dim,), np.float32)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out[..., 0] = SH_C0
    if basis_dim >= 4:
        out[..., 1] = -0.4886025119029199 * y
        out[..., 2] = 0.4886025119029199 * z
        out[..., 3] = -0.4886025119029199 * x
    if basis_dim >= 9:
        out[..., 4] = 1.0925484305920792 * xy
        out[..., 5] = -1.0925484305920792 * yz
        out[..., 6] = 0.31539156525252005 * (2.0 * zz - xx - yy)
        out[..., 7] = -1.0925484305920792 * xz
        out[..., 8] = 0.5462742152960396 * (xx - yy)
    if basis_dim >= 16:
        out[..., 9] = -0.5900435899266435 * y * (3 * xx - yy)
        out[..., 10] = 2.890611442640554 * xy * z
        out[..., 11] = -0.4570457994644658 * y * (4 * zz - xx - yy)
        out[..., 12] = 0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy)
        out[..., 13] = -0.4570457994644658 * x * (4 * zz - xx - yy)
        out[..., 14] = 1.445305721320277 * z * (xx - yy)
        out[..., 15] = -0.5900435899266435 * x * (xx - 3 * yy)
    if basis_dim >= 25:
        out[..., 16] = 2.5033429417967046 * xy * (xx - yy)
        out[..., 17] = -1.7701307697799304 * yz * (3 * xx - yy)
        out[..., 18] = 0.9461746957575601 * xy * (7 * zz - 1.0)
        out[..., 19] = -0.6690465435572892 * yz * (7 * zz - 3.0)
        out[..., 20] = 0.10578554691520431 * (zz * (35 * zz - 30) + 3)
        out[..., 21] = -0.6690465435572892 * xz * (7 * zz - 3)
        out[..., 22] = 0.47308734787878004 * (xx - yy) * (7 * zz - 1.0)
        out[..., 23] = -1.7701307697799304 * xz * (xx - 3 * yy)
        out[..., 24] = 0.6258357354491761 * (
            xx * (xx - 3 * yy) - yy * (3 * xx - yy))
    return out


def eval_sg_basis_np(basis_dim: int, extra: np.ndarray,
                     dirs: np.ndarray) -> np.ndarray:
    """Spherical gaussians: extra packs [lambda, mu(3)] x basis_dim."""
    p = extra.reshape(basis_dim, 4)
    dots = dirs @ p[:, 1:4].T  # [..., basis_dim]
    return (np.exp(p[:, 0] * (dots - 1.0)) / basis_dim).astype(np.float32)


def eval_asg_basis_np(basis_dim: int, extra: np.ndarray,
                      dirs: np.ndarray) -> np.ndarray:
    """Anisotropic SG (UNTESTED in reference too): extra packs
    [a, b, mu_x(3)... layout stride 11] per basis fn."""
    p = extra.reshape(basis_dim, 11)
    mu_x = p[:, 2:5]
    mu_y = p[:, 5:8]
    mu_z = p[:, 8:11]
    S = dirs @ mu_z.T
    dx = dirs @ mu_x.T
    dy = dirs @ mu_y.T
    return (S * np.exp(-p[:, 0] * dx * dx - p[:, 1] * dy * dy) /
            basis_dim).astype(np.float32)


def eval_basis_np(tree, dirs: np.ndarray) -> np.ndarray:
    """Dispatch by tree format; dirs [3] or [...,3]."""
    fmt = tree.data_format.format
    bd = tree.data_format.basis_dim
    if fmt == BasisFormat.SH:
        return eval_sh_basis_np(bd, np.asarray(dirs, np.float32))
    if fmt == BasisFormat.SG:
        return eval_sg_basis_np(bd, tree.extra, np.asarray(dirs, np.float32))
    if fmt == BasisFormat.ASG:
        return eval_asg_basis_np(bd, tree.extra, np.asarray(dirs, np.float32))
    return np.zeros(dirs.shape[:-1] + (0,), np.float32)
