"""Lumisphere probe: voxel inspection + screen-corner overlay.

Reference: retrieve_cursor_lumisphere_kernel (volrend.cu:215-231) fetches
the SH/SG coefficients of the leaf containing the probe point; the render
kernel then draws a circular lumisphere preview in the top-right corner
(volrend.cu:100-134), replacing scene rays there.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..io.n3tree import BasisFormat
from ..ops.sh import eval_asg_basis, eval_sg_basis, eval_sh_basis
from ..ops.traversal import DeviceTree, take_data_rows, tree_query


def retrieve_cursor_lumisphere(tree: DeviceTree, probe_xyz) -> jnp.ndarray:
    """Coefficients (data_dim-1) of the leaf containing the world-space
    probe point."""
    p = tree.offset + tree.scale * jnp.asarray(probe_xyz, jnp.float32)
    sub_ptr, _, _ = tree_query(tree, p[None, :])
    vals = take_data_rows(tree, sub_ptr)[0]
    return vals[:tree.data_dim - 1]


def apply_probe_overlay(img: jnp.ndarray, tree: DeviceTree, transform,
                        probe_coeffs, basis_minmax=(0, 24),
                        probe_disp_size: int = 100) -> jnp.ndarray:
    """Draw the lumisphere preview circle over img [H, W, 4].

    Geometry per volrend.cu:100-134: a disc of diameter probe_disp_size
    inset 5px from the top-right corner; each disc pixel maps to a
    direction on the camera-facing hemisphere, colored by
    sigmoid(basis . coeffs).
    """
    H, W, _ = img.shape
    d = probe_disp_size
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    xx = xs[None, :] - (W - d) + 5  # matches x - (W - d) + 5
    yy = ys[:, None] - 5
    cx = -(xx / (0.5 * d) - 1.0)
    cy = (yy / (0.5 * d) - 1.0)
    c2 = cx * cx + cy * cy
    region = (ys[:, None] < d + 5) & (xs[None, :] >= W - d - 5)
    inside = region & (c2 <= 1.0)

    cz = -jnp.sqrt(jnp.maximum(1.0 - c2, 0.0))
    R = jnp.asarray(transform, jnp.float32)[:, :3]
    dirs = (cx[..., None] * R[:, 0] + cy[..., None] * R[:, 1] +
            cz[..., None] * R[:, 2])

    basis_dim = tree.basis_dim
    if basis_dim >= 0:
        flat_dirs = dirs.reshape(-1, 3)
        if tree.fmt == BasisFormat.SH.value:
            basis = eval_sh_basis(basis_dim, flat_dirs)
        elif tree.fmt == BasisFormat.SG.value:
            basis = eval_sg_basis(basis_dim, tree.extra, flat_dirs)
        elif tree.fmt == BasisFormat.ASG.value:
            basis = eval_asg_basis(basis_dim, tree.extra, flat_dirs)
        else:
            basis = jnp.zeros((flat_dirs.shape[0], basis_dim))
        lo, hi = basis_minmax
        mask = (np.arange(basis_dim) >= lo) & (np.arange(basis_dim) <= hi)
        basis = basis * jnp.asarray(mask, jnp.float32)[None, :]
        coeffs = probe_coeffs[:3 * basis_dim].reshape(3, basis_dim)
        logits = basis @ coeffs.T  # [HW, 3]
        rgb = (1.0 / (1.0 + jnp.exp(-logits))).reshape(H, W, 3)
    else:
        rgb = jnp.broadcast_to(probe_coeffs[:3], (H, W, 3))

    over = jnp.where(inside[..., None], rgb, 0.0)
    out_rgb = jnp.where(region[..., None], over, img[..., :3])
    return jnp.concatenate(
        [out_rgb, jnp.ones((H, W, 1), img.dtype)], axis=-1)
