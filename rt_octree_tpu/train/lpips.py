"""LPIPS (AlexNet backbone) in JAX, loading weights from a local .npz.

The reference uses the `lpips` pip package with downloaded pretrained
weights (denoiser/metrics.py:81-89).  This environment has no network
access, so the metric activates only when a weights file is present.

Expected .npz keys (all float32):
  conv{0..4}_w  HWIO kernels of the 5 AlexNet feature convs
                (11x11x3x64, 5x5x64x192, 3x3x192x384, 3x3x384x256,
                 3x3x256x256)
  conv{0..4}_b  biases
  lin{0..4}     per-channel calibration weights (64, 192, 384, 256, 256)

A converter from the torchvision/lpips checkpoints is provided in
tools/convert_lpips.py for machines that have them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_STRIDES = (4, 1, 1, 1, 1)
_PADS = (2, 2, 1, 1, 1)
_POOL_AFTER = (True, True, False, False, False)


class LPIPS:
    def __init__(self, weights_path: str):
        w = np.load(weights_path)
        self.params = {k: jnp.asarray(w[k]) for k in w.files}

    @functools.partial(jax.jit, static_argnums=0)
    def _dist(self, a, b):
        # inputs [B, H, W, 3] in [0, 1] -> scaled to [-1, 1] then normalized
        def prep(x):
            x = 2.0 * x - 1.0
            return (x - _SHIFT) / _SCALE

        def features(x):
            feats = []
            for i in range(5):
                k = self.params[f"conv{i}_w"]
                bias = self.params[f"conv{i}_b"]
                s = _STRIDES[i]
                p = _PADS[i]
                x = jax.lax.conv_general_dilated(
                    x, k, (s, s), [(p, p), (p, p)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = jax.nn.relu(x + bias)
                feats.append(x)
                if _POOL_AFTER[i]:
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                        (1, 2, 2, 1), "VALID")
            return feats

        fa = features(prep(a))
        fb = features(prep(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            lin = self.params[f"lin{i}"]
            total = total + jnp.mean(jnp.sum(d * lin, axis=-1))
        return total

    def __call__(self, preds, truths):
        """preds/truths [B, H, W, 3] in [0, 1]."""
        return self._dist(jnp.asarray(preds[..., :3]),
                          jnp.asarray(truths[..., :3]))
