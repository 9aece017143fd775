"""Losses and quality metrics for denoiser training.

Reference: denoiser/metrics.py.  SMAPE/MSE/Huber losses; PSNR/SSIM/LPIPS
metric accumulators operating on [B, H, W, C] float images in [0, 1].

Substitutions (documented, since the reference's exact deps are
CUDA/pip-only):
  * SSIM: implemented natively in JAX with the same defaults as
    pytorch_msssim (11x11 gaussian window, sigma=1.5, K1=0.01, K2=0.03,
    data_range=1) -- agreement verified against a NumPy re-derivation in
    tests.
  * LPIPS: requires pretrained AlexNet features, which cannot be
    downloaded in this environment.  ``LPIPSMetric`` computes the same
    linear-calibrated deep-feature distance when a weights file is
    supplied (``RT_OCTREE_LPIPS_WEIGHTS`` env or explicit path, .npz with
    conv kernels + lin weights); otherwise it reports unavailability
    instead of a number.  All plumbing (runner integration, logging) is
    live either way.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# losses (metrics.py:7-33)
# ---------------------------------------------------------------------------

def smape_loss(preds, truths):
    return jnp.mean(jnp.abs(preds - truths) /
                    (jnp.abs(preds) + jnp.abs(truths) + 1e-5))


def mse_loss(preds, truths):
    return jnp.mean((preds - truths) ** 2)


def huber_loss(preds, truths, delta: float = 1.0):
    err = preds - truths
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return jnp.mean(0.5 * quad ** 2 + delta * (abs_err - quad))


def get_loss_fn(name: str) -> Callable:
    fns = {"smape": smape_loss, "mse": mse_loss, "huber": huber_loss}
    if name in fns:
        return fns[name]
    if name.startswith("lpips"):
        raise NotImplementedError(
            "LPIPS as a *training loss* needs pretrained feature weights; "
            "provide them via LPIPSMetric and use smape/mse/huber to train.")
    raise NotImplementedError(f"Invalid loss function: {name}")


# ---------------------------------------------------------------------------
# PSNR / SSIM
# ---------------------------------------------------------------------------

def psnr(preds, truths) -> float:
    mse = jnp.mean((preds - truths) ** 2)
    return float(-10.0 * jnp.log10(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(g, jnp.float32)


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(preds, truths, data_range: float = 1.0):
    """Mean SSIM over batch/channels; inputs [B, H, W, C] (valid-window
    convolution, gaussian 11x11 sigma 1.5 -- pytorch_msssim defaults)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = _gaussian_window()

    def blur(img):  # separable gaussian, valid padding, [B,H,W,C]
        out = jax.vmap(
            lambda c: jnp.apply_along_axis(
                lambda v: jnp.convolve(v, win, mode="valid",
                                       precision=jax.lax.Precision.HIGHEST),
                1, c),
            in_axes=-1, out_axes=-1)(img)
        out = jax.vmap(
            lambda c: jnp.apply_along_axis(
                lambda v: jnp.convolve(v, win, mode="valid",
                                       precision=jax.lax.Precision.HIGHEST),
                2, c),
            in_axes=-1, out_axes=-1)(out)
        return out

    mu_x = blur(preds)
    mu_y = blur(truths)
    mu_xx = blur(preds * preds)
    mu_yy = blur(truths * truths)
    mu_xy = blur(preds * truths)
    var_x = mu_xx - mu_x ** 2
    var_y = mu_yy - mu_y ** 2
    cov = mu_xy - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * cov + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)
    return jnp.mean(num / den)


# ---------------------------------------------------------------------------
# metric accumulators (metrics.py:35-89)
# ---------------------------------------------------------------------------

class Metric:
    def __init__(self):
        self.sum = 0.0
        self.cnt = 0

    def name(self) -> str:
        raise NotImplementedError

    def fn(self, preds, truths) -> float:
        raise NotImplementedError

    def reset(self):
        self.sum = 0.0
        self.cnt = 0

    def available(self) -> bool:
        return True

    def measure(self, preds, truths):
        self.sum += self.fn(preds, truths)
        self.cnt += 1

    def result(self) -> float:
        return self.sum / max(self.cnt, 1)


class PSNRMetric(Metric):
    def name(self):
        return "psnr"

    def fn(self, preds, truths):
        return psnr(preds, truths)


class SSIMMetric(Metric):
    def __init__(self, data_range: float = 1.0):
        super().__init__()
        self.data_range = data_range

    def name(self):
        return "ssim"

    def fn(self, preds, truths):
        return float(ssim(preds, truths, data_range=self.data_range))


class LPIPSMetric(Metric):
    """AlexNet-feature LPIPS when weights are available locally."""

    def __init__(self, weights_path: Optional[str] = None):
        super().__init__()
        self.weights_path = weights_path or os.environ.get(
            "RT_OCTREE_LPIPS_WEIGHTS", "")
        self._net = None
        if self.weights_path and os.path.isfile(self.weights_path):
            from .lpips import LPIPS
            self._net = LPIPS(self.weights_path)

    def name(self):
        return "lpips"

    def available(self):
        return self._net is not None

    def fn(self, preds, truths):
        if self._net is None:
            raise RuntimeError(
                "LPIPS weights unavailable; set RT_OCTREE_LPIPS_WEIGHTS")
        return float(self._net(preds, truths))


def stdfilt(img, kernel_size: int):
    """Windowed standard deviation (metrics.py:92-97; unused by the
    reference pipeline but kept for API parity).  img: [B, H, W, C]."""
    window = (1, kernel_size, kernel_size, 1)
    ones = jnp.ones(window, img.dtype)

    def avg(x):
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, window, (1, 1, 1, 1), "SAME")
        n = jax.lax.reduce_window(
            jnp.ones_like(x), 0.0, jax.lax.add, window, (1, 1, 1, 1), "SAME")
        return s / n
    del ones
    mean = avg(img)
    mean_sq = avg(img ** 2)
    return jnp.sqrt(jnp.maximum(mean_sq - mean ** 2, 0.0))
