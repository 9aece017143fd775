"""Pin the LPIPS port's numerics against a hand-rolled NumPy twin.

The JAX AlexNet-LPIPS (train/lpips.py) can only run for real once
pretrained weights exist locally (tools/convert_lpips.py); this test pins
the port's structure -- conv stride/padding, relu placement, 3x3/2 VALID
max-pool positions, channel normalization, linear calibration, spatial
mean, layer sum (the computation at denoiser/metrics.py:81-89 via the
lpips package) -- with RANDOM weights vs an independent NumPy
implementation, so a conversion bug can't hide until weights appear.
"""

import numpy as np
import pytest

CHANNELS = (64, 192, 384, 256, 256)
KSIZES = (11, 5, 3, 3, 3)
STRIDES = (4, 1, 1, 1, 1)
PADS = (2, 2, 1, 1, 1)
POOL_AFTER = (True, True, False, False, False)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _np_conv(x, k, stride, pad):
    """Cross-correlation, NHWC x HWIO -> NHWC, float64 accumulation."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = k.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (w + 2 * pad - kw) // stride + 1
    out = np.zeros((b, ho, wo, cout), np.float64)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + ho * stride:stride,
                       j:j + wo * stride:stride, :]
            out += patch.astype(np.float64) @ k[i, j].astype(np.float64)
    return out


def _np_maxpool(x):
    b, h, w, c = x.shape
    ho, wo = (h - 3) // 2 + 1, (w - 3) // 2 + 1
    out = np.full((b, ho, wo, c), -np.inf)
    for i in range(3):
        for j in range(3):
            out = np.maximum(out, x[:, i:i + ho * 2:2, j:j + wo * 2:2, :])
    return out


def _np_lpips(params, a, b):
    def prep(x):
        x = 2.0 * x.astype(np.float64) - 1.0
        return (x - _SHIFT) / _SCALE

    def features(x):
        feats = []
        for i in range(5):
            x = _np_conv(x, params[f"conv{i}_w"], STRIDES[i], PADS[i])
            x = np.maximum(x + params[f"conv{i}_b"], 0.0)
            feats.append(x)
            if POOL_AFTER[i]:
                x = _np_maxpool(x)
        return feats

    fa, fb = features(prep(a)), features(prep(b))
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (np.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
        nb = xb / (np.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        total += np.mean(np.sum(d * params[f"lin{i}"], axis=-1))
    return total


@pytest.fixture
def random_weights(tmp_path, np_rng):
    params = {}
    cin = 3
    for i, (c, k) in enumerate(zip(CHANNELS, KSIZES)):
        params[f"conv{i}_w"] = (np_rng.standard_normal(
            (k, k, cin, c)).astype(np.float32) * (1.0 / (k * k * cin) ** 0.5))
        params[f"conv{i}_b"] = np_rng.standard_normal(c).astype(
            np.float32) * 0.1
        params[f"lin{i}"] = np_rng.random(c).astype(np.float32)
        cin = c
    path = tmp_path / "lpips_rand.npz"
    np.savez(path, **params)
    return str(path), params


def test_lpips_matches_numpy_twin(random_weights, np_rng):
    from rt_octree_tpu.train.lpips import LPIPS

    path, params = random_weights
    metric = LPIPS(path)
    a = np_rng.random((2, 64, 64, 3)).astype(np.float32)
    b = np_rng.random((2, 64, 64, 3)).astype(np.float32)
    got = float(metric(a, b))
    want = _np_lpips(params, a, b)
    assert got == pytest.approx(want, rel=2e-4)


def test_lpips_zero_for_identical(random_weights, np_rng):
    from rt_octree_tpu.train.lpips import LPIPS

    path, _ = random_weights
    metric = LPIPS(path)
    a = np_rng.random((1, 64, 64, 3)).astype(np.float32)
    assert float(metric(a, a.copy())) == pytest.approx(0.0, abs=1e-7)


def test_lpips_weight_shapes_contract(random_weights):
    """The converter contract (tools/convert_lpips.py): torchvision
    AlexNet features + lpips lin layers produce exactly these keys and
    shapes."""
    _, params = random_weights
    cin = 3
    for i, (c, k) in enumerate(zip(CHANNELS, KSIZES)):
        assert params[f"conv{i}_w"].shape == (k, k, cin, c)
        assert params[f"conv{i}_b"].shape == (c,)
        assert params[f"lin{i}"].shape == (c,)
        cin = c
