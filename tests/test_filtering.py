"""Guided filtering op: forward vs naive oracle, fast==exact, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_octree_tpu.ops.filtering import (
    guided_filter, guided_filter_batch, _box_sum)


def naive_filter(weight, guidance, img):
    """Direct per-pixel restatement of the level filter semantics
    (filtering.cu:108-228): out-of-bounds neighbors excluded, per-window
    max stabilizer, weighted level blend, alpha=1."""
    L, H, W = weight.shape
    out = np.zeros((H, W, 3), np.float64)
    for l in range(L):
        s = l + 1
        for y in range(H):
            for x in range(W):
                y0, y1 = max(y - s, 0), min(y + s, H - 1)
                x0, x1 = max(x - s, 0), min(x + s, W - 1)
                g = guidance[l, y0:y1 + 1, x0:x1 + 1].astype(np.float64)
                m = g.max()
                k = np.exp(g - m)
                num = (img[y0:y1 + 1, x0:x1 + 1, :3] *
                       k[..., None]).sum((0, 1))
                out[y, x] += weight[l, y, x] * num / k.sum()
    res = np.concatenate([out, np.ones((H, W, 1))], -1)
    return res.astype(np.float32)


@pytest.fixture
def small_inputs(np_rng):
    L, H, W = 3, 9, 7
    weight = jax.nn.softmax(
        jnp.asarray(np_rng.standard_normal((L, H, W)), jnp.float32), axis=0)
    guidance = jnp.asarray(np_rng.standard_normal((L, H, W)) * 2, jnp.float32)
    img = jnp.asarray(np_rng.random((H, W, 4)), jnp.float32)
    return weight, guidance, img


def test_box_sum():
    x = jnp.arange(5.0).reshape(5, 1, 1)
    out = np.asarray(_box_sum(x, 1)).reshape(5)
    # rows: windows of column vector give 1-D running sums
    np.testing.assert_allclose(out, [1, 3, 6, 9, 7])


def test_exact_matches_naive(small_inputs):
    weight, guidance, img = small_inputs
    ours = np.asarray(guided_filter(weight, guidance, img, exact=True))
    ref = naive_filter(np.asarray(weight), np.asarray(guidance),
                       np.asarray(img))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fast_matches_exact(small_inputs):
    weight, guidance, img = small_inputs
    a = np.asarray(guided_filter(weight, guidance, img, exact=True))
    b = np.asarray(guided_filter(weight, guidance, img, exact=False))
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_gradients_match_between_paths(small_inputs):
    weight, guidance, img = small_inputs

    def loss(w, g, exact):
        out = guided_filter(w, g, img, exact=exact)
        return jnp.sum(out[..., :3] ** 2)

    gw_e, gg_e = jax.grad(lambda w, g: loss(w, g, True), (0, 1))(
        weight, guidance)
    gw_f, gg_f = jax.grad(lambda w, g: loss(w, g, False), (0, 1))(
        weight, guidance)
    np.testing.assert_allclose(np.asarray(gw_e), np.asarray(gw_f),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gg_e), np.asarray(gg_f),
                               atol=1e-3, rtol=1e-3)


def test_gradient_weight_analytic(small_inputs):
    """grad wrt weight must equal grad_output . rgb_filtered
    (filtering.cu:230-248)."""
    weight, guidance, img = small_inputs
    go = jnp.ones_like(img)

    def f(w):
        return jnp.sum(guided_filter(w, guidance, img, exact=True) * go)

    gw = np.asarray(jax.grad(f)(weight))
    # rgb_filtered per level via naive computation with weight=1
    L = weight.shape[0]
    for l in range(L):
        w1 = np.zeros_like(np.asarray(weight))
        w1[l] = 1.0
        f_l = naive_filter(w1, np.asarray(guidance), np.asarray(img))[..., :3]
        np.testing.assert_allclose(gw[l], f_l.sum(-1), atol=1e-4)


def test_extreme_range_falls_back_to_exact(small_inputs):
    """A trained network's guidance range is unbounded: with a deep 'hole'
    (>> 87 nats below the global max) the global-stabilizer fast path
    would produce NaNs; the runtime guard must route such frames through
    the exact path and still match the naive oracle."""
    weight, guidance, img = small_inputs
    g = np.asarray(guidance).copy()
    g[:, :4, :] -= 500.0  # entire windows live ~500 nats below the max
    g[0, 8, 6] += 300.0   # and one spike dominates the global max
    g = jnp.asarray(g)
    out = np.asarray(guided_filter(weight, g, img, exact=False))
    assert np.isfinite(out).all()
    ref = naive_filter(np.asarray(weight), np.asarray(g), np.asarray(img))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
    # gradients stay finite through the cond fallback too
    gg = jax.grad(lambda gm: jnp.sum(
        guided_filter(weight, gm, img, exact=False)[..., :3] ** 2))(g)
    assert np.isfinite(np.asarray(gg)).all()


def test_trained_like_guidance_stays_fast(small_inputs):
    """Realistic trained-scale guidance (range ~20 nats, smooth) must keep
    the fast separable path and agree with the oracle."""
    weight, guidance, img = small_inputs
    g = guidance * 5.0  # ~20 nat spread: large but within FAST_SAFE_RANGE
    out = np.asarray(guided_filter(weight, g, img, exact=False))
    ref = naive_filter(np.asarray(weight), np.asarray(g), np.asarray(img))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_batched(small_inputs):
    weight, guidance, img = small_inputs
    wb = jnp.stack([weight, weight * 0 + 1.0 / weight.shape[0]])
    gb = jnp.stack([guidance, guidance * 0.5])
    ib = jnp.stack([img, img * 0.5])
    out = guided_filter_batch(wb, gb, ib)
    assert out.shape == (2,) + img.shape[:2] + (4,)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(guided_filter(weight, guidance, img)),
        atol=1e-6)


def test_fast_filter_with_trained_guidance(np_rng):
    """VERDICT weak-4 closure: the fast separable path must agree with
    the exact windowed-max path on guidance maps produced by a REAL
    trained GuidanceNet (tests/data/trained_shell.gnet, exported by the
    canonical training run on the bench scene), whose dynamic range --
    unlike random init -- is unbounded a priori."""
    import os

    import jax.numpy as jnp

    from rt_octree_tpu.models.guidance_net import (
        GuidanceNetCompact, load_compact)
    from rt_octree_tpu.ops.filtering import (
        guided_filter, _filter_all_exact)

    path = os.path.join(os.path.dirname(__file__), "data",
                        "trained_shell.gnet")
    cfg, params = load_compact(path)
    model = GuidanceNetCompact(cfg)

    # a shell-like aux patch: smooth alpha front + noise, squares channels
    H = W = 48
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W),
                         indexing="ij")
    base = 1.0 / (1.0 + np.exp(-12 * (0.5 - np.hypot(yy - 0.5, xx - 0.5))))
    rgba = np.stack([base * 0.8, base * 0.6, base * 0.9, base], -1)
    rgba += np_rng.normal(0, 0.08, rgba.shape)
    rgba = np.clip(rgba, 0, 1).astype(np.float32)
    aux = np.concatenate([rgba, rgba ** 2], -1)

    weight, guidance = model.apply({"params": params},
                                   jnp.asarray(aux)[None])
    g = np.asarray(guidance[0])
    print("trained guidance range:", g.min(), g.max())

    img = jnp.asarray(rgba)
    out_fast = guided_filter(weight[0], guidance[0], img)
    out_exact = _filter_all_exact(weight[0], guidance[0], img[..., :3],
                                  cfg.supports())
    np.testing.assert_allclose(np.asarray(out_fast)[..., :3],
                               np.asarray(out_exact), atol=2e-5)


# ---------------------------------------------------------------------------
# identity (support-0 passthrough) level -- additive extension
# ---------------------------------------------------------------------------

def naive_filter_supports(weight, guidance, img, supports):
    """naive_filter generalized to arbitrary per-level supports; s=0 is
    the 1x1 window, whose softmax average is exactly the center pixel."""
    L, H, W = weight.shape
    out = np.zeros((H, W, 3), np.float64)
    for l, s in enumerate(supports):
        for y in range(H):
            for x in range(W):
                y0, y1 = max(y - s, 0), min(y + s, H - 1)
                x0, x1 = max(x - s, 0), min(x + s, W - 1)
                g = guidance[l, y0:y1 + 1, x0:x1 + 1].astype(np.float64)
                k = np.exp(g - g.max())
                num = (img[y0:y1 + 1, x0:x1 + 1, :3] *
                       k[..., None]).sum((0, 1))
                out[y, x] += weight[l, y, x] * num / k.sum()
    return np.concatenate([out, np.ones((H, W, 1))], -1).astype(np.float32)


def test_identity_supports_match_naive(small_inputs):
    weight, guidance, img = small_inputs
    sup = (0, 1, 2)
    for exact in (True, False):
        ours = np.asarray(guided_filter(weight, guidance, img,
                                        exact=exact, supports=sup))
        ref = naive_filter_supports(np.asarray(weight), np.asarray(guidance),
                                    np.asarray(img), sup)
        np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_identity_level_is_exact_passthrough(small_inputs):
    """With all weight on the support-0 level the output rgb must be
    BIT-exact the input rgb -- the representational floor the reference
    ladder lacks (its smallest kernel is 3x3)."""
    weight, guidance, img = small_inputs
    w = np.zeros_like(np.asarray(weight))
    w[0] = 1.0
    for exact in (True, False):
        out = np.asarray(guided_filter(jnp.asarray(w), guidance, img,
                                       exact=exact, supports=(0, 1, 2)))
        np.testing.assert_array_equal(out[..., :3], np.asarray(img)[..., :3])


def test_identity_supports_gradients_finite(small_inputs):
    weight, guidance, img = small_inputs

    def loss(w, g):
        out = guided_filter(w, g, img, supports=(0, 1, 2))
        return jnp.sum(out[..., :3] ** 2)

    gw, gg = jax.grad(loss, (0, 1))(weight, guidance)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(gg)).all()
    # guidance of the passthrough level gets exactly zero gradient
    np.testing.assert_array_equal(np.asarray(gg[0]),
                                  np.zeros_like(np.asarray(gg[0])))


def test_bad_supports_raise(small_inputs):
    weight, guidance, img = small_inputs
    with pytest.raises(ValueError):
        guided_filter(weight, guidance, img, supports=(1, 2))  # wrong L
    with pytest.raises(ValueError):
        guided_filter(weight, guidance, img, supports=(-1, 1, 2))
