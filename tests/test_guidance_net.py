"""GuidanceNet: shape contract, compact-fold equivalence, export round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_octree_tpu.models.guidance_net import (
    GuidanceNet, GuidanceNetCompact, GuidanceNetConfig, apply_filtering,
    compact_and_export, compact_params, init_params, load_compact)


@pytest.fixture(scope="module")
def cfg():
    return GuidanceNetConfig(in_channels=8, mid_channels=16, num_layers=2,
                             num_branches=3, kernel_levels=4)


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(cfg, jax.random.PRNGKey(0))


def test_forward_contract(cfg, params):
    model = GuidanceNet(cfg)
    aux = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 24, 8))
    weight, guidance = model.apply({"params": params}, aux)
    assert weight.shape == (2, cfg.kernel_levels, 16, 24)
    assert guidance.shape == (2, cfg.kernel_levels, 16, 24)
    assert weight.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(weight.sum(1)), 1.0, atol=1e-5)


def test_compact_fold_equivalence(cfg, params):
    """compact(x) must reproduce full(x) (up to bf16 compute noise):
    the linear fold of branches+identity is exact in f32."""
    full = GuidanceNet(cfg, dtype=jnp.float32)
    compact = GuidanceNetCompact(cfg, dtype=jnp.float32)
    folded = compact_params(cfg, params)
    aux = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 8))
    w1, g1 = full.apply({"params": params}, aux)
    w2, g2 = compact.apply({"params": folded}, aux)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_identity_channel_wrap():
    """When cin == cout the identity shortcut folds as a center delta with
    channel wrap (the reference's i % in_channels)."""
    cfg = GuidanceNetConfig(in_channels=6, mid_channels=6, num_layers=2,
                            num_branches=2, kernel_levels=3)
    params = init_params(cfg, jax.random.PRNGKey(0))
    folded = compact_params(cfg, params)
    k0 = np.asarray(folded["block_0"]["kernel"])
    manual = np.zeros_like(k0)
    for b in range(2):
        manual += np.asarray(params["block_0"][f"conv3_{b}"]["kernel"])
        manual[1, 1] += np.asarray(
            params["block_0"][f"conv1_{b}"]["kernel"])[0, 0]
    for o in range(6):
        manual[1, 1, o % 6, o] += 1.0
    np.testing.assert_allclose(k0, manual, atol=1e-6)


def test_export_roundtrip(tmp_path, cfg, params):
    path = str(tmp_path / "ts_latest.gnet")
    model, folded = compact_and_export(cfg, params, path)
    cfg2, params2 = load_compact(path)
    assert cfg2 == cfg
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        folded, params2)
    del chex_equal
    aux = jax.random.uniform(jax.random.PRNGKey(3), (1, 8, 8, 8))
    w1, _ = GuidanceNetCompact(cfg).apply({"params": folded}, aux)
    w2, _ = GuidanceNetCompact(cfg2).apply({"params": params2}, aux)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_filtering_pipeline(cfg, params):
    """model forward + guided filtering end-to-end (network.py:77-84)."""
    aux = jax.random.uniform(jax.random.PRNGKey(4), (1, 8, 12, 12))
    img_in = jnp.moveaxis(aux[:, :4], 1, -1)
    out = apply_filtering(GuidanceNet(cfg), params, aux, img_in)
    assert out.shape == (1, 12, 12, 4)
    np.testing.assert_allclose(np.asarray(out[..., 3]), 1.0)
    assert np.isfinite(np.asarray(out)).all()


def test_single_layer_config():
    cfg = GuidanceNetConfig(in_channels=8, mid_channels=16, num_layers=1,
                            num_branches=2, kernel_levels=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    aux = jnp.zeros((1, 8, 8, 8))
    w, g = GuidanceNet(cfg).apply({"params": params}, aux)
    assert w.shape == (1, 2, 8, 8)


def test_export_meta_roundtrip(tmp_path, cfg, params):
    """The .gnet artifact carries optional advice metadata (e.g. the
    measured per-scene denoise_recommended flag); old artifacts without
    meta load as {} and tools/set_gnet_meta.py stamps it in place."""
    import sys
    sys.path.insert(0, "tools")
    from set_gnet_meta import set_meta
    from rt_octree_tpu.models.guidance_net import save_compact

    path = str(tmp_path / "ts_meta.gnet")
    _, folded = compact_and_export(cfg, params, path)
    cfg2, params2, meta = load_compact(path, with_meta=True)
    assert meta == {}  # no meta saved -> empty dict, not an error

    save_compact(path, cfg, folded,
                 meta={"denoise_recommended": False, "note": "hurts"})
    cfg3, params3, meta3 = load_compact(path, with_meta=True)
    assert cfg3 == cfg
    assert meta3["denoise_recommended"] is False
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params2, params3)

    # tool rewrite preserves params and merges keys
    set_meta(path, {"denoise_recommended": True})
    _, params4, meta4 = load_compact(path, with_meta=True)
    assert meta4 == {"denoise_recommended": True, "note": "hurts"}
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params2, params4)


def test_identity_level_header_roundtrip(tmp_path):
    """identity_level (the support-0 passthrough extension) survives the
    .gnet header round-trip; absent key loads as False (old artifacts)."""
    cfg = GuidanceNetConfig(identity_level=True)
    assert cfg.supports() == (0, 1, 2, 3)
    assert GuidanceNetConfig().supports() == (1, 2, 3, 4)
    params = init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "ts_ident.gnet")
    compact_and_export(cfg, params, path)
    cfg2, _ = load_compact(path)
    assert cfg2.identity_level is True
    assert cfg2 == cfg


def test_identity_level_pipeline(np_rng):
    """End-to-end filtering with an identity-level config: finite, and a
    weight map concentrated on level 0 passes the input rgb through."""
    cfg = GuidanceNetConfig(identity_level=True)
    params = init_params(cfg, jax.random.PRNGKey(1))
    aux = jax.random.uniform(jax.random.PRNGKey(5), (1, 8, 10, 10))
    img_in = jnp.moveaxis(aux[:, :4], 1, -1)
    out = apply_filtering(GuidanceNet(cfg), params, aux, img_in)
    assert out.shape == (1, 10, 10, 4)
    assert np.isfinite(np.asarray(out)).all()
