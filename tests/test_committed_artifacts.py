"""Regression guards for the COMMITTED benchmark artifacts.

The bench falls back to benchmarks/quality*/ when .bench_cache is wiped
(every round starts cold), so these artifacts are load-bearing: each
.gnet must load through the production loader, carry the round-5
contract metadata, and drive the guided filter.  Reference anchors:
network.py:170-209 (compact export contract), filtering.cu:108-228
(level semantics the identity level extends).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BM = os.path.join(ROOT, "benchmarks")

# (path, identity_level expected, fast_scale expected or None)
ARTIFACTS = [
    ("quality/trained.gnet", True, None),
    ("quality/fast.gnet", False, 0.5),
    ("quality/fast_s0.4.gnet", False, 0.4),
    ("quality_solid/trained.gnet", True, None),
    ("quality_tt/trained.gnet", True, None),
    ("quality_tt/fast.gnet", False, 0.5),
    ("quality_blobs/trained.gnet", False, None),
    ("quality_blobs/fast.gnet", False, 0.5),
]


@pytest.mark.parametrize("rel,identity,fast_scale",
                         ARTIFACTS, ids=[a[0] for a in ARTIFACTS])
def test_committed_gnet_loads_and_filters(rel, identity, fast_scale):
    from rt_octree_tpu.models.guidance_net import (
        GuidanceNetCompact, load_compact)
    from rt_octree_tpu.ops.filtering import guided_filter

    path = os.path.join(BM, rel)
    assert os.path.exists(path), f"committed artifact missing: {rel}"
    cfg, params, meta = load_compact(path, with_meta=True)
    # canonical architecture (denoiser/configs/blender.txt:21-25)
    assert (cfg.in_channels, cfg.mid_channels, cfg.num_layers,
            cfg.num_branches, cfg.kernel_levels) == (8, 32, 2, 5, 4)
    assert cfg.identity_level is identity
    # round-5 contract: no committed artifact advises denoise-off any
    # more (the identity retrains erased the hard-surface regression)
    assert meta.get("denoise_recommended", True) is True
    if fast_scale is not None:
        assert meta.get("fast_scale") == fast_scale
    # supports ladder: identity shifts (1..L) -> (0..L-1)
    sup = cfg.supports()
    assert sup == (tuple(range(0, 4)) if identity else tuple(range(1, 5)))

    # drive the production filter path with the loaded params
    rng = np.random.default_rng(0)
    aux = jnp.asarray(rng.random((1, 16, 16, 8)), jnp.float32)
    img = jnp.asarray(rng.random((16, 16, 4)), jnp.float32)
    weight, guidance = GuidanceNetCompact(cfg).apply({"params": params},
                                                     aux)
    out = guided_filter(weight[0], guidance[0], img, supports=sup)
    assert out.shape == (16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    # weight map is a softmax over levels: sums to 1 per pixel
    np.testing.assert_allclose(np.asarray(jnp.sum(weight[0], axis=0)),
                               1.0, atol=1e-5)


def test_committed_kits_have_eight_gt_poses():
    """The bench quality gates assert poses == 8; every committed kit
    must supply exactly that many GT frames (VERDICT r4 weak-5)."""
    import json
    for kit in ("quality", "quality_solid", "quality_tt",
                "quality_blobs"):
        tf = os.path.join(BM, kit, "transforms_test.json")
        with open(tf) as f:
            frames = json.load(f)["frames"]
        assert len(frames) == 8, (kit, len(frames))
        for fr in frames:
            name = os.path.basename(fr["file_path"])
            assert os.path.exists(
                os.path.join(BM, kit, "test", f"{name}.png")), (kit, name)
