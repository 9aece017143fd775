"""Unit tests for bench.py helper logic (no device, no gnet load).

The fast rungs prefer a FAST-MODE-trained distillation net
(tools/make_fast_kit.py) over the full-res-trained scene net, first
from the local training logs, then from the committed kit artifact
(benchmarks/<kit>/fast.gnet) -- see PERF.md's fast-mode section for
why the full-res net is nearly inert on joint-upsampled input.
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


class _Rec:
    def __init__(self):
        self.paths = []

    def set_denoiser(self, path):
        self.paths.append(path)


def _patched_cache(monkeypatch, tmp_path):
    import bench
    monkeypatch.setattr(bench, "CACHE", str(tmp_path))
    return bench


def test_fast_denoiser_prefers_fresh_training_logs(monkeypatch, tmp_path):
    bench = _patched_cache(monkeypatch, tmp_path)
    d = tmp_path / "quality_ds_fast_blobs" / "logs" / "fast_blobs"
    d.mkdir(parents=True)
    (d / "ts_000050.gnet").write_bytes(b"x")
    (d / "ts_000250.gnet").write_bytes(b"x")
    r = _Rec()
    assert bench._fast_denoiser(r, "blobs")
    # highest-numbered export wins (latest training state)
    assert r.paths == [str(d / "ts_000250.gnet")]


def test_fast_denoiser_falls_back_to_committed_kit(monkeypatch, tmp_path):
    bench = _patched_cache(monkeypatch, tmp_path)
    r = _Rec()
    kit = os.path.join(ROOT, "benchmarks", "quality", "fast.gnet")
    if os.path.exists(kit):  # committed shell artifact
        assert bench._fast_denoiser(r, "shell")
        assert r.paths == [kit]
    else:  # fresh checkout without the artifact: clean refusal
        assert not bench._fast_denoiser(r, "shell")
        assert r.paths == []


def test_fast_denoiser_missing_everything_returns_false(monkeypatch,
                                                        tmp_path):
    bench = _patched_cache(monkeypatch, tmp_path)
    r = _Rec()
    assert not bench._fast_denoiser(r, "no_such_scene")
    assert r.paths == []


def test_fast_denoiser_scale_specific_wins(monkeypatch, tmp_path):
    """A scale-specific artifact (trained at that scale) outranks both
    the generic fast net and the training-log candidates."""
    bench = _patched_cache(monkeypatch, tmp_path)
    d = tmp_path / "quality_ds_fast_s0.4" / "logs" / "fast_s0.4"
    d.mkdir(parents=True)
    (d / "ts_000120.gnet").write_bytes(b"x")
    g = tmp_path / "quality_ds_fast" / "logs" / "fast"
    g.mkdir(parents=True)
    (g / "ts_000250.gnet").write_bytes(b"x")
    r = _Rec()
    assert bench._fast_denoiser(r, "shell", 0.4)
    assert r.paths == [str(d / "ts_000120.gnet")]
    # without a scale, the generic candidates still win
    r2 = _Rec()
    assert bench._fast_denoiser(r2, "shell")
    assert r2.paths == [str(g / "ts_000250.gnet")]


def test_fast_denoiser_variant_wins(monkeypatch, tmp_path):
    """A variant-specific artifact (e.g. the lod8-student net the llff
    interactive rung marches) outranks scale-specific and generic."""
    bench = _patched_cache(monkeypatch, tmp_path)
    v = tmp_path / "quality_ds_fast_blobs_lod8" / "logs" / \
        "fast_blobs_lod8"
    v.mkdir(parents=True)
    (v / "ts_000250.gnet").write_bytes(b"x")
    g = tmp_path / "quality_ds_fast_blobs" / "logs" / "fast_blobs"
    g.mkdir(parents=True)
    (g / "ts_000250.gnet").write_bytes(b"x")
    r = _Rec()
    assert bench._fast_denoiser(r, "blobs", 0.5, variant="lod8")
    assert r.paths == [str(v / "ts_000250.gnet")]
    # without the variant, the generic candidate wins as before
    r2 = _Rec()
    assert bench._fast_denoiser(r2, "blobs", 0.5)
    assert r2.paths == [str(g / "ts_000250.gnet")]


def test_emit_and_budget(monkeypatch, capsys):
    import json
    import bench
    out = {"metric": "m", "value": 1.0}
    bench._emit(out)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == out
    # no budget set -> never over
    monkeypatch.setattr(bench, "BUDGET_S", 0.0)
    assert not bench._over_budget("x")
    # tiny budget against the process start time -> over
    monkeypatch.setattr(bench, "BUDGET_S", 1e-6)
    assert bench._over_budget("x")
