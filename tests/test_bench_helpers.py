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
