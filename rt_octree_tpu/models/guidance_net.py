"""GuidanceNet: multi-branch RepVGG kernel-prediction denoiser in Flax.

Reference: denoiser/network.py:49-209.  The network maps the 8-channel
aux buffer [r,g,b,a,r2,g2,b2,a2] to ``2*kernel_levels`` channels, split
into a softmax ``weight_map`` (level blending) and a raw ``guidance_map``
(per-level softmax-filter logits).

TPU redesign decisions:
  * NHWC layout (TPU conv native) instead of torch NCHW; the on-disk aux
    buffer stays [8,H,W] for bit-compatibility and is transposed at load.
  * bfloat16 compute / float32 params replaces the CUDA AMP autocast
    (network.py:108-112); outputs are cast back to float32 before the
    softmax split exactly like the reference.
  * Re-parameterization ("compact") folds every multi-branch block into
    one 3x3 conv at export (network.py:123-168): branches sum linearly, a
    1x1 kernel embeds as a center-padded 3x3, and the identity shortcut
    is a center delta kernel with the reference's ``i % in_channels``
    channel-wrapping quirk.
  * The TorchScript ``.ts`` artifact becomes a msgpack'd Flax param tree
    (.gnet) with a JSON header describing the architecture contract.
"""

from __future__ import annotations

import dataclasses
import json
import struct
from typing import Any, Optional, Sequence

import flax.linen as nn
import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filtering import guided_filter_batch


@dataclasses.dataclass(frozen=True)
class GuidanceNetConfig:
    in_channels: int = 8
    mid_channels: int = 32
    num_layers: int = 2
    num_branches: int = 5
    kernel_levels: int = 4
    # additive extension (ops/filtering.py module doc): shift the level
    # supports from (1..L) to (0..L-1) so level 0 is an exact per-pixel
    # passthrough -- lets the predicted weight_map express a no-op on
    # pixels the >=3x3 softmax average would only blur (hard surfaces
    # near-converged at SPP=6).  False = bit-exact reference ladder.
    identity_level: bool = False

    def supports(self) -> tuple:
        """Per-level filter supports fed to ops.filtering.guided_filter."""
        L = self.kernel_levels
        return tuple(range(0, L)) if self.identity_level else \
            tuple(range(1, L + 1))

    def layer_channels(self) -> list[tuple[int, int]]:
        """(cin, cout) per RepVGG block (network.py:95-102)."""
        chans = []
        for i in range(self.num_layers - 1):
            chans.append((self.mid_channels if i > 0 else self.in_channels,
                          self.mid_channels))
        last_in = self.mid_channels if self.num_layers > 1 else self.in_channels
        chans.append((last_in, self.kernel_levels * 2))
        return chans


class RepVGGBlock(nn.Module):
    """num_branches x (3x3 conv) + num_branches x (1x1 conv) + identity,
    followed by relu6 (network.py:49-75)."""

    out_channels: int
    num_branches: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        h = None
        for i in range(self.num_branches):
            y = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"conv3_{i}")(x)
            h = y if h is None else h + y
        for i in range(self.num_branches):
            h = h + nn.Conv(self.out_channels, (1, 1), padding="SAME",
                            dtype=self.dtype, name=f"conv1_{i}")(x)
        if cin == self.out_channels:
            h = h + x
        return nn.relu6(h)


class GuidanceNet(nn.Module):
    """Full trainable model.  Input [B,H,W,8] -> (weight, guidance) each
    [B, L, H, W] float32 (weight softmaxed over L) -- same output contract
    as the reference forward (network.py:104-118)."""

    config: GuidanceNetConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, aux_nhwc):
        cfg = self.config
        x = aux_nhwc.astype(self.dtype)
        for i, (_cin, cout) in enumerate(cfg.layer_channels()):
            x = RepVGGBlock(cout, cfg.num_branches, dtype=self.dtype,
                            name=f"block_{i}")(x)
        x = x.astype(jnp.float32)
        x = jnp.moveaxis(x, -1, 1)  # [B, 2L, H, W]
        L = cfg.kernel_levels
        weight = jax.nn.softmax(x[:, :L], axis=1)
        guidance = x[:, L:]
        return weight, guidance


class GuidanceNetCompact(nn.Module):
    """Inference model: one 3x3 conv per block (network.py:123-168)."""

    config: GuidanceNetConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, aux_nhwc):
        cfg = self.config
        x = aux_nhwc.astype(self.dtype)
        for i, (_cin, cout) in enumerate(cfg.layer_channels()):
            x = nn.Conv(cout, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"block_{i}")(x)
            x = nn.relu6(x)
        x = x.astype(jnp.float32)
        x = jnp.moveaxis(x, -1, 1)
        L = cfg.kernel_levels
        weight = jax.nn.softmax(x[:, :L], axis=1)
        guidance = x[:, L:]
        return weight, guidance


def init_params(cfg: GuidanceNetConfig, rng_key, height: int = 64,
                width: int = 64):
    model = GuidanceNet(cfg)
    dummy = jnp.zeros((1, height, width, cfg.in_channels), jnp.float32)
    return model.init(rng_key, dummy)["params"]


def compact_params(cfg: GuidanceNetConfig, params) -> dict:
    """Fold each RepVGG block's branches into a single 3x3 conv.

    Flax kernels are HWIO.  Sum of 3x3 kernels + center-embedded 1x1
    kernels + identity delta (kernel[1,1, i % cin, i] = 1 when cin == cout,
    matching the channel-wrap at network.py:142-146).
    """
    out = {}
    for i, (cin, cout) in enumerate(cfg.layer_channels()):
        block = params[f"block_{i}"]
        kernel = np.zeros((3, 3, cin, cout), np.float32)
        bias = np.zeros((cout,), np.float32)
        for b in range(cfg.num_branches):
            kernel += np.asarray(block[f"conv3_{b}"]["kernel"], np.float32)
            bias += np.asarray(block[f"conv3_{b}"]["bias"], np.float32)
        for b in range(cfg.num_branches):
            k1 = np.asarray(block[f"conv1_{b}"]["kernel"], np.float32)
            kernel[1, 1] += k1[0, 0]
            bias += np.asarray(block[f"conv1_{b}"]["bias"], np.float32)
        if cin == cout:
            for o in range(cout):
                kernel[1, 1, o % cin, o] += 1.0
        out[f"block_{i}"] = {"kernel": jnp.asarray(kernel),
                             "bias": jnp.asarray(bias)}
    return out


# ---------------------------------------------------------------------------
# filtering entry points (mirror network.py:77-84, 120-121)
# ---------------------------------------------------------------------------

def apply_filtering(model: nn.Module, params, aux_chw: jnp.ndarray,
                    img_in: jnp.ndarray, exact: bool = False):
    """model forward + guided filtering.

    aux_chw: [B, 8, H, W] (reference layout); img_in: [B, H, W, 4].
    Returns img_out [B, H, W, 4].
    """
    aux_nhwc = jnp.moveaxis(aux_chw, 1, -1)
    weight, guidance = model.apply({"params": params}, aux_nhwc)
    return guided_filter_batch(weight, guidance, img_in, exact=exact,
                               supports=model.config.supports())


# ---------------------------------------------------------------------------
# export artifact (.gnet) -- stands in for the TorchScript .ts module
# ---------------------------------------------------------------------------

_MAGIC = b"GNET0001"


def save_compact(path: str, cfg: GuidanceNetConfig, folded_params,
                 meta: Optional[dict] = None) -> None:
    """``meta`` carries optional per-artifact advice, e.g.
    ``{"denoise_recommended": false, "note": "..."}`` for scenes where the
    measured quality gate shows filtering COSTS quality (hard surfaces are
    near-converged at SPP=6; see PERF.md per-scene denoiser section).
    Consumers that don't understand a key ignore it."""
    hdr = {
        "format": "guidance-net-compact",
        "in_channels": cfg.in_channels,
        "mid_channels": cfg.mid_channels,
        "num_layers": cfg.num_layers,
        "num_branches": cfg.num_branches,
        "kernel_levels": cfg.kernel_levels,
        "identity_level": cfg.identity_level,
        "layout": "NHWC/HWIO",
        "contract": "input [B,8,H,W] f32 -> (weight [B,L,H,W] softmaxed, "
                    "guidance [B,L,H,W]) f32",
    }
    if meta:
        hdr["meta"] = dict(meta)
    header = json.dumps(hdr).encode()
    blob = flax.serialization.to_bytes(folded_params)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)


def load_compact(path: str, with_meta: bool = False):
    """Returns (cfg, params) for GuidanceNetCompact, or
    (cfg, params, meta) when ``with_meta`` (meta = {} if absent)."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a .gnet artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode())
        blob = f.read()
    cfg = GuidanceNetConfig(
        in_channels=header["in_channels"],
        mid_channels=header["mid_channels"],
        num_layers=header["num_layers"],
        num_branches=header["num_branches"],
        kernel_levels=header["kernel_levels"],
        identity_level=bool(header.get("identity_level", False)))
    template = jax.eval_shape(
        lambda: {f"block_{i}": {
            "kernel": jnp.zeros((3, 3, cin, cout), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32)}
            for i, (cin, cout) in enumerate(cfg.layer_channels())})
    params = flax.serialization.from_bytes(template, blob)
    params = jax.tree.map(jnp.asarray, params)
    if with_meta:
        return cfg, params, header.get("meta", {})
    return cfg, params


def compact_and_export(cfg: GuidanceNetConfig, params, path: str = ""):
    """Fold + (optionally) save; returns (compact_model, folded_params).
    Mirrors compact_and_compile (network.py:170-209)."""
    folded = compact_params(cfg, params)
    if path:
        save_compact(path, cfg, folded)
    return GuidanceNetCompact(cfg), folded
