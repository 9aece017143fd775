"""Image writing/reading utilities.

Reference: renderer/src/imwrite.cpp:14-86 (libpng RGBA writer with
compression disabled for speed) and the float->uint8 x255 dump at
main_headless.cpp:524-541.
"""

from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 via x255 truncation (main_headless.cpp:536-538
    multiplies by 255 and casts; note: no rounding, for bit parity)."""
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def write_png(path: str, img: np.ndarray) -> None:
    """img: [H, W, 3/4] float in [0,1] or uint8."""
    import imageio.v2 as imageio
    if img.dtype != np.uint8:
        img = to_uint8(img)
    imageio.imwrite(path, img, compress_level=1)


def read_png(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    return np.asarray(imageio.imread(path))


def write_aux_buffer(path: str, aux: np.ndarray) -> None:
    """Raw float32 [8,H,W] dump, bit-compatible with buf_<name>.bin."""
    np.ascontiguousarray(aux, dtype=np.float32).tofile(path)


def read_aux_buffer(path: str, height: int, width: int) -> np.ndarray:
    return np.fromfile(path, dtype=np.float32).reshape(8, height, width)
