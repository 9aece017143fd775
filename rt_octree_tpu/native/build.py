"""Build the native runtime helper library (g++, C ABI, ctypes-loaded).

Run: python -m rt_octree_tpu.native.build
The package works without it (NumPy fallbacks); the native paths are
10-100x faster for large trees.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "rt_native.cpp")
LIB = os.path.join(HERE, "librt_native.so")


def build(verbose: bool = True) -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", SRC, "-o", LIB]
    if verbose:
        print("[native] " + " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return LIB


def ensure_built() -> str | None:
    """Build if stale/missing; returns lib path or None on failure."""
    try:
        if (not os.path.exists(LIB) or
                os.path.getmtime(LIB) < os.path.getmtime(SRC)):
            build(verbose=False)
        return LIB
    except Exception:
        return None


if __name__ == "__main__":
    build()
