"""Three-phase frame timer (render / net / filter).

Reference: RenderContext::Timer (render_context.hpp:122-213) -- cudaEvent
pairs around launch_renderer, the TorchScript forward, and the filtering
kernel, reported as per-phase mean ms + FPS.

TPU adaptation: there are no stream events; phases are timed by forcing a
tiny data-dependent readback (a scalar checksum) after each phase's jit.
(`block_until_ready` is not a reliable completion barrier through the
remote-device tunnel used in this environment, so a 4-byte readback is the
portable sync primitive.)  The production render path stays fully fused;
the timed path trades a little dispatch overhead for the phase split.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

T_RENDER, T_NET, T_FILTER = 0, 1, 2
_NAMES = ("render", "net", "filter")


@jax.jit
def _checksum(x):
    return jnp.sum(jax.tree.leaves(x)[0][..., :1])


def sync(x) -> None:
    """Force completion of the computation producing x."""
    float(_checksum(x))


class PhaseTimer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = [0.0, 0.0, 0.0]
        self.cnt = 0
        self._t0 = None

    def phase(self, idx: int):
        return _PhaseCtx(self, idx)

    def frame_done(self):
        self.cnt += 1

    def means_ms(self):
        c = max(self.cnt, 1)
        return [s * 1000.0 / c for s in self.sum]

    def report(self) -> str:
        m = self.means_ms()
        total = sum(m)
        fps = 1000.0 / total if total > 0 else float("inf")
        lines = [f"[Timer] frames: {self.cnt}"]
        for name, v in zip(_NAMES, m):
            lines.append(f"[Timer]   {name:>6s}: {v:9.3f} ms")
        lines.append(f"[Timer]   total : {total:9.3f} ms  ({fps:.2f} FPS)")
        return "\n".join(lines)


class _PhaseCtx:
    def __init__(self, timer: PhaseTimer, idx: int):
        self.timer = timer
        self.idx = idx

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.timer.sum[self.idx] += time.perf_counter() - self._t0
        return False
