"""Per-phase timing and throughput metrics.

The reference instruments with wall-clock around propagation
(serial/exhaustive.c:59-68), per-kernel timers behind -DPRINT_KERNEL_TIME
(cuda/barnes-hut.cu:938-948, 1040-1049), and per-step progress prints
behind PRINT_LOOP (:9, 1037-1039).  The TPU equivalents here:

* Stopwatch — named phase timers with a device fence.  NOTE: on some PJRT
  plugins (the axon tunnel) block_until_ready returns early, so the fence
  is a 1-element device-to-host copy, which cannot complete before the
  producing computation has.
* pairs_per_sec — the throughput meter the benchmarks report
  (pairs = N^2 * (steps + 1); the reference's accounting, BASELINE.md).
* jax.profiler tracing via the `trace` context when a trace dir is given.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import numpy as np


def fence(x) -> None:
    """Reliable device fence: force a tiny D2H copy of x's first element."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[:1] if hasattr(leaves[0], "ravel") else leaves[0]))


class Stopwatch:
    """Accumulating named phase timers (fenced)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            out = box.get("out", result)
            if out is not None:
                fence(out)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name}: {tot:.3f} s total, {tot / n * 1e3:.1f} ms/call x{n}")
        return "\n".join(lines)


def pairs_per_sec(n_bodies: int, n_steps: int, elapsed_s: float) -> float:
    """All-pairs interaction throughput: N^2 pairs per force call,
    (steps + 1) calls per run (initial call serial/exhaustive.c:206)."""
    return float(n_bodies) ** 2 * (n_steps + 1) / elapsed_s


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """jax.profiler trace wrapper (no-op when trace_dir is None)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
