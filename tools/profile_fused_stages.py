#!/usr/bin/env python
"""Hardware cost bisection of the fused traversal kernel's stages.

Runs the REAL kernel (not a mock) at each debug_mode cut — "none" (the
XLA pre/post phases + block pipeline only: sort, grid build, grouping,
scatter-back, with a dummy kernel body), "pops" (+ BFS frontier
traversal and classify), "stage" (+ COM/range staging, row allocation,
VMEM copies), "dma" (+ HBM near-window DMAs and waits), "full" (+ the
(B,128) eval math) — so each increment prices one mechanism on silicon.  The
production kernel is unchanged: non-"full" branches are static and trace
away.  Companion of tools/mb_kernel.py (which bisected the pop loop the
same way before the kernel existed).

Usage: python tools/profile_fused_stages.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    from nbody_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from nbody_tpu.diag import bh_phases  # noqa: F401 (import side effects none)
    from nbody_tpu.ops import bh_fused as bf

    pos_args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(pos_args[0]) if pos_args else 1_000_000
    interpret = jax.default_backend() == "cpu"
    if interpret:
        n = min(n, 2000)

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32)

    import functools

    prev = None
    modes = ("none", "pops", "stage", "dma", "full")
    if "--split-stage" in sys.argv:
        # price the far-COM and near-range staging branches separately
        modes = ("pops", "stagefar", "stagenear", "stage")
    far_vector = "--scalar-far" not in sys.argv  # A/B: round-5 far staging
    for mode in modes:
        fn = jax.jit(
            functools.partial(
                bf.barneshut_fused, interpret=interpret, debug_mode=mode,
                far_vector=far_vector,
            )
        )
        acc = fn(pos, mass)
        np.asarray(acc[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            acc = fn(pos, mass)
            np.asarray(acc[:1])
            best = min(best, time.perf_counter() - t0)
        delta = "" if prev is None else f"  (+{(best - prev) * 1e3:.0f} ms)"
        print(f"{mode:>5}: {best * 1e3:7.1f} ms{delta}", flush=True)
        prev = best


if __name__ == "__main__":
    main()
