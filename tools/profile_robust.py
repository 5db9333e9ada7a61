#!/usr/bin/env python
"""Measure the outlier-robust paths on silicon (escaper-laden fixture).

Fixture: an N-body Plummer sphere with n/10000 escapers flung to ~1000x
the core radius — the input class that collapses a fixed-depth grid's
root cube (docs/PERFORMANCE.md "Outlier/clustered inputs").

Times, per step inside the run (compile cache on, fenced readbacks):
  A. one-shot fused robust eval (barneshut_fused_robust)  [the 413 ms row]
  B. persistent robust s/step   (simulate_persistent, robust_slots>0)
  C. persistent s/step with the naive full cube           [the 3.3 s row]
     (skipped by default: pass --naive to pay for it)

Usage: python tools/profile_robust.py [N] [--naive]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def make_fixture(n: int, seed: int = 0, shell: bool = False):
    """Plummer sphere + escapers (matches tests/test_bh_robust.py).
    `shell` switches to the round-3 shell-like variant (r uniform in
    [0.4, 2.8], 100 escapers) whose ld tradeoff INVERTS the core one."""
    rng = np.random.default_rng(seed)
    if shell:
        r = rng.uniform(0.4, 2.8, n)
    else:
        # Plummer: r = a / sqrt(u^{-2/3} - 1)
        u = rng.uniform(0.05, 0.95, n)
        r = 1.0 / np.sqrt(u ** (-2.0 / 3.0) - 1.0)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = r[:, None] * d
    n_out = 100 if shell else max(4, n // 10000)
    pos[:n_out] *= 1000.0
    vel = rng.uniform(-0.1, 0.1, (n, 3))
    mass = rng.uniform(0.5, 1.5, n)
    return pos, vel, mass, n_out


def main() -> None:
    from nbody_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from nbody_tpu.ops import bh_persistent as bp
    from nbody_tpu.ops.bh_fused import barneshut_fused_robust

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    naive = "--naive" in sys.argv
    shell = "--shell" in sys.argv
    ld_kw = {}
    if "--ld" in sys.argv:
        ld_kw["ld"] = int(sys.argv[sys.argv.index("--ld") + 1])
    n = int(args[0]) if args else 1_000_000
    interpret = jax.default_backend() == "cpu"
    if interpret:
        n = min(n, 2000)

    pos_np, vel_np, mass_np, n_out = make_fixture(n, shell=shell)

    if "--auto" in sys.argv:
        # data-adaptive depth (ops/bh_autold.py): report the pick +
        # per-depth pricing, then run with it
        import time as _t

        from nbody_tpu.ops.bh_autold import choose_ld

        t0 = _t.time()
        pick, _ = choose_ld(
            pos_np, mass_np, robust=True,
            persistent="--persistent-only" not in sys.argv,
            verbose=True,
        )
        print(f"choose_ld pick: {pick} ({_t.time() - t0:.1f}s probe)",
              flush=True)
        ld_kw["ld"] = pick
    pos = jnp.asarray(pos_np, jnp.float32)
    vel = jnp.asarray(vel_np, jnp.float32)
    mass = jnp.asarray(mass_np, jnp.float32)
    slots = max(128, n // 512)
    print(f"n={n} escapers={n_out} robust_slots={slots}", flush=True)

    # A. one-shot robust eval (already recorded; rerun for the same fixture)
    import functools

    fn = jax.jit(functools.partial(
        barneshut_fused_robust, G=1.0, softening_sq=1e-2, theta=0.5,
        interpret=interpret, **ld_kw,
    ))
    acc = fn(pos, mass)
    np.asarray(acc[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = fn(pos, mass)
        np.asarray(acc[:1])
        best = min(best, time.perf_counter() - t0)
    print(f"one-shot robust eval            {best * 1e3:8.1f} ms", flush=True)

    # B. persistent robust: 10 steps, resort every 5
    def run_persistent(robust_slots: int, steps: int = 10):
        t0 = time.perf_counter()
        p, v = bp.simulate_persistent(
            pos, vel, mass, steps, 1e-4, G=1.0, softening_sq=1e-2,
            theta=0.5, resort_every=5, group_size=1024,
            interpret=interpret, robust_slots=robust_slots,
            max_drift_frac=0.0, **ld_kw,
        )
        np.asarray(p[:1])
        return (time.perf_counter() - t0) / steps, p, v

    s_cold, _, _ = run_persistent(slots)   # includes compile
    s_warm, p, v = run_persistent(slots)
    assert bool(jnp.isfinite(p).all()), "non-finite positions"
    print(f"persistent robust               {s_warm * 1e3:8.1f} ms/step "
          f"(cold {s_cold * 1e3:.0f})", flush=True)

    if naive:
        s_naive, _, _ = run_persistent(0, steps=4)
        s_naive, _, _ = run_persistent(0, steps=4)
        print(f"persistent naive cube           {s_naive * 1e3:8.1f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
