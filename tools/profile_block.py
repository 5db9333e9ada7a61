#!/usr/bin/env python
"""Price block/tiered time steps on hardware (1M-body Plummer).

Prints per-MACRO-step times for: plain kdk at dt (coarse floor), plain
kdk at the finest tier's dt (the uniform-fine cost block mode avoids),
and kdk_block_steps with criterion-assigned tiers — plus the tier
histogram and the predicted/measured eval-budget ratio.

Usage: python tools/profile_block.py [n] [n_tiers]
"""

import math
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

    from nbody_tpu.ops import bh_persistent as bp
    from nbody_tpu.utils.fixtures import plummer_cloud

    pos_args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(pos_args[0]) if pos_args else 1_000_000
    n_tiers = int(pos_args[1]) if len(pos_args) > 1 else 3
    interpret = jax.default_backend() == "cpu"
    if interpret:
        n = min(n, 2000)
    gs = 1024 if n > 4096 else 128
    eps2 = 1e-4
    eta = 0.01
    macro = 4

    if "--stratified" in sys.argv:
        # the block-step win regime: a tight hot core embedded in a wide
        # cold halo — per-group acceleration scales stratify across
        # Morton groups instead of collapsing (docs/PERFORMANCE.md)
        rng = np.random.default_rng(3)
        nc = n // 10
        core = plummer_cloud(nc, seed=3, total_mass=0.5, G=1.0)
        core[:, 0:3] *= 0.05
        core[:, 3:6] *= math.sqrt(1.0 / 0.05)  # rescaled virial speeds
        u = rng.normal(size=(n - nc, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        r = 10.0 * rng.uniform(0.2, 1.0, n - nc)[:, None] ** (1 / 3)
        halo = np.concatenate(
            [u * r, rng.normal(0, 0.05, (n - nc, 3)),
             np.full((n - nc, 1), 0.5 / (n - nc))], axis=1,
        )
        arr = np.concatenate([core, halo], axis=0)
    else:
        arr = plummer_cloud(n, seed=3, total_mass=1.0, G=1.0)
    _, ld, _, _ = bp._layout(n, gs)
    fkw = dict(theta=0.5, softening_sq=eps2, leaf_cap=64, ld=ld,
               interpret=interpret)
    st = bp.init_state(
        jnp.asarray(arr[:, 0:3], jnp.float32),
        jnp.asarray(arr[:, 3:6], jnp.float32),
        jnp.asarray(arr[:, 6], jnp.float32),
        G=1.0, group_size=gs,
    )
    st = bp.prime(st, **fkw)

    # dt sized so the hottest group needs the finest tier
    a2 = jnp.sum(st.acc * st.acc, axis=1)
    amax = float(jnp.sqrt(jnp.max(jnp.where(st.valid, a2, 0.0))))
    dt_req_min = math.sqrt(2 * eta * math.sqrt(eps2) / amax)
    dt = dt_req_min * (1 << (n_tiers - 1)) * 0.9
    tiers = bp.assign_tiers(st, dt, eta=eta, eps=math.sqrt(eps2),
                            n_tiers=n_tiers)
    t_np = np.asarray(tiers)
    occ = np.asarray(st.gcount) > 0
    hist = np.bincount(t_np[occ], minlength=n_tiers)
    s_per = 1 << (n_tiers - 1)
    L = s_per >> t_np
    evals_block = sum(int((((s + 1) % L) == 0)[occ].sum())
                      for s in range(s_per))
    evals_fine = s_per * int(occ.sum())
    print(f"n={n} n_tiers={n_tiers} dt={dt:.3e} tier histogram={hist} "
          f"eval budget block/fine={evals_block}/{evals_fine} "
          f"({evals_block / evals_fine:.2f})")

    def bench(label, fn, calls=1):
        """fn is dispatched `calls` times per measurement (keep every
        single dispatch under ~60 s — the tunneled chip's execution
        watchdog kills longer device programs)."""
        def run():
            out = None
            for _ in range(calls):
                out = fn()
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        run()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:<42}{best / macro * 1e3:9.1f} ms/macro-step")
        return best

    t_coarse = bench("plain kdk at dt (coarse floor)",
                     lambda: bp.kdk_steps(st, macro, dt, **fkw))
    # uniform fine: dispatch per macro step, not one long scan
    t_fine = bench(f"plain kdk at dt/{s_per} (uniform fine)",
                   lambda: bp.kdk_steps(st, s_per, dt / s_per, **fkw),
                   calls=macro)
    t_masked = bench(
        f"block tiers (K={n_tiers}, masked)",
        lambda: bp.kdk_block_steps(st, tiers, 1, dt,
                                   n_tiers=n_tiers, **fkw), calls=macro)
    order, sizes = bp.tier_order_sizes(tiers, n_tiers)
    print(f"prefix sizes per sub-step valuation: {sizes}")
    t_prefix = bench(
        f"block tiers (K={n_tiers}, prefix)",
        lambda: bp.kdk_block_prefix_steps(st, tiers, order, 1, dt,
                                          sizes=sizes, n_tiers=n_tiers,
                                          **fkw), calls=macro)

    if "--record" in sys.argv and not interpret:
        # gated by tests/test_bench_gate.py::test_block_tiers_record —
        # the silicon A/B that decides the CLI default (VERDICT r4
        # item 3): if prefixes lose, the record says so and the default
        # flips back
        import json

        rec = {
            "n": n, "n_tiers": n_tiers, "stratified":
                "--stratified" in sys.argv,
            "tier_histogram": hist.tolist(),
            "coarse_ms": t_coarse / macro * 1e3,
            "uniform_fine_ms": t_fine / macro * 1e3,
            "masked_ms": t_masked / macro * 1e3,
            "prefix_ms": t_prefix / macro * 1e3,
            "unit": "ms/macro-step", "backend": "tpu",
        }
        out = os.path.join(os.path.dirname(__file__), "..", "bench",
                           "block_tiers.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"recorded -> {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
