#!/usr/bin/env python
"""Record the long-run energy-drift curve (the per-round physics record).

The perf grid (tools/bench_grid.py -> bench/bench_grid_best.json) pins
throughput per round; this pins the PHYSICS over time: a 500-step KDK
run of a virialized-ish 10k-body cloud through the Barnes-Hut force,
with |dE/E0| sampled every 25 steps.  A symplectic integrator's drift
must stay bounded (oscillate, not grow) — the curve, not just the
endpoint, is the contract, and tests/test_bench_gate.py gates the
recorded file (max < 1e-3, no trend) so a regression in any force path
or integrator shows up as a physics failure, not just a wrong number.

The reference's analog is utils/check_error.py's error-growth polyfit
over frames 30..101 (SURVEY.md §2.3); this is the same idea applied to
the conserved quantity instead of a trajectory diff.

Writes bench/drift_series.json: one JSON line per sample
{"step": k, "drift": d, ...} plus a header line with the config.
On CPU the sizes shrink (n=2000, 200 steps) — the record shipped in
bench/ was produced on the TPU chip.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    from nbody_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from nbody_tpu.core.types import Bodies
    from nbody_tpu.diag.energy import energy_drift, get_energy
    from nbody_tpu.integrate.leapfrog import leapfrog_steps
    from nbody_tpu.ops.barneshut import barneshut_accelerations
    from nbody_tpu.ops.bh_fused import barneshut_fused, barneshut_fused_robust

    on_tpu = jax.default_backend() not in ("cpu",)
    n = 10_000 if on_tpu else 2_000
    pos_args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if pos_args:
        n = int(pos_args[0])
    total, stride = (500, 25) if on_tpu else (200, 25)
    if n >= 1_000_000:
        # benchmark-scale drift record (VERDICT r3 item 5): fewer steps,
        # same curve-shape contract; ~0.35 s/step + a Pallas PE per sample
        total, stride = (200, 20)
    # Plummer equilibrium with t_dyn = sqrt(a^3 / GM) = 1: 500 steps of
    # dt = 1e-3 integrate half a dynamical time of a self-bound cluster —
    # a real stationarity test, unlike a cold cloud (which collapses and
    # turns the run into a softening test)
    dt = 1e-3
    theta = 0.5
    eps2 = 1e-4  # eps = a/100, well under the central interparticle gap
    if on_tpu and n >= 1_000_000:
        # the Plummer fixture's radial tail inflates the fixed-depth
        # grid's root cube (docs/PERFORMANCE.md clustered-input
        # characterization): the plain fused eval ships ~100x the
        # uniform cloud's near volume (~3.3 s/step — a 20-step sample
        # dispatch then trips the tunneled chip's ~90 s execution
        # watchdog).  The outlier-robust EXACT hybrid is what the CLI
        # auto-engages for this input class; same physics, ~8x faster.
        force = (lambda p, m: barneshut_fused_robust(
            p, m, theta=theta, softening_sq=eps2))
    elif on_tpu:
        force = (lambda p, m: barneshut_fused(
            p, m, theta=theta, softening_sq=eps2))
    else:
        force = (lambda p, m: barneshut_accelerations(
            p, m, theta=theta, softening_sq=eps2))

    from nbody_tpu.utils.fixtures import plummer_cloud

    arr = plummer_cloud(n, seed=12, total_mass=1.0, G=1.0)
    bodies = Bodies(
        pos=jnp.asarray(arr[:, 0:3], jnp.float32),
        vel=jnp.asarray(arr[:, 3:6], jnp.float32),
        mass=jnp.asarray(arr[:, 6], jnp.float32),
    )
    if n >= 1_000_000 and on_tpu:
        # f32 PE accumulation error at 1M (~1e-4 relative) would swamp
        # the drift signal; the compensated-f32x2 kernel is fp64-grade
        from nbody_tpu.ops.pallas_df import pallas_potential_energy_df

        def measure_energy(b):
            # KE in HOST fp64: an on-device f32 sum over 1M bodies
            # quantizes at ~1e-7 relative — every sample of the round-4
            # record was an exact multiple of the f32 ulp of E (VERDICT
            # r4 weak #6), masking the df PE's actual noise floor.  16 MB
            # of readback once per 25 steps is free next to the run.
            m = np.asarray(b.mass, np.float64)
            v = np.asarray(b.vel, np.float64)
            ke = 0.5 * float(np.sum(m * np.sum(v * v, axis=-1)))
            pe = float(pallas_potential_energy_df(b.pos, b.mass, G=1.0))
            return ke, pe
    else:
        def measure_energy(b):
            ke, pe = get_energy(b.pos, b.vel, b.mass, G=1.0)
            return float(ke), float(pe)

    ke0, pe0 = measure_energy(bodies)
    e0 = float(ke0 + pe0)

    name = "drift_series.json" if n < 1_000_000 else "drift_series_1m.json"
    out = os.path.join(os.path.dirname(__file__), "..", "bench", name)
    lines = [json.dumps({
        "config": {"n": n, "steps": total, "stride": stride, "dt": dt,
                   "theta": theta, "algo": "barnes-hut",
                   "robust": bool(on_tpu and n >= 1_000_000),
                   "integrator": "leapfrog",
                   "backend": jax.default_backend()},
        "e0": e0, "ke0": float(ke0), "pe0": float(pe0),
    })]

    acc = None
    cur = bodies
    for k in range(stride, total + 1, stride):
        cur, acc = leapfrog_steps(cur, stride, dt, force, acc0=acc)
        ke, pe = measure_energy(cur)
        d = energy_drift(float(ke + pe), e0)
        rec = {"step": k, "drift": d, "ke": float(ke), "pe": float(pe)}
        print(json.dumps(rec), flush=True)
        lines.append(json.dumps(rec))

    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
