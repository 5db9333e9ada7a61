"""Persistent-Morton-order integration (nbody_tpu.ops.bh_persistent).

Interpret-mode Pallas on the forced-CPU mesh; small N (the fused kernel
executes pop-by-pop in interpret mode).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle import accel_exhaustive_f64

from nbody_tpu.ops.bh_persistent import (
    _layout,
    emit,
    init_state,
    kdk_steps,
    prime,
    resort,
    simulate_persistent,
)

pytestmark = pytest.mark.heavy  # interpret-mode kernels: quick tier skips

EPS2 = 0.01
G = 1.0


def _cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32),
        jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32),
    )


def _direct(pos, mass):
    # EPS2/G here match tests.oracle's module constants (0.01 / 1.0)
    return accel_exhaustive_f64(pos, mass, G=G)


def _fkw(n, group_size=128):
    _, ld, _, _ = _layout(n, group_size)
    return dict(
        theta=0.5, softening_sq=EPS2, leaf_cap=64, ld=ld, interpret=True
    )


def test_state_roundtrip_and_initial_forces():
    n = 500
    pos, vel, mass = _cloud(n, seed=1)
    st = init_state(pos, vel, mass, G=G, group_size=128)
    p2, v2 = emit(st, n)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(vel), atol=1e-6)

    st = prime(st, **_fkw(n))
    acc = np.zeros((n, 3), np.float32)
    dest = np.asarray(st.orig).reshape(-1)
    keep = dest < n
    acc[dest[keep]] = np.asarray(st.acc).transpose(0, 2, 1).reshape(-1, 3)[keep]
    want = _direct(pos, mass)
    err = np.abs(acc - want).max() / np.abs(want).max()
    assert err < 0.02, err


def test_persistent_matches_per_step_resort():
    """4 steps without resorting vs 4 steps resorting every step: the
    stale-partition MAC error must stay far below theta-level force error
    for small-dt drift."""
    n = 400
    pos, vel, mass = _cloud(n, seed=3)
    dt = 1e-3
    p_a, v_a = simulate_persistent(
        pos, vel, mass, 4, dt, group_size=128, resort_every=4,
        interpret=True,
    )
    p_b, v_b = simulate_persistent(
        pos, vel, mass, 4, dt, group_size=128, resort_every=1,
        interpret=True,
    )
    dp = np.abs(np.asarray(p_a) - np.asarray(p_b)).max()
    assert dp < 1e-5, dp


def test_persistent_matches_leapfrog_reference():
    """The persistent path must reproduce the standard KDK + fp64 direct
    trajectory at theta accuracy."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.integrate.leapfrog import leapfrog_steps
    from nbody_tpu.ops.exhaustive import direct_accelerations

    n = 400
    pos, vel, mass = _cloud(n, seed=5)
    dt = 1e-3
    steps = 3
    p_a, _ = simulate_persistent(
        pos, vel, mass, steps, dt, group_size=128, resort_every=2,
        interpret=True,
    )
    ref, _ = leapfrog_steps(
        Bodies(pos, vel, mass), steps, dt, direct_accelerations
    )
    dp = np.abs(np.asarray(p_a) - np.asarray(ref.pos)).max()
    assert dp < 5e-4, dp


def test_resort_preserves_bodies():
    """Resorting is a pure relabeling: emitted state identical before and
    after."""
    n = 300
    pos, vel, mass = _cloud(n, seed=7)
    st = init_state(pos, vel, mass, G=G, group_size=128)
    st2 = resort(st, n, 128)
    p1, v1 = emit(st, n)
    p2, v2 = emit(st2, n)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=0)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=0)
    # group occupancy accounts for every body exactly once
    assert int(jnp.sum(st2.gcount)) == n


def test_persistent_long_run_energy_drift():
    """100 KDK steps with resorts every 10: the symplectic drift bound
    (|dE/E0| <= 1e-3, the BASELINE.md contract) must survive the
    stale-partition approximation across many resort cycles."""
    from nbody_tpu.diag.energy import energy_drift, get_energy

    n = 400
    pos, vel, mass = _cloud(n, seed=21)
    vel = vel * 0.3  # loosely bound cloud
    ke0, pe0 = get_energy(pos, vel, mass, G=G)
    p1, v1 = simulate_persistent(
        pos, vel, mass, 100, 1e-4, group_size=128, resort_every=10,
        interpret=True,
    )
    ke1, pe1 = get_energy(p1, v1, mass, G=G)
    drift = energy_drift(float(ke1 + pe1), float(ke0 + pe0))
    assert abs(drift) < 1e-3, drift


def test_drift_guard_forces_per_step_resort():
    """Hot systems (drift per chunk > max_drift_frac of a terminal cell)
    must fall back to per-step resorts: with velocities that large, the
    resort_every=8 run degenerates to exactly the resort_every=1
    execution — bitwise."""
    n = 300
    pos, vel, mass = _cloud(n, seed=31)
    vel = vel * 100.0  # guaranteed to trip the guard at dt=1e-3
    a = simulate_persistent(
        pos, vel, mass, 4, 1e-3, group_size=128, resort_every=4,
        interpret=True,
    )
    b = simulate_persistent(
        pos, vel, mass, 4, 1e-3, group_size=128, resort_every=1,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_adaptive_persistent_matches_unsharded_adaptive():
    """simulate_persistent_adaptive vs integrate/adaptive.simulate_adaptive
    over the same fused force: same dt criterion, same landing, close
    trajectories (layout + resort relabeling are exact, so the only
    divergence is f32 op-order noise)."""
    from functools import partial

    from nbody_tpu.core.types import Bodies
    from nbody_tpu.integrate.adaptive import simulate_adaptive
    from nbody_tpu.ops.bh_fused import barneshut_fused
    from nbody_tpu.ops.bh_persistent import simulate_persistent_adaptive

    # COST NOTE: every chunk of either driver re-traces the
    # interpret-mode fused kernel (minutes per compile on the 1-core
    # host) — keep each side to ONE 3-step chunk
    n = 400
    pos, vel, mass = _cloud(n, seed=5)
    dt_max = 5e-3
    t_end = 1.2e-2
    eta = 0.05

    fkw = _fkw(n)
    force = partial(
        barneshut_fused, G=G, softening_sq=EPS2, theta=0.5,
        ld=fkw["ld"], group_size=128, interpret=True,
    )
    want, taken_ref = simulate_adaptive(
        Bodies(pos, vel, mass), 0.0, t_end, force,
        eta=eta, softening_sq=EPS2, dt_max=dt_max, chunk_steps=3,
    )
    p_got, v_got, taken = simulate_persistent_adaptive(
        pos, vel, mass, 0.0, t_end,
        G=G, softening_sq=EPS2, theta=0.5, eta=eta, dt_max=dt_max,
        group_size=128, resort_every=3, interpret=True,
    )
    assert taken == taken_ref, (taken, taken_ref)
    scale = np.abs(np.asarray(want.pos)).max()
    assert np.abs(np.asarray(p_got) - np.asarray(want.pos)).max() < 1e-4 * scale
    assert np.abs(np.asarray(v_got) - np.asarray(want.vel)).max() < 2e-3


def test_adaptive_persistent_exact_landing_and_frames():
    """The run lands exactly on t_end; frames carry only real steps."""
    from nbody_tpu.ops.bh_persistent import simulate_persistent_adaptive

    n = 300
    pos, vel, mass = _cloud(n, seed=6)
    frames = []
    p_got, v_got, taken = simulate_persistent_adaptive(
        pos, vel, mass, 0.0, 1e-2,
        G=G, softening_sq=EPS2, theta=0.5, eta=0.5, dt_max=4e-3,
        group_size=128, resort_every=4, interpret=True,
        frame_writer=lambda a: frames.append(np.array(a)),
    )
    total_rows = sum(f.shape[0] for f in frames)
    assert total_rows == taken + 1  # initial frame + one per real step
    # dt_max = 4e-3 with a generous eta: exactly ceil(1e-2/4e-3) = 3 steps
    assert taken == 3
    np.testing.assert_allclose(frames[-1][-1], np.asarray(p_got), atol=1e-6)


def _merge_cloud(n, seed=9, pairs=3, gap=5e-4):
    """Random cloud plus `pairs` engineered contact pairs at distance
    `gap` (bodies 0..2*pairs-1).  The random cloud's typical nearest-
    neighbor distance at n <= 500 in [-2, 2]^3 is ~0.1, so a merge
    radius between gap and ~0.05 makes every merge decision robust to
    theta-level force differences between paths."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-2, 2, (n, 3))
    for k in range(pairs):
        pos[2 * k + 1] = pos[2 * k] + [gap, 0, 0]
    return (
        jnp.asarray(pos, jnp.float32),
        jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32),
    )


def test_persistent_merging_matches_unsharded():
    """Merging composed with the persistent layout (VERDICT r4 item 6)
    vs ops/collisions.simulate_merging over the fp64-direct force: the
    engineered contact pairs make merge decisions identical, so masses
    agree exactly and trajectories to theta-level tolerance."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.ops.collisions import simulate_merging
    from nbody_tpu.ops.exhaustive import direct_accelerations

    n = 400
    pos, vel, mass = _merge_cloud(n)
    dt = 1e-3
    steps = 4
    reports = []
    p_a, v_a, m_a = simulate_persistent(
        pos, vel, mass, steps, dt, group_size=128, resort_every=2,
        interpret=True, merge_radius=0.01, merge_every=2,
        merge_report=reports.append,
    )
    ref, _, nm_ref = simulate_merging(
        Bodies(pos, vel, mass), steps, dt, direct_accelerations,
        radius=0.01, merge_every=2,
    )
    assert reports == [int(nm_ref)] and reports[0] == 3
    # identical merge decisions -> identical f32 mass sums
    np.testing.assert_array_equal(np.asarray(m_a), np.asarray(ref.mass))
    dp = np.abs(np.asarray(p_a) - np.asarray(ref.pos)).max()
    dv = np.abs(np.asarray(v_a) - np.asarray(ref.vel)).max()
    assert dp < 1e-3, dp
    assert dv < 2e-3, dv


def test_persistent_merging_conserves():
    """Mass exactly, momentum to f32 tolerance, through rebuilds; and
    the rebuilt layout keeps integrating (merge at step 2 of 6)."""
    n = 400
    pos, vel, mass = _merge_cloud(n, seed=11)
    p, v, m = simulate_persistent(
        pos, vel, mass, 6, 1e-3, group_size=128, resort_every=3,
        interpret=True, merge_radius=0.01, merge_every=2,
    )
    m_np = np.asarray(m, np.float64)
    mass_np = np.asarray(mass, np.float64)
    assert np.sum(m_np == 0.0) == 3  # three absorbed ghosts
    np.testing.assert_allclose(m_np.sum(), mass_np.sum(), rtol=1e-6)
    # momentum: merging conserves it exactly; the integrator's forces
    # are antisymmetric only to f32 rounding
    p0 = (mass_np[:, None] * np.asarray(vel, np.float64)).sum(axis=0)
    p1 = (m_np[:, None] * np.asarray(v, np.float64)).sum(axis=0)
    assert np.abs(p1 - p0).max() < 5e-3, (p0, p1)


def test_persistent_merging_robust_mode():
    """Merging composes with the outlier-robust persistent layout (the
    rebuild re-derives the outlier slots from the merged masses)."""
    n = 400
    pos, vel, mass = _merge_cloud(n, seed=13)
    # fling two bodies far out so robust mode has real outliers
    pos = pos.at[-1].set(jnp.asarray([40.0, 0, 0], jnp.float32))
    pos = pos.at[-2].set(jnp.asarray([0, -35.0, 0], jnp.float32))
    p, v, m = simulate_persistent(
        pos, vel, mass, 4, 1e-3, group_size=128, resort_every=2,
        interpret=True, merge_radius=0.01, merge_every=2,
        robust_slots=64,
    )
    m_np = np.asarray(m, np.float64)
    assert np.sum(m_np == 0.0) == 3
    np.testing.assert_allclose(
        m_np.sum(), np.asarray(mass, np.float64).sum(), rtol=1e-6
    )


def test_chunked_steps_match_kdk():
    """kdk_steps_chunked (the watchdog-safe huge-N stepper) must match
    the monolithic kdk_steps: per-group results are independent, so
    slicing the target side cannot change them."""
    from nbody_tpu.ops.bh_persistent import kdk_steps_chunked

    n = 400
    pos, vel, mass = _cloud(n, seed=21)
    fkw = _fkw(n)
    st0 = init_state(pos, vel, mass, G=G, group_size=128)
    st0 = prime(st0, **fkw)
    a = kdk_steps(st0, 2, 1e-3, **fkw)
    b = kdk_steps_chunked(st0, 2, 1e-3, n_chunks=3, **fkw)
    np.testing.assert_allclose(
        np.asarray(a.pg), np.asarray(b.pg), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.vel), np.asarray(b.vel), atol=1e-6
    )


def test_simulate_persistent_force_chunks():
    """force_chunks > 1 (the >25M auto path) must reproduce the
    unchunked trajectory, across a resort boundary."""
    n = 400
    pos, vel, mass = _cloud(n, seed=23)
    a = simulate_persistent(
        pos, vel, mass, 4, 1e-3, group_size=128, resort_every=2,
        interpret=True,
    )
    b = simulate_persistent(
        pos, vel, mass, 4, 1e-3, group_size=128, resort_every=2,
        interpret=True, force_chunks=2,
    )
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               atol=1e-6)
