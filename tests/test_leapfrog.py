import os
from functools import partial

import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from conftest import DATA_DIR, random_cloud
from nbody_tpu.core.types import Bodies, SimConfig
from nbody_tpu.integrate.leapfrog import leapfrog_steps, simulate
from nbody_tpu.io.csv import read_trajectory
from nbody_tpu.ops.exhaustive import direct_accelerations


def _force64(pos, mass):
    return direct_accelerations(pos, mass)


def test_matches_numpy_oracle_f64(bodies10):
    b = Bodies.from_numpy(bodies10, dtype=jnp.float64)
    dt = SimConfig.c_float(0.1)
    out, _, hist = leapfrog_steps(b, 50, dt, _force64, with_history=True)
    opos, ovel, ohist = oracle.propagate(
        bodies10[:, :3], bodies10[:, 3:6], bodies10[:, 6], 50, dt
    )
    np.testing.assert_allclose(np.asarray(out.pos), opos, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.vel), ovel, rtol=1e-10, atol=1e-10)
    # scan history rows are the post-drift positions, i.e. oracle frames 1..
    np.testing.assert_allclose(np.asarray(hist), ohist[1:], rtol=1e-10, atol=1e-10)


def test_matches_reference_golden_trajectory(bodies10):
    """Golden parity: the trajectory produced by the compiled reference
    binary (serial/exhaustive.c, -DRESULTS) on tests/data/10_bodies.csv with
    `0 10 0.1`.  Golden rows are %lf-printed (6 decimals), so compare at
    1e-5 absolute."""
    golden, n = read_trajectory(
        os.path.join(DATA_DIR, "golden_exh_10bodies_0_10_0.1.csv")
    )
    assert n == 10
    frames = golden[:, 1:4].reshape(-1, 10, 3)  # (101, 10, 3)

    b = Bodies.from_numpy(bodies10, dtype=jnp.float64)
    dt = SimConfig.c_float(0.1)
    n_steps = SimConfig.n_steps(0.0, 10.0, 0.1)
    assert n_steps == 100
    _, _, hist = leapfrog_steps(b, n_steps, dt, _force64, with_history=True)
    ours = np.concatenate([bodies10[None, :, :3], np.asarray(hist)])
    np.testing.assert_allclose(ours, frames, atol=1.1e-5, rtol=0)


def test_chunked_simulate_identical_to_single_scan(bodies100):
    b = Bodies.from_numpy(bodies100, dtype=jnp.float64)
    dt = 0.01
    ref, _ = leapfrog_steps(b, 37, dt, _force64)

    frames = []
    got = simulate(
        b, 37, dt, _force64, frame_writer=lambda c: frames.append(c), chunk_steps=10
    )
    np.testing.assert_array_equal(np.asarray(got.pos), np.asarray(ref.pos))
    np.testing.assert_array_equal(np.asarray(got.vel), np.asarray(ref.vel))
    allf = np.concatenate(frames)
    assert allf.shape == (38, 100, 3)  # initial frame + 37 steps


def test_energy_drift_matches_serial_oracle():
    """North-star invariant (BASELINE.json): relative energy drift matching
    the serial reference within 1e-3.  A softened-force random cloud drifts
    by whatever the close encounters dictate (the reference does too — PE is
    unsoftened while the force is softened); what must hold is that our
    drift equals the serial implementation's drift on the same run."""
    arr = random_cloud(100, seed=42)
    b = Bodies.from_numpy(arr, dtype=jnp.float64)
    ke0, pe0 = oracle.energy(arr[:, :3], arr[:, 3:6], arr[:, 6])
    e0 = ke0 + pe0
    out, _ = leapfrog_steps(b, 1000, 0.001, _force64)
    ke1, pe1 = oracle.energy(
        np.asarray(out.pos), np.asarray(out.vel), np.asarray(out.mass)
    )
    drift = abs((ke1 + pe1) - e0) / abs(e0)

    opos, ovel, _ = oracle.propagate(
        arr[:, :3], arr[:, 3:6], arr[:, 6], 1000, 0.001
    )
    oke1, ope1 = oracle.energy(opos, ovel, arr[:, 6])
    drift_serial = abs((oke1 + ope1) - e0) / abs(e0)
    assert abs(drift - drift_serial) < 1e-3, (drift, drift_serial)


def test_energy_drift_bounded_solar_system(data_dir):
    """On a well-conditioned system (sun_earth.csv: the real solar system in
    SI units) the integrator must conserve energy to well under 1e-3 over
    2000 steps of dt=1000 s."""
    from nbody_tpu.io.csv import read_bodies

    arr = read_bodies(os.path.join(DATA_DIR, "sun_earth.csv"))
    b = Bodies.from_numpy(arr, dtype=jnp.float64)
    G_SI = 6.67e-11
    force = partial(direct_accelerations, G=G_SI)
    ke0, pe0 = oracle.energy(arr[:, :3], arr[:, 3:6], arr[:, 6], G=G_SI)
    e0 = ke0 + pe0
    out, _ = leapfrog_steps(b, 2000, 1000.0, force)
    ke1, pe1 = oracle.energy(
        np.asarray(out.pos), np.asarray(out.vel), np.asarray(out.mass), G=G_SI
    )
    drift = abs((ke1 + pe1) - e0) / abs(e0)
    assert drift < 1e-6, drift


def test_yoshida4_higher_order_drift():
    """The 4th-order Yoshida integrator must conserve energy far better
    than KDK at the same dt on a well-conditioned system, and its error
    must shrink ~dt^4 (KDK shrinks ~dt^2)."""
    from nbody_tpu.io.csv import read_bodies

    arr = read_bodies(os.path.join(DATA_DIR, "sun_earth.csv"))
    b = Bodies.from_numpy(arr, dtype=jnp.float64)
    G_SI = 6.67e-11
    force = partial(direct_accelerations, G=G_SI)
    ke0, pe0 = oracle.energy(arr[:, :3], arr[:, 3:6], arr[:, 6], G=G_SI)
    e0 = ke0 + pe0

    def drift(integrator, dt, steps):
        out, _ = leapfrog_steps(b, steps, dt, force, integrator=integrator)
        ke, pe = oracle.energy(
            np.asarray(out.pos), np.asarray(out.vel), np.asarray(out.mass),
            G=G_SI,
        )
        return abs((ke + pe) - e0) / abs(e0)

    d_kdk = drift("leapfrog", 20000.0, 500)
    d_y4 = drift("yoshida4", 20000.0, 500)
    assert d_y4 < d_kdk / 50, (d_y4, d_kdk)

    # order check: halving dt cuts the y4 error by ~16x (allow slack)
    d_y4_half = drift("yoshida4", 10000.0, 1000)
    assert d_y4_half < d_y4 / 8, (d_y4_half, d_y4)
