import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from conftest import random_cloud
from nbody_tpu.diag.energy import energy_drift, get_energy


def test_matches_reference_self_test():
    """Golden values from compiling common/get_energy.c with
    -DTEST_GET_ENERGY (:49-58) and running it:
    KE: 1629932.000000000000000, PE: -207.735345789164597"""
    vel = np.array(
        [5, 65, 105, -18, 9, -89, -64, 23, 32, 45, 45, 45, -29, -71, -61],
        dtype=np.float64,
    ).reshape(5, 3)
    pos = np.array(
        [90, 44, -32, 33, 100, 9, -84, -4, 0, 103, 182, 71, 9, 2, -103],
        dtype=np.float64,
    ).reshape(5, 3)
    mass = np.array([103, 50, 88, 34, 59], dtype=np.float64)
    ke, pe = get_energy(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass), G=0.7
    )
    assert float(ke) == pytest.approx(1629932.0, rel=1e-12)
    assert float(pe) == pytest.approx(-207.735345789164597, rel=1e-10)


@pytest.mark.parametrize("n", [5, 100, 1500])
def test_matches_numpy_oracle(n):
    arr = random_cloud(n, seed=n + 1)
    ke_o, pe_o = oracle.energy(arr[:, :3], arr[:, 3:6], arr[:, 6])
    ke, pe = get_energy(
        jnp.asarray(arr[:, :3]),
        jnp.asarray(arr[:, 3:6]),
        jnp.asarray(arr[:, 6]),
        chunk=256,
    )
    assert float(ke) == pytest.approx(ke_o, rel=1e-12)
    assert float(pe) == pytest.approx(pe_o, rel=1e-9)


def test_coincident_bodies_guarded():
    # 1/r is guarded to 0 at r == 0 (common/get_energy.c:40).
    pos = jnp.zeros((2, 3), jnp.float64)
    vel = jnp.zeros((2, 3), jnp.float64)
    mass = jnp.ones((2,), jnp.float64)
    ke, pe = get_energy(pos, vel, mass)
    assert float(ke) == 0.0
    assert float(pe) == 0.0


def test_energy_drift_helper():
    assert energy_drift(-1.001, -1.0) == pytest.approx(1e-3)
    assert energy_drift(5.0, 0.0) == 5.0


def test_pallas_potential_energy_matches_oracle():
    from nbody_tpu.diag.energy import pallas_potential_energy

    arr = random_cloud(700, seed=77)
    _, pe_o = oracle.energy(arr[:, :3], arr[:, 3:6], arr[:, 6])
    pe = pallas_potential_energy(
        jnp.asarray(arr[:, :3], jnp.float32),
        jnp.asarray(arr[:, 6], jnp.float32),
        block=256,
        interpret=True,
    )
    assert float(pe) == pytest.approx(pe_o, rel=1e-4)
