import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from conftest import random_cloud
from nbody_tpu.ops.exhaustive import (
    direct_accelerations,
    exhaustive_accelerations,
)


@pytest.mark.parametrize("n", [10, 100, 333])
def test_direct_matches_oracle_f64(n):
    arr = random_cloud(n, seed=n)
    pos, mass = arr[:, :3], arr[:, 6]
    got = direct_accelerations(
        jnp.asarray(pos, jnp.float64), jnp.asarray(mass, jnp.float64)
    )
    want = oracle.accel_exhaustive(pos, mass)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("mode", ["chunked", "mxu"])
def test_chunked_modes_match_direct(mode):
    arr = random_cloud(500, seed=7)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    want = direct_accelerations(pos, mass)
    got = exhaustive_accelerations(pos, mass, mode=mode, chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3,
                               atol=2e-4)


def test_zero_mass_bodies_are_inert():
    # Padding contract: zero-mass bodies exert no force (core/types.py).
    arr = random_cloud(64, seed=3)
    pos = jnp.asarray(arr[:, :3], jnp.float64)
    mass = jnp.asarray(arr[:, 6], jnp.float64)
    acc = direct_accelerations(pos, mass)
    pos_pad = jnp.concatenate([pos, jnp.zeros((16, 3), jnp.float64)])
    mass_pad = jnp.concatenate([mass, jnp.zeros((16,), jnp.float64)])
    acc_pad = direct_accelerations(pos_pad, mass_pad)
    np.testing.assert_allclose(np.asarray(acc_pad[:64]), np.asarray(acc),
                               rtol=1e-12, atol=1e-12)


def test_self_term_is_zero():
    # The j == i softened self-term vanishes because the displacement is
    # zero (serial/exhaustive.c:165-179) — a single body feels nothing.
    acc = direct_accelerations(
        jnp.asarray([[1.0, 2.0, 3.0]], jnp.float64), jnp.asarray([5.0], jnp.float64)
    )
    np.testing.assert_array_equal(np.asarray(acc), np.zeros((1, 3)))
