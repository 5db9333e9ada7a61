"""Multi-chip paths exercised on the virtual 8-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from conftest import random_cloud
from nbody_tpu.core.types import Bodies
from nbody_tpu.integrate.leapfrog import leapfrog_steps
from nbody_tpu.ops.exhaustive import direct_accelerations, rect_accelerations
from nbody_tpu.parallel.mesh import make_mesh
from nbody_tpu.parallel.sharding import (
    shard_bodies,
    shard_force_fn,
    sharded_energy,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(jax.devices()[:8])


def test_sharded_force_matches_single_device(mesh):
    arr = random_cloud(256, seed=1)
    pos = jnp.asarray(arr[:, :3], jnp.float64)
    mass = jnp.asarray(arr[:, 6], jnp.float64)
    want = np.asarray(direct_accelerations(pos, mass))
    force = shard_force_fn(rect_accelerations, mesh=mesh)
    got = np.asarray(force(pos, mass))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_sharded_simulation_parity(mesh):
    arr = random_cloud(128, seed=2)
    b = Bodies.from_numpy(arr, dtype=jnp.float64)
    force = shard_force_fn(rect_accelerations, mesh=mesh)
    b_sharded = shard_bodies(b, mesh=mesh)
    out_s, _ = leapfrog_steps(b_sharded, 20, 0.01, force)
    out_r, _ = leapfrog_steps(b, 20, 0.01, direct_accelerations)
    np.testing.assert_allclose(
        np.asarray(out_s.pos), np.asarray(out_r.pos), rtol=1e-10, atol=1e-12
    )


def test_shard_bodies_pads_inert(mesh):
    arr = random_cloud(100, seed=3)  # 100 % 8 != 0 -> pads to 104
    b = shard_bodies(Bodies.from_numpy(arr, dtype=jnp.float64), mesh=mesh)
    assert b.n == 104
    force = shard_force_fn(rect_accelerations, mesh=mesh)
    got = np.asarray(force(b.pos, b.mass))[:100]
    want = np.asarray(
        direct_accelerations(
            jnp.asarray(arr[:, :3], jnp.float64), jnp.asarray(arr[:, 6], jnp.float64)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_ring_force_matches_single_device(mesh):
    """jstream="ring" (per-chip O(N/P) memory) computes the same forces."""
    arr = random_cloud(256, seed=1)
    pos = jnp.asarray(arr[:, :3], jnp.float64)
    mass = jnp.asarray(arr[:, 6], jnp.float64)
    want = np.asarray(direct_accelerations(pos, mass))
    force = shard_force_fn(rect_accelerations, mesh=mesh, jstream="ring")
    got = np.asarray(force(pos, mass))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_ring_simulation_parity_vs_gather(mesh):
    """20 KDK steps through the ring and gather j-streams agree (fp64:
    the only difference is the block summation order)."""
    arr = random_cloud(128, seed=5)
    b = shard_bodies(Bodies.from_numpy(arr, dtype=jnp.float64), mesh=mesh)
    f_ring = shard_force_fn(rect_accelerations, mesh=mesh, jstream="ring")
    f_gath = shard_force_fn(rect_accelerations, mesh=mesh, jstream="gather")
    out_r, _ = leapfrog_steps(b, 20, 0.01, f_ring)
    out_g, _ = leapfrog_steps(b, 20, 0.01, f_gath)
    np.testing.assert_allclose(
        np.asarray(out_r.pos), np.asarray(out_g.pos), rtol=1e-9, atol=1e-11
    )


def test_sharded_energy_matches_oracle(mesh):
    arr = random_cloud(128, seed=4)
    ke_o, pe_o = oracle.energy(arr[:, :3], arr[:, 3:6], arr[:, 6])
    efn = sharded_energy(mesh=mesh)
    ke, pe = efn(
        jnp.asarray(arr[:, :3], jnp.float64),
        jnp.asarray(arr[:, 3:6], jnp.float64),
        jnp.asarray(arr[:, 6], jnp.float64),
    )
    assert float(ke) == pytest.approx(ke_o, rel=1e-12)
    assert float(pe) == pytest.approx(pe_o, rel=1e-10)
