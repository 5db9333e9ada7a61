"""Barnes-Hut on non-uniform (clustered) distributions.

The benchmark fixtures are uniform clouds; real N-body inputs cluster
(the solar-system fixture, or collapsing cores).  These tests pin down
that the flat traversal either produces bounded-error forces or reports
capacity overflow via stats — never silently-wrong results without a
raised flag.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops.barneshut import barneshut_accelerations

pytestmark = pytest.mark.heavy  # interpret-mode kernels: quick tier skips


def two_cluster_cloud(n, seed=0, sep=3.0, width=0.05):
    rng = np.random.default_rng(seed)
    half = n // 2
    a = rng.normal([-sep / 2, 0, 0], width, size=(half, 3))
    b = rng.normal([sep / 2, 0, 0], width, size=(n - half, 3))
    pos = np.concatenate([a, b])
    vel = rng.uniform(-0.1, 0.1, size=(n, 3))
    mass = rng.uniform(0.04, 1.0, size=(n,))
    return pos, vel, mass


def _exact(pos, mass, idx):
    d = pos[None, :, :] - pos[idx][:, None, :]
    r2 = (d * d).sum(-1) + 0.01
    w = mass[None, :] * r2 ** -1.5
    return np.einsum("ij,ijk->ik", w, d)


@pytest.mark.parametrize("n", [2000, 20000])
def test_clustered_forces_or_overflow(n):
    pos_np, _, mass_np = two_cluster_cloud(n, seed=n)
    pos = jnp.asarray(pos_np, jnp.float32)
    mass = jnp.asarray(mass_np, jnp.float32)
    acc, stats = barneshut_accelerations(pos, mass, return_stats=True)
    if stats.overflowed():
        # acceptable outcome: the fail-fast channel fired; a caller would
        # retry with larger capacities (check_capacities raises)
        return
    idx = np.random.default_rng(1).integers(0, n, 200)
    want = _exact(pos_np, mass_np, idx)
    got = np.asarray(acc)[idx]
    scale = np.abs(want).max()
    # Clusters are tiny vs the softening length (width 0.05 vs eps=0.1),
    # so intra-cluster forces are softening-dominated and the theta
    # approximation must stay well-behaved.
    assert np.abs(got - want).max() / scale < 0.02


def test_coincident_bodies_do_not_nan():
    # All bodies at one point: forces must be exactly zero (softened
    # self-terms), never NaN — the degenerate tree (one deep chain) and
    # zero-size group boxes must both be handled.
    n = 512
    pos = jnp.zeros((n, 3), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)
    acc = np.asarray(barneshut_accelerations(pos, mass, backend="jnp"))
    assert np.isfinite(acc).all()
    np.testing.assert_allclose(acc, 0.0, atol=1e-5)


def test_single_body():
    acc = np.asarray(
        barneshut_accelerations(
            jnp.asarray([[1.0, 2.0, 3.0]], jnp.float32),
            jnp.asarray([5.0], jnp.float32),
            backend="jnp",
        )
    )
    np.testing.assert_allclose(acc, 0.0, atol=1e-6)
