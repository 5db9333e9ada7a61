import jax.numpy as jnp
import numpy as np
import pytest

from conftest import random_cloud
from nbody_tpu.ops.exhaustive import direct_accelerations
from nbody_tpu.ops.pallas_exhaustive import (
    pallas_accelerations,
    pallas_rect_accelerations,
)

pytestmark = pytest.mark.heavy  # interpret-mode kernels: quick tier skips


@pytest.mark.parametrize("n", [100, 1000])
def test_pallas_matches_direct(n):
    arr = random_cloud(n, seed=n)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    want = np.asarray(direct_accelerations(pos, mass))
    got = np.asarray(
        pallas_accelerations(pos, mass, block_i=128, block_j=256, interpret=True)
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-4)


def test_pallas_rect():
    arr = random_cloud(300, seed=5)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    want = np.asarray(direct_accelerations(pos, mass))[:100]
    got = np.asarray(
        pallas_rect_accelerations(
            pos[:100], pos, mass, block_i=128, block_j=256, interpret=True
        )
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-4)


def test_pallas_padding_inert():
    # Unaligned N exercises the zero-Gm padding path.
    arr = random_cloud(137, seed=9)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    want = np.asarray(direct_accelerations(pos, mass))
    got = np.asarray(
        pallas_accelerations(pos, mass, block_i=128, block_j=256, interpret=True)
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale, rtol=2e-4)
