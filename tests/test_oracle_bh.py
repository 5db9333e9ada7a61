"""Pin the NumPy Barnes-Hut oracle itself against the reference binary's
golden trajectory, so everything downstream can trust it."""

import os

import numpy as np

import oracle
from conftest import DATA_DIR
from nbody_tpu.io.csv import read_trajectory


def test_bh_oracle_matches_reference_golden(bodies10):
    golden, n = read_trajectory(
        os.path.join(DATA_DIR, "golden_bh_10bodies_0_10_0.1.csv")
    )
    assert n == 10
    frames = golden[:, 1:4].reshape(-1, 10, 3)

    _, _, hist = oracle.propagate(
        bodies10[:, :3],
        bodies10[:, 3:6],
        bodies10[:, 6],
        100,
        float(np.float32(0.1)),
        accel_fn=oracle.accel_bh,
    )
    np.testing.assert_allclose(hist, frames, atol=1.1e-5, rtol=0)


def test_bh_oracle_close_to_exhaustive():
    from conftest import random_cloud

    arr = random_cloud(200, seed=11)
    a_bh = oracle.accel_bh(arr[:, :3], arr[:, 6])
    a_ex = oracle.accel_exhaustive(arr[:, :3], arr[:, 6])
    # theta = 0.5 approximation error: small relative to the force scale.
    scale = np.abs(a_ex).max()
    assert np.abs(a_bh - a_ex).max() / scale < 0.05
