import os

import jax.numpy as jnp
import numpy as np

from conftest import DATA_DIR, random_cloud
from nbody_tpu.cli.main import main
from nbody_tpu.core.types import Bodies
from nbody_tpu.io.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    arr = random_cloud(50, seed=51)
    b = Bodies.from_numpy(arr, dtype=jnp.float64)
    p = tmp_path / "state.ckpt.csv"
    save_checkpoint(p, b, step=42, time=4.2)
    arr2, meta = load_checkpoint(p)
    np.testing.assert_allclose(arr2, arr, rtol=0, atol=0)  # repr round-trip
    assert meta["step"] == 42 and meta["time"] == 4.2


def test_checkpoint_is_valid_input(tmp_path):
    """A checkpoint must be directly runnable as a simulation input (the
    whole point: strict superset of the reference, which cannot restart)."""
    out1 = tmp_path / "a.csv"
    ck = tmp_path / "ck.csv"
    main(
        [
            os.path.join(DATA_DIR, "10_bodies.csv"),
            "0", "5", "0.1", str(out1),
            "--dtype", "f64", "--no-output",
            "--checkpoint-every", "25", "--checkpoint", str(ck),
        ]
    )
    _, meta = load_checkpoint(ck)
    assert meta["step"] == 50  # final checkpoint at the last multiple of 25

    # Resume from the checkpoint and compare with an uninterrupted run.
    out_resumed = tmp_path / "resumed.csv"
    main([str(ck), "0", "5", "0.1", str(out_resumed), "--dtype", "f64"])
    out_full = tmp_path / "full.csv"
    main(
        [
            os.path.join(DATA_DIR, "10_bodies.csv"),
            "0", "10", "0.1", str(out_full), "--dtype", "f64",
        ]
    )
    from nbody_tpu.io.csv import read_trajectory

    rows_r, _ = read_trajectory(out_resumed)
    rows_f, _ = read_trajectory(out_full)
    # Final frame of the resumed run == final frame of the full run, up to
    # the %lf checkpoint rounding... checkpoint uses repr() so it's exact
    # up to leapfrog restart (acc recomputed identically from state).
    np.testing.assert_allclose(
        rows_r[-10:, 1:4], rows_f[-10:, 1:4], atol=2e-6, rtol=0
    )
