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


def test_checkpoint_roundtrip_native(tmp_path):
    """The native fastcsv_write7 path must round-trip bit-for-bit (it is
    the production writer; the pure-Python repr() path is the fallback)."""
    from nbody_tpu.native.loader import get as native_get

    lib = native_get()
    assert lib is not None, "native fastcsv unavailable (g++ missing?)"
    arr = random_cloud(64, seed=52)
    # adversarial values for shortest-round-trip formatting
    arr[0, 0] = 0.1 + 0.2
    arr[1, 1] = 1e-300
    arr[2, 2] = -1.7976931348623157e308
    arr[3, 3] = 5e-324  # min subnormal
    arr[4, 4] = 0.0
    arr[5, 5] = -0.0
    p = str(tmp_path / "native.ckpt.csv")
    assert lib.write7(p, arr)
    arr2, _ = load_checkpoint(p)
    assert (arr2 == arr).all() or np.array_equal(arr2, arr)


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


def test_cli_resume_matches_uninterrupted(tmp_path):
    """An interrupted-then-`--resume`d run must byte-match the
    uninterrupted one: same frame count, same trajectory, no hand-computed
    time arithmetic (the .meta.json time origin is consumed)."""
    src = os.path.join(DATA_DIR, "10_bodies.csv")
    out_full = tmp_path / "full.csv"
    main([src, "0", "10", "0.1", str(out_full), "--dtype", "f64"])

    # "Interrupted" run: stops at t=5 with a checkpoint at its last step.
    out = tmp_path / "run.csv"
    ck = tmp_path / "ck.csv"
    main(
        [
            src, "0", "5", "0.1", str(out), "--dtype", "f64",
            "--checkpoint-every", "25", "--checkpoint", str(ck),
        ]
    )
    # Resume: positional start_time is a dummy; meta.json supplies t=5.
    rc = main([str(ck), "0", "10", "0.1", str(out), "--resume", "--dtype", "f64"])
    assert rc == 0

    full = open(out_full).read()
    resumed = open(out).read()
    assert resumed == full  # byte-identical trajectory


def test_cli_resume_write_every_stride(tmp_path):
    """--resume keeps the GLOBAL frame numbering so --write-every strides
    line up across the interruption."""
    src = os.path.join(DATA_DIR, "10_bodies.csv")
    out_full = tmp_path / "full.csv"
    main([src, "0", "10", "0.1", str(out_full), "--write-every", "4",
          "--dtype", "f64"])

    out = tmp_path / "run.csv"
    ck = tmp_path / "ck.csv"
    main([src, "0", "5", "0.1", str(out), "--write-every", "4",
          "--dtype", "f64", "--checkpoint-every", "50", "--checkpoint", str(ck)])
    main([str(ck), "0", "10", "0.1", str(out), "--resume",
          "--write-every", "4", "--dtype", "f64"])
    assert open(out).read() == open(out_full).read()


def test_checkpoint_rotation(tmp_path):
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.io.checkpoint import CheckpointManager, load_checkpoint

    arr = random_cloud(20, seed=7)
    b = Bodies.from_numpy(arr, dtype=jnp.float64)
    p = tmp_path / "ck.csv"
    with CheckpointManager(p, keep=3) as mgr:
        for step in (10, 20, 30, 40):
            mgr.save(b, step=step, time=step * 0.1)
    _, meta = load_checkpoint(p)
    assert meta["step"] == 40
    _, meta1 = load_checkpoint(f"{p}.1")
    assert meta1["step"] == 30
    _, meta2 = load_checkpoint(f"{p}.2")
    assert meta2["step"] == 20
    assert not os.path.exists(f"{p}.3")  # keep=3: oldest dropped


def test_persistent_checkpoint_roundtrip(tmp_path):
    """--resort-every combined with --checkpoint-every: the checkpoint is
    emitted from the group-layout state through the stored permutation
    and must be a loadable, resumable (pos, vel, mass) snapshot."""
    import os

    import numpy as np

    from conftest import DATA_DIR
    from nbody_tpu.cli.main import main
    from nbody_tpu.io.checkpoint import load_checkpoint

    out = tmp_path / "o.csv"
    ck = tmp_path / "c.csv"
    rc = main(
        [
            os.path.join(DATA_DIR, "100_bodies_g1.csv"),
            "0", "0.4", "0.1",
            str(out),
            "--algo", "barnes-hut",
            "--bh-traversal", "fused",
            "--bh-group-size", "64",
            "--resort-every", "2",
            "--checkpoint-every", "2",
            "--checkpoint", str(ck),
        ]
    )
    assert rc == 0
    arr, meta = load_checkpoint(str(ck))
    assert arr.shape == (100, 7)
    assert int(meta["step"]) == 4
    assert np.isfinite(arr).all()
