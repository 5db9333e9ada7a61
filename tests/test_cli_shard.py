"""CLI --shard end-to-end on the virtual 8-device CPU mesh."""

import os

import numpy as np

from conftest import DATA_DIR
from nbody_tpu.cli.main import main
from nbody_tpu.io.csv import read_trajectory


def test_cli_shard_matches_unsharded(tmp_path):
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    args = [
        os.path.join(DATA_DIR, "100_bodies_g1.csv"),
        "0", "1", "0.05",
        "--dtype", "f64",
    ]
    assert main(args[:4] + [str(a)] + args[4:]) == 0
    assert main(args[:4] + [str(b)] + args[4:] + ["--shard"]) == 0
    rows_a, n_a = read_trajectory(a)
    rows_b, n_b = read_trajectory(b)
    assert n_a == n_b == 100
    assert rows_a.shape == rows_b.shape  # padding dropped from output
    np.testing.assert_allclose(rows_b, rows_a, atol=2e-6, rtol=0)


def test_cli_shard_fused_traversal(tmp_path):
    """--shard with the Morton-range-sharded fused pipeline
    (parallel/bh_shard.py) through the CLI, vs the unsharded fused run."""
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    args = [
        os.path.join(DATA_DIR, "100_bodies_g1.csv"),
        "0", "0.3", "0.1",
        "--algo", "barnes-hut",
        "--bh-traversal", "fused",
        "--bh-group-size", "64",
    ]
    assert main(args[:4] + [str(a)] + args[4:]) == 0
    assert main(args[:4] + [str(b)] + args[4:] + ["--shard"]) == 0
    rows_a, n_a = read_trajectory(a)
    rows_b, n_b = read_trajectory(b)
    assert n_a == n_b == 100
    assert rows_a.shape == rows_b.shape
    # same theta approximation, different partitioning: group AABBs gate
    # the MAC differently, so trajectories agree to MAC-level tolerance
    np.testing.assert_allclose(rows_b, rows_a, atol=5e-4, rtol=0)


def test_cli_shard_persistent(tmp_path, capsys):
    """--shard --resort-every K end-to-end: the sharded persistent
    Morton-order path (parallel/bh_shard.simulate_persistent_sharded)
    with frames, checkpoints and progress, trajectory-parity vs the
    unsharded persistent run (VERDICT round-2 item 3)."""
    a = tmp_path / "a.csv"
    b = tmp_path / "b.csv"
    ck = tmp_path / "ck.csv"
    args = [
        os.path.join(DATA_DIR, "100_bodies_g1.csv"),
        "0", "0.4", "0.1",
        "--algo", "barnes-hut",
        "--bh-traversal", "fused",
        "--bh-group-size", "64",
        "--resort-every", "2",
    ]
    assert main(args[:4] + [str(a)] + args[4:]) == 0
    assert (
        main(
            args[:4] + [str(b)] + args[4:]
            + ["--shard", "--checkpoint-every", "2",
               "--checkpoint", str(ck), "--progress", "2", "--energy"]
        )
        == 0
    )
    rows_a, n_a = read_trajectory(a)
    rows_b, n_b = read_trajectory(b)
    assert n_a == n_b == 100
    assert rows_a.shape == rows_b.shape  # same frame count, padding dropped
    np.testing.assert_allclose(rows_b, rows_a, atol=5e-4, rtol=0)
    # checkpoint exists and is a runnable input for the padded-off n
    assert ck.exists()
    from nbody_tpu.io.csv import read_bodies

    assert read_bodies(str(ck)).shape == (100, 7)
    err = capsys.readouterr().err
    assert "progress: step" in err


def test_cli_shard_auto_routes_fused(tmp_path, capsys):
    """--shard + barnes-hut WITHOUT --bh-traversal must route through the
    Morton-range-sharded fused pipeline (VERDICT round-2 item 10: the
    replicated-build fallback is explicit-opt-in only), and the explicit
    flat fallback must announce itself."""
    a = tmp_path / "a.csv"
    args = [
        os.path.join(DATA_DIR, "100_bodies_g1.csv"),
        "0", "0.2", "0.1", str(a),
        "--algo", "barnes-hut",
        "--bh-group-size", "64",
        "--shard",
    ]
    assert main(args) == 0
    out = capsys.readouterr()
    assert "/fused" in out.out  # banner names the fused backend
    assert "replicated-build" not in out.err

    b = tmp_path / "b.csv"
    assert main(
        [a if x == str(a) else x for x in args][:4] + [str(b)]
        + args[5:] + ["--bh-traversal", "flat"]
    ) == 0
    out = capsys.readouterr()
    assert "replicated-build" in out.err
