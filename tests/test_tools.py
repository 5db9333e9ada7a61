"""Auxiliary subsystems: comparator tool, viewer loader, fixtures,
device report, timing (SURVEY.md §5)."""

import os
import subprocess
import sys

import numpy as np

from conftest import DATA_DIR
from nbody_tpu.diag.compare import compare_trajectory_files
from nbody_tpu.diag.timing import Stopwatch, pairs_per_sec
from nbody_tpu.parallel.mesh import device_report
from nbody_tpu.utils.fixtures import random_cloud, write_fixture
from nbody_tpu.utils.viz import load_frames

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_EXH = os.path.join(DATA_DIR, "golden_exh_10bodies_0_10_0.1.csv")
GOLDEN_BH = os.path.join(DATA_DIR, "golden_bh_10bodies_0_10_0.1.csv")


def test_compare_trajectories_exh_vs_bh():
    # Exhaustive vs Barnes-Hut golden runs of the same system: small,
    # linearly-growing divergence (theta approximation).
    m, b = compare_trajectory_files(GOLDEN_EXH, GOLDEN_BH)
    assert 0 <= m < 1e-2


def test_check_error_script():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_error.py"),
         GOLDEN_EXH, GOLDEN_BH],
        capture_output=True,
        text=True,
        timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr
    assert "error growth fit" in out.stdout


def test_gen_fixtures_script(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_fixtures.py"),
         str(tmp_path), "1000"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    from nbody_tpu.io.csv import read_bodies

    arr = read_bodies(tmp_path / "1000_bodies.csv")
    assert arr.shape == (1000, 7)
    assert np.all(np.abs(arr[:, :3]) <= 2.0)
    assert np.all((arr[:, 6] >= 0.04) & (arr[:, 6] <= 1.0))


def test_fixture_roundtrip(tmp_path):
    arr = random_cloud(64, seed=9)
    p = tmp_path / "f.csv"
    write_fixture(p, arr)
    from nbody_tpu.io.csv import read_bodies

    np.testing.assert_array_equal(read_bodies(p), arr)  # repr round-trips


def test_viz_load_frames():
    frames, mass = load_frames(GOLDEN_EXH)
    assert frames.shape == (101, 10, 3)
    assert mass.shape == (10,)
    assert np.allclose(mass, 0.2)


def test_device_report():
    rep = device_report()
    assert "devices: 8" in rep
    assert "cpu" in rep.lower()


def test_stopwatch_and_meter():
    sw = Stopwatch()
    with sw.phase("work"):
        sum(range(1000))
    assert "work" in sw.report()
    assert pairs_per_sec(100, 9, 2.0) == 100 * 100 * 10 / 2.0


def test_viz_export_video(tmp_path):
    import pytest

    cv2 = pytest.importorskip("cv2")
    from nbody_tpu.utils.viz import export_video

    out = tmp_path / "t.avi"
    export_video(GOLDEN_EXH, str(out), stride=20)
    assert out.exists() and out.stat().st_size > 5000
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6  # 101 frames / 20
    cap.release()


def test_plummer_cloud_properties():
    from nbody_tpu.utils.fixtures import plummer_cloud

    arr = plummer_cloud(20_000, seed=5)
    assert arr.shape == (20_000, 7)
    r = np.linalg.norm(arr[:, :3], axis=1)
    # half-mass radius of a Plummer sphere is ~1.305 scale radii
    assert 1.0 < np.median(r) < 1.7
    # centrally concentrated: far more bodies inside a than outside 5a
    assert (r < 1.0).sum() > 5 * (r > 5.0).sum()
    # bound: specific KE < |specific PE| in aggregate (virial-ish)
    ke = 0.5 * (arr[:, 6] * (arr[:, 3:6] ** 2).sum(1)).sum()
    assert 0.0 < ke < 0.5  # PE_total = -3*pi/32 ~ -0.295 for M=a=G=1


def test_bh_on_plummer_cluster():
    """Strongly clustered input through the default BH path: forces must
    stay sane or overflow must be reported (never silent garbage)."""
    import jax.numpy as jnp

    from nbody_tpu.ops.barneshut import barneshut_accelerations
    from nbody_tpu.utils.fixtures import plummer_cloud

    arr = plummer_cloud(8_000, seed=9)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    acc, stats = barneshut_accelerations(pos, mass, return_stats=True)
    if stats.overflowed() or int(stats.traverse.terminal_com_bodies) > 0:
        # Plummer tails put outliers at r ~ 100+ scale radii; the Morton
        # domain then exceeds the depth-10 resolution over the core and
        # the traversal REPORTS the terminal-COM residual (this is the
        # detection path under test — silent garbage would be a failure).
        assert int(stats.traverse.terminal_com_bodies) > 0
        return
    idx = np.random.default_rng(0).integers(0, 8000, 300)
    d = arr[None, :, :3] - arr[idx][:, None, :3]
    r2 = (d * d).sum(-1) + 0.01
    w = arr[None, :, 6] * r2**-1.5
    want = np.einsum("ij,ijk->ik", w, d)
    got = np.asarray(acc)[idx]
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.02


def test_player_headless():
    """2-D player smoke test under the SDL dummy driver (the analog of the
    reference's utils/pygame-show.py viewer) — plays 5 frames and exits."""
    import pytest

    pytest.importorskip("pygame")
    from nbody_tpu.utils.player import play, prepare

    frames, _ = load_frames(GOLDEN_EXH)
    sx, sy, bz = prepare(frames, 512, 384)
    assert sx.shape == frames.shape[:2] and bz.min() >= 0 and bz.max() <= 255
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    shown = play(GOLDEN_EXH, frames=5, fps=1000)
    assert shown == 5


def test_make_plots(tmp_path):
    """Figure generator renders every docs/ figure from the gated bench
    records (the analog of the reference's img/*.png speedup plots,
    reference README.md:80-99)."""
    import importlib

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        make_plots = importlib.import_module("make_plots")
    finally:
        sys.path.pop(0)
    make_plots.main(["--outdir", str(tmp_path)])
    for name in ("steptime_vs_n.png", "speedup_vs_n.png",
                 "drift_curve.png", "mem_scaling.png"):
        p = tmp_path / name
        assert p.exists() and p.stat().st_size > 10_000, name
