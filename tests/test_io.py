import io
import os

import numpy as np
import pytest

from nbody_tpu.io.csv import (
    format_frame,
    read_bodies,
    read_trajectory,
    write_frames,
)
from nbody_tpu.native import loader


def test_read_fixture(bodies10):
    assert bodies10.shape == (10, 7)
    # first row of tests/data/10_bodies.csv
    assert bodies10[0, 0] == pytest.approx(0.27626589002131874, rel=0, abs=0)
    assert bodies10[0, 6] == 0.2


def test_read_space_tolerant(tmp_path):
    # fscanf("%lf, %lf, ...") accepts both "a,b" and "a, b"
    # (serial/exhaustive.c:130).
    p = tmp_path / "b.csv"
    p.write_text("1.0, 2.0,3.0, 0.1,0.2, 0.3, 5.0\n-1,-2,-3,0,0,0,1\n")
    arr = read_bodies(p)
    assert arr.shape == (2, 7)
    np.testing.assert_allclose(arr[0], [1, 2, 3, 0.1, 0.2, 0.3, 5.0])


def test_read_malformed(tmp_path):
    # Reference aborts with "file is not well formed"
    # (serial/exhaustive.c:136-142).
    p = tmp_path / "bad.csv"
    p.write_text("1.0,2.0,3.0\n")
    with pytest.raises(ValueError):
        read_bodies(p)


def test_read_no_trailing_newline(tmp_path):
    # count_entities_file handles files without a final newline
    # (serial/exhaustive.c:98-100).
    p = tmp_path / "b.csv"
    p.write_text("1,2,3,4,5,6,7\n8,9,10,11,12,13,14")
    assert read_bodies(p).shape == (2, 7)


def test_frame_format_matches_reference():
    # Reference rows: fprintf("%lu,%lf,%lf,%lf,%lf\n", ...) — fixed
    # 6-decimal formatting (serial/exhaustive.c:211-215).
    out = io.StringIO()
    format_frame(np.array([[1.5, -2.0, 0.123456789]]), np.array([0.2]), out)
    assert out.getvalue() == "0,1.500000,-2.000000,0.123457,0.200000\n"


def test_write_frames_roundtrip(tmp_path):
    pos = np.random.default_rng(0).normal(size=(3, 17, 3))
    mass = np.random.default_rng(1).uniform(0.1, 1.0, size=17)
    p = tmp_path / "out.csv"
    write_frames(p, [pos[0], pos[1:]], mass)
    rows, n = read_trajectory(p)
    assert n == 17
    assert rows.shape == (3 * 17, 5)
    np.testing.assert_allclose(
        rows[:, 1:4].reshape(3, 17, 3), np.round(pos, 6), atol=1.1e-6, rtol=0
    )
    np.testing.assert_allclose(
        rows[:, 4].reshape(3, 17),
        np.tile(np.round(mass, 6), (3, 1)),
        atol=1.1e-6,
        rtol=0,
    )


def test_native_and_python_writers_agree(tmp_path):
    lib = loader.get()
    if lib is None:
        pytest.skip("native fastcsv unavailable")
    pos = np.random.default_rng(2).normal(size=(2, 9, 3))
    mass = np.random.default_rng(3).uniform(0.1, 1.0, size=9)
    p_native = tmp_path / "native.csv"
    p_py = tmp_path / "py.csv"
    assert lib.write_frames(str(p_native), pos, mass)
    with open(p_py, "w") as f:
        for t in range(2):
            format_frame(pos[t], mass, f)
    assert p_native.read_text() == p_py.read_text()


def test_native_reader_agrees_with_numpy(tmp_path, bodies10):
    lib = loader.get()
    if lib is None:
        pytest.skip("native fastcsv unavailable")
    path = os.path.join(os.path.dirname(__file__), "data", "10_bodies.csv")
    native = lib.read_csv7(path)
    np.testing.assert_array_equal(native, bodies10)
