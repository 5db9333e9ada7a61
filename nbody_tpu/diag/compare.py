"""Cross-implementation trajectory comparison.

Library version of utils/check_error.py:19-55: given two trajectory CSVs
(or row arrays) in the `id,x,y,z,mass` frame format, compute the absolute
per-row difference, select one body's rows, and fit the linear growth rate
of the error over a frame window.  The reference used this interactively
(plot + printed fit) as its de-facto integration test; here it is a pure
function so the test suite can assert on the slope.
"""

from __future__ import annotations

import numpy as np

from nbody_tpu.io.csv import read_trajectory


def trajectory_diff(
    rows_a: np.ndarray, rows_b: np.ndarray, body: int = 0, n_bodies: int | None = None
) -> np.ndarray:
    """Per-frame |a - b| rows for one body.

    Mirrors check_error.py:26-31: absolute elementwise difference, then the
    rows where `row_index % n_bodies == body` (the reference hard-codes
    body 0).  Returns (T, 5) diffs over columns id,x,y,z,mass.
    """
    if rows_a.shape != rows_b.shape:
        raise ValueError(
            f"trajectories differ in shape: {rows_a.shape} vs {rows_b.shape}"
        )
    if n_bodies is None:
        n_bodies = int(max(rows_a[:, 0].max(), rows_b[:, 0].max())) + 1
    diff = np.abs(rows_a - rows_b)
    sel = np.arange(len(diff)) % n_bodies == body
    return diff[sel]


def error_growth_slope(
    rows_a: np.ndarray,
    rows_b: np.ndarray,
    body: int = 0,
    window: tuple[int, int] = (30, 101),
    column: int = 1,
) -> tuple[float, float]:
    """Linear fit (slope, intercept) of the error in `column` (1 = x) over
    the frame window — check_error.py:33-41 uses frames 30..100 of body 0's
    x error.  Falls back to all frames when the trajectory is shorter."""
    y = trajectory_diff(rows_a, rows_b, body=body)
    lo, hi = window
    if len(y) > lo + 2:
        y = y[lo:hi]
    x = np.arange(len(y))
    m, b = np.polyfit(x, y[:, column], 1)
    return float(m), float(b)


def compare_trajectory_files(
    path_a: str, path_b: str, body: int = 0
) -> tuple[float, float]:
    """File-level entry point matching `python utils/check_error.py a b`."""
    rows_a, n_a = read_trajectory(path_a)
    rows_b, n_b = read_trajectory(path_b)
    if n_a != n_b:
        raise ValueError(f"body counts differ: {n_a} vs {n_b}")
    return error_growth_slope(rows_a, rows_b, body=body)
