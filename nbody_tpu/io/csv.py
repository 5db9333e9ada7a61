"""Body CSV I/O, byte-compatible with the reference formats.

Input format (reference reader serial/exhaustive.c:110-146): seven
comma-separated floats per line, no header —
``x, y, z, vx, vy, vz, mass``.  The reference parses with
``fscanf("%lf, %lf, ...")`` (serial/exhaustive.c:130), which tolerates both
``a,b`` and ``a, b`` spacing; a line that does not yield exactly 7 floats
makes it abort with "file is not well formed" (serial/exhaustive.c:136-142).
We mirror both behaviours.

Output format (reference writer serial/exhaustive.c:208-216, 233-238 and
cuda/barnes-hut.cu:785-803): one row per body per frame,
``id,x,y,z,mass`` printed with ``%lf`` (i.e. fixed 6 decimal places), the
initial state first and then one frame per step.  Velocities are never
written (there is no restart path in the reference — our checkpoint module
adds one as a strict superset).

A native C++ fast path (nbody_tpu/native/fastcsv.cpp) is used for large
files when available; the NumPy path is the always-available fallback.
"""

from __future__ import annotations

import io as _io
import os
from typing import Iterable

import numpy as np

from nbody_tpu.native import loader as _native


def read_bodies(path: str | os.PathLike) -> np.ndarray:
    """Read a 7-column body CSV into a float64 (N, 7) array.

    Raises ValueError for malformed files, matching the reference's
    fail-fast check (serial/exhaustive.c:136-142).
    """
    path = os.fspath(path)
    lib = _native.get()
    if lib is not None:
        arr = lib.read_csv7(path)
        if arr is not None:
            return arr
    return _read_bodies_numpy(path)


def _read_bodies_numpy(path: str) -> np.ndarray:
    try:
        arr = np.loadtxt(path, delimiter=",", dtype=np.float64, ndmin=2)
    except ValueError as e:
        raise ValueError(
            f"Error while reading file '{path}': file is not well formed"
        ) from e
    if arr.size == 0:
        raise ValueError(f"No bodies found into file '{path}'")
    if arr.shape[1] != 7:
        raise ValueError(
            f"Error while reading file '{path}': file is not well formed "
            f"(expected 7 columns, got {arr.shape[1]})"
        )
    return arr


def format_frame(pos: np.ndarray, mass: np.ndarray, out: _io.TextIOBase) -> None:
    """Append one frame (`id,x,y,z,mass`, %lf formatting) to a text stream."""
    pos = np.asarray(pos, dtype=np.float64)
    mass = np.asarray(mass, dtype=np.float64)
    n = pos.shape[0]
    for i in range(n):
        out.write(
            f"{i},{pos[i, 0]:.6f},{pos[i, 1]:.6f},{pos[i, 2]:.6f},{mass[i]:.6f}\n"
        )


def write_frames(
    path: str | os.PathLike,
    frames: Iterable[np.ndarray],
    mass: np.ndarray,
    append: bool = False,
) -> None:
    """Write trajectory frames to `path`.

    `frames` yields (N, 3) position arrays; `mass` is the constant (N,)
    mass vector repeated on every row exactly as the reference does
    (serial/exhaustive.c:211-215 writes mass with every position row).
    """
    path = os.fspath(path)
    mass64 = np.ascontiguousarray(mass, dtype=np.float64)
    lib = _native.get()

    if not append:
        # Truncate like fopen(path, "w") even if `frames` turns out empty.
        open(path, "w").close()

    for f in frames:
        f64 = np.ascontiguousarray(f, dtype=np.float64)
        if f64.ndim == 2:
            f64 = f64[None]  # (N, 3) -> (1, N, 3)
        if lib is not None and lib.write_frames(path, f64, mass64):
            continue
        with open(path, "a") as out:
            for t in range(f64.shape[0]):
                format_frame(f64[t], mass64, out)


def read_trajectory(path: str | os.PathLike) -> tuple[np.ndarray, int]:
    """Read an output trajectory CSV (`id,x,y,z,mass` rows).

    Returns (rows, n_bodies) where rows is (T*N, 5) float64 and n_bodies
    is inferred as max(id)+1, exactly like utils/check_error.py:7-16.
    """
    rows = np.loadtxt(os.fspath(path), delimiter=",", dtype=np.float64, ndmin=2)
    n_bodies = int(rows[:, 0].max()) + 1
    return rows, n_bodies
