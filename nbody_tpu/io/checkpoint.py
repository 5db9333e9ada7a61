"""Checkpoint / resume.

The reference has none (SURVEY.md §5): its per-step output CSV is a full
position history but velocities are never written
(serial/exhaustive.c:233-238), so a run cannot be restarted.  Here a
checkpoint is simply the full (pos, vel, mass) state written in the
*input* CSV format (x, y, z, vx, vy, vz, mass — serial/exhaustive.c:130),
so any checkpoint is directly runnable as a new simulation input — a
strict superset of reference behaviour — plus a JSON sidecar recording the
step/time for bookkeeping.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nbody_tpu.core.types import Bodies
from nbody_tpu.io.csv import read_bodies


def save_checkpoint(
    path: str | os.PathLike,
    bodies: Bodies,
    *,
    step: int | None = None,
    time: float | None = None,
) -> None:
    path = os.fspath(path)
    arr = bodies.to_numpy()
    with open(path, "w") as f:
        for row in arr:
            f.write(",".join(repr(float(v)) for v in row) + "\n")
    meta = {"n_bodies": int(arr.shape[0])}
    if step is not None:
        meta["step"] = int(step)
    if time is not None:
        meta["time"] = float(time)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str | os.PathLike, dtype=None):
    """Returns (bodies_array (N,7) float64, meta dict)."""
    path = os.fspath(path)
    arr = read_bodies(path)
    meta = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return arr, meta
