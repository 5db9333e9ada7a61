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
    # Native writer first: at 10M bodies the Python fallback is ~70M
    # per-float repr() calls (minutes); fastcsv_write7 streams the same
    # exact-round-trip rows in seconds.
    from nbody_tpu.native.loader import get as _native

    lib = _native()
    if lib is None or not lib.write7(path, arr):
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


class CheckpointManager:
    """Rotating, optionally asynchronous checkpoint writer.

    Keeps the latest checkpoint at `path` and up to `keep - 1` older ones at
    `path.1`, `path.2`, ... (newest-first), each with its `.meta.json`
    sidecar.  Writes go through a single background thread so a long run
    never stalls on host I/O (device state is first pulled to host numpy,
    which is the only synchronous part).  Call close() (or use as a context
    manager) to flush pending writes.
    """

    def __init__(self, path: str | os.PathLike, *, keep: int = 1, async_io: bool = True):
        from concurrent.futures import ThreadPoolExecutor

        self.path = os.fspath(path)
        self.keep = max(1, int(keep))
        self._pool = ThreadPoolExecutor(max_workers=1) if async_io else None
        self._pending = None

    def _rotate_and_write(self, host_bodies: Bodies, step: int, time: float) -> None:
        if self.keep > 1 and os.path.exists(self.path):
            for i in range(self.keep - 1, 0, -1):
                src = self.path if i == 1 else f"{self.path}.{i - 1}"
                if os.path.exists(src):
                    os.replace(src, f"{self.path}.{i}")
                    if os.path.exists(src + ".meta.json"):
                        os.replace(src + ".meta.json", f"{self.path}.{i}.meta.json")
        save_checkpoint(self.path, host_bodies, step=step, time=time)

    def save(self, bodies: Bodies, *, step: int, time: float) -> None:
        # Device -> host synchronously (cheap D2H), file I/O in background.
        host = Bodies(
            np.asarray(bodies.pos), np.asarray(bodies.vel), np.asarray(bodies.mass)
        )
        if self._pool is None:
            self._rotate_and_write(host, step, time)
            return
        if self._pending is not None:
            self._pending.result()  # keep at most one write in flight
        self._pending = self._pool.submit(self._rotate_and_write, host, step, time)

    def close(self) -> None:
        if self._pending is not None:
            self._pending.result()
            self._pending = None
        if self._pool is not None:
            self._pool.shutdown(wait=True)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
