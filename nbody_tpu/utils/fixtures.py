"""Input fixture generation.

The reference ships random-cloud fixtures at 10..10k bodies
(tests/*.csv; SURVEY.md §2.4: coords ~ +-2, masses 0.04-1.0) and names
50k/100k/1M fixtures in its benchmark log that were stripped from the repo
(.MISSING_LARGE_BLOBS).  This module regenerates fixtures with the same
distribution so every benchmark configuration in BASELINE.md can be run.
"""

from __future__ import annotations

import numpy as np


def random_cloud(
    n: int,
    seed: int = 0,
    pos_range: float = 2.0,
    vel_range: float = 1.0,
    mass_range: tuple[float, float] = (0.04, 1.0),
) -> np.ndarray:
    """(N, 7) body array in the reference CSV column order."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-pos_range, pos_range, size=(n, 3))
    vel = rng.uniform(-vel_range, vel_range, size=(n, 3))
    mass = rng.uniform(*mass_range, size=(n,))
    return np.concatenate([pos, vel, mass[:, None]], axis=1)


def write_fixture(path: str, arr: np.ndarray) -> None:
    """Write bodies in the reference input format: 7 comma-separated floats
    per line, no header (serial/exhaustive.c:130-132)."""
    with open(path, "w") as f:
        for row in arr:
            f.write(",".join(repr(float(v)) for v in row) + "\n")
