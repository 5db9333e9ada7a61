#!/usr/bin/env python
"""Regenerate the benchmark fixtures named in BASELINE.md.

Usage: python tools/gen_fixtures.py [outdir] [sizes...]
Defaults: outdir=tests/data, sizes = 50k 100k 1M (the fixtures stripped
from the reference repo, .MISSING_LARGE_BLOBS) — distribution matches the
committed 10k fixture (coords +-2, masses 0.04-1.0).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nbody_tpu.utils.fixtures import random_cloud, write_fixture  # noqa: E402

NAMES = {50_000: "50k_bodies.csv", 100_000: "100k_bodies.csv",
         1_000_000: "1M_bodies.csv"}


def main(argv):
    outdir = argv[1] if len(argv) > 1 else "tests/data"
    sizes = [int(s) for s in argv[2:]] or list(NAMES)
    os.makedirs(outdir, exist_ok=True)
    for n in sizes:
        name = NAMES.get(n, f"{n}_bodies.csv")
        path = os.path.join(outdir, name)
        write_fixture(path, random_cloud(n, seed=n))
        print(f"wrote {path} ({n} bodies)")


if __name__ == "__main__":
    main(sys.argv)
