#!/usr/bin/env python
"""Cross-implementation trajectory error checker.

CLI parity with the reference's utils/check_error.py:19-55: load two
trajectory CSVs (`id,x,y,z,mass` frames), diff body 0's rows, fit the
linear error-growth slope over frames 30..100, and optionally plot.

Usage: python tools/check_error.py out_a.csv out_b.csv [--body K] [--plot FILE]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nbody_tpu.diag.compare import error_growth_slope, trajectory_diff  # noqa: E402
from nbody_tpu.io.csv import read_trajectory  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("file_a")
    p.add_argument("file_b")
    p.add_argument("--body", type=int, default=0)
    p.add_argument("--plot", help="write the error plot to this file (PNG)")
    args = p.parse_args(argv)

    rows_a, n_a = read_trajectory(args.file_a)
    rows_b, n_b = read_trajectory(args.file_b)
    if n_a != n_b:
        print(f"body counts differ: {n_a} vs {n_b}", file=sys.stderr)
        return 1

    diff = trajectory_diff(rows_a, rows_b, body=args.body)
    m, b = error_growth_slope(rows_a, rows_b, body=args.body)
    print(f"bodies: {n_a}, frames: {len(diff)}")
    print(f"max |dx|: {diff[:, 1].max():.3e}  max |dpos|: {diff[:, 1:4].max():.3e}")
    print(f"x-error growth fit (frames 30..100): slope={m:.3e} intercept={b:.3e}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        y = diff[30:101] if len(diff) > 32 else diff
        x = np.arange(len(y))
        plt.plot(x, y[:, 1], "bo-", linewidth=0.5, markersize=2, label="|dx|")
        plt.plot(x, m * x + b, "r-", linewidth=1, label="linear fit")
        plt.xlabel("t")
        plt.ylabel("Diff x")
        plt.title(f"body {args.body} x-error growth")
        plt.legend()
        plt.grid(True)
        plt.savefig(args.plot, dpi=120)
        print(f"plot written to {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
