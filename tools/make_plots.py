"""Render the performance/accuracy figures from the per-round JSON records.

The reference publishes speedup/efficiency plots rendered from its
tests_result.txt sweeps (reference README.md:80-99, img/*.png); this is
the analog for this repo: every figure is generated from the gated
records under bench/ (never from prose), so re-running after a bench
refresh keeps docs/ in sync with what the driver measured.

Outputs (docs/img/):
  steptime_vs_n.png   s/step vs N, ours vs the reference's best backend,
                      one panel per algorithm (from bench_grid_best.json;
                      the reference series is reconstructed as
                      value * vs_baseline, i.e. exactly the numbers the
                      gate compares against).
  speedup_vs_n.png    speedup over the reference's best backend vs N.
  drift_curve.png     |dE/E0| vs step with the 1e-3 contract line
                      (from drift_series.json).
  mem_scaling.png     per-chip XLA temp bytes vs P for the sharded
                      all-pairs exchanges (from mem_scaling.json) — the
                      scaling-study analog the thread-efficiency plots
                      play in the reference.
  scaling_prediction.png
                      ICI-bandwidth-model predicted step time vs P
                      (from scaling_prediction.json: measured 1-chip
                      compute / P + HLO-counted collective bytes over
                      the v5e ICI bandwidth).

Usage: python tools/make_plots.py [--outdir docs/img]
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# Validated categorical palette (first three slots pass all-pairs CVD
# checks in light mode): blue = ours, orange = reference, aqua = extra.
C_OURS = "#2a78d6"
C_REF = "#eb6834"
C_AUX = "#1baf7a"
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e4e3df"

BENCH_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "bench")


def _read_jsonl(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def _style(ax, *, logx=False, logy=False):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.tick_params(colors=INK2, labelsize=9)
    ax.grid(True, which="major", color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)
    if logx:
        ax.set_xscale("log")
    if logy:
        ax.set_yscale("log")


def _fig(w=7.0, h=3.4, ncols=1):
    fig, axes = plt.subplots(1, ncols, figsize=(w, h), facecolor=SURFACE)
    return fig, axes


def _save(fig, outdir: str, name: str):
    path = os.path.join(outdir, name)
    fig.tight_layout()
    fig.savefig(path, dpi=150, facecolor=SURFACE)
    plt.close(fig)
    print(f"wrote {path}")


def plot_grid(outdir: str) -> None:
    rows = _read_jsonl(os.path.join(BENCH_DIR, "bench_grid_best.json"))
    algos = ["exhaustive", "barnes-hut"]
    ref_label = {"exhaustive": "reference (best GPU)", "barnes-hut": "reference (bh_cuda)"}

    fig, axes = _fig(w=8.0, ncols=2)
    for ax, algo in zip(axes, algos):
        rs = sorted((r for r in rows if r["algo"] == algo), key=lambda r: r["n"])
        ns = [r["n"] for r in rs]
        ours = [r["value"] for r in rs]
        # Reference series reconstructed from the stored speedups; a null
        # vs_baseline means the reference never completed that config.
        ref_n = [r["n"] for r in rs if r["vs_baseline"]]
        ref_v = [r["value"] * r["vs_baseline"] for r in rs if r["vs_baseline"]]
        _style(ax, logx=True, logy=True)
        ax.plot(ref_n, ref_v, "-o", color=C_REF, linewidth=2, markersize=5)
        ax.plot(ns, ours, "-o", color=C_OURS, linewidth=2, markersize=5)
        if ref_n:
            mid = len(ref_n) // 2
            ax.annotate(ref_label[algo], (ref_n[mid], ref_v[mid]),
                        textcoords="offset points", xytext=(-8, 6),
                        ha="right", fontsize=9, color=INK2)
        ax.annotate("nbody_tpu (1 chip)", (ns[-1], ours[-1]),
                    textcoords="offset points", xytext=(-10, -16),
                    ha="right", fontsize=9, color=INK2)
        ax.set_title(algo, fontsize=11, color=INK)
        ax.set_xlabel("bodies", fontsize=10, color=INK2)
    axes[0].set_ylabel("seconds / KDK step", fontsize=10, color=INK2)
    fig.suptitle("Step time vs problem size — lower is better",
                 fontsize=12, color=INK)
    _save(fig, outdir, "steptime_vs_n.png")

    fig, ax = _fig(w=6.4)
    _style(ax, logx=True, logy=True)
    for algo, color in (("exhaustive", C_OURS), ("barnes-hut", C_AUX)):
        rs = sorted((r for r in rows if r["algo"] == algo and r["vs_baseline"]),
                    key=lambda r: r["n"])
        ns = [r["n"] for r in rs]
        sp = [r["vs_baseline"] for r in rs]
        ax.plot(ns, sp, "-o", color=color, linewidth=2, markersize=5)
        ax.annotate(f"{algo}  ({sp[-1]:.0f}x at {ns[-1]:,})", (ns[-1], sp[-1]),
                    textcoords="offset points", xytext=(-4, -16),
                    ha="right", fontsize=9, color=INK2)
    ax.axhline(1.0, color=INK2, linewidth=1, linestyle="--")
    ax.annotate("parity with the reference's best backend", (0.02, 1.0),
                xycoords=("axes fraction", "data"),
                textcoords="offset points", xytext=(0, 4),
                fontsize=8, color=INK2)
    ax.set_xlabel("bodies", fontsize=10, color=INK2)
    ax.set_ylabel("speedup (x)", fontsize=10, color=INK2)
    ax.set_title("Speedup over the reference, one TPU chip vs its best backend",
                 fontsize=11, color=INK)
    _save(fig, outdir, "speedup_vs_n.png")


def plot_drift(outdir: str) -> None:
    rows = _read_jsonl(os.path.join(BENCH_DIR, "drift_series.json"))
    header, series = rows[0], rows[1:]
    steps = [r["step"] for r in series]
    drift = [max(abs(r["drift"]), 1e-12) for r in series]

    fig, ax = _fig(w=6.4)
    _style(ax, logy=True)
    ax.plot(steps, drift, "-o", color=C_OURS, linewidth=2, markersize=4)
    ax.axhline(1e-3, color=C_REF, linewidth=1.5, linestyle="--")
    ax.annotate("1e-3 contract (BASELINE.md)", (0.98, 1e-3),
                xycoords=("axes fraction", "data"),
                textcoords="offset points", xytext=(0, 5),
                ha="right", fontsize=9, color=INK2)
    ax.set_ylim(top=5e-3)
    cfg = header["config"]
    ax.set_xlabel("step", fontsize=10, color=INK2)
    ax.set_ylabel("|dE / E0|", fontsize=10, color=INK2)
    ax.set_title(
        f"Energy drift — {cfg['n']:,} bodies, {cfg['steps']} steps, "
        f"{cfg['algo']} (theta={cfg['theta']}), dt={cfg['dt']}",
        fontsize=11, color=INK,
    )
    _save(fig, outdir, "drift_curve.png")


def plot_mem(outdir: str) -> None:
    rows = _read_jsonl(os.path.join(BENCH_DIR, "mem_scaling.json"))
    exh = [r for r in rows if r["path"].startswith("exhaustive/")]
    by_path: dict[str, list[dict]] = {}
    for r in exh:
        by_path.setdefault(r["path"].split("/", 1)[1], []).append(r)

    fig, ax = _fig(w=6.4)
    _style(ax, logy=True)
    series = [("gather", C_REF, "gather  (O(N) per chip)"),
              ("ring", C_OURS, "ring  (O(N/P) per chip)")]
    for key, color, label in series:
        rs = sorted(by_path.get(key, []), key=lambda r: r["p"])
        if not rs:
            continue
        ps = [r["p"] for r in rs]
        mb = [r["temp_bytes"] / 1e6 for r in rs]
        ax.plot(ps, mb, "-o", color=color, linewidth=2, markersize=5)
        mid = len(ps) // 2
        ax.annotate(label, (ps[mid], mb[mid]), textcoords="offset points",
                    xytext=(0, 8), ha="center", fontsize=9, color=INK2)
    # 2-D torus points at P=8 ride as markers on the same axes.
    for key, marker in (("torus2x4", "s"), ("torus8x1", "D")):
        rs = by_path.get(key, [])
        for r in rs:
            ax.plot([r["p"]], [r["temp_bytes"] / 1e6], marker, color=C_AUX,
                    markersize=6)
            ax.annotate(key, (r["p"], r["temp_bytes"] / 1e6),
                        textcoords="offset points", xytext=(-8, -3),
                        ha="right", fontsize=8, color=INK2)
    n = exh[0]["n"]
    ax.set_xticks(sorted({r["p"] for r in exh}))
    ax.set_xlabel("chips (P)", fontsize=10, color=INK2)
    ax.set_ylabel("per-chip XLA temp MB", fontsize=10, color=INK2)
    ax.set_title(
        f"Sharded all-pairs per-chip memory vs mesh size ({n:,} bodies)",
        fontsize=11, color=INK,
    )
    _save(fig, outdir, "mem_scaling.png")


def plot_scaling_prediction(outdir: str) -> None:
    path = os.path.join(BENCH_DIR, "scaling_prediction.json")
    if not os.path.exists(path):
        return
    rows = _read_jsonl(path)
    by_cfg: dict[str, list[dict]] = {}
    for r in rows:
        by_cfg.setdefault(r["config"], []).append(r)

    fig, ax = _fig(w=6.8, h=3.8)
    _style(ax, logx=True, logy=True)
    palette = {"exhaustive/1000000": C_REF,
               "barnes-hut-persistent/1000000": C_OURS,
               "barnes-hut-persistent/10000000": C_AUX}
    for cfg, rs in by_cfg.items():
        rs = sorted(rs, key=lambda r: r["p"])
        ps = [r["p"] for r in rs]
        ts = [r["step_s_serial"] for r in rs]
        color = palette.get(cfg, INK2)
        ax.plot(ps, ts, "-o", color=color, linewidth=2, markersize=5)
        # ideal = measured single-chip compute / P, anchored at the
        # smallest modeled P
        ideal = [rs[0]["compute_s"] * rs[0]["p"] / p for p in ps]
        ax.plot(ps, ideal, "--", color=color, linewidth=1, alpha=0.5)
        ax.annotate(cfg, (ps[-1], ts[-1]), textcoords="offset points",
                    xytext=(-4, 7), ha="right", fontsize=8, color=INK2)
    ax.set_xticks(sorted({r["p"] for r in rows}))
    ax.get_xaxis().set_major_formatter(matplotlib.ticker.ScalarFormatter())
    ax.set_xlabel("chips (P)", fontsize=10, color=INK2)
    ax.set_ylabel("predicted s/step", fontsize=10, color=INK2)
    ax.set_title(
        "ICI-model predicted step time vs mesh size\n"
        "(1-chip compute / P + counted bytes / ICI bw; dashed = ideal)",
        fontsize=10, color=INK,
    )
    _save(fig, outdir, "scaling_prediction.png")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outdir",
                    default=os.path.join(os.path.dirname(__file__), os.pardir,
                                         "docs", "img"))
    args = ap.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)
    plot_grid(args.outdir)
    plot_drift(args.outdir)
    plot_mem(args.outdir)
    plot_scaling_prediction(args.outdir)


if __name__ == "__main__":
    main()
