"""Measured per-chip ICI traffic receipts for the multi-chip paths.

VERDICT r4 item 7: bench/mem_scaling.json gates per-chip RESIDENCY; this
gates per-chip TRAFFIC — the bytes each chip moves over the mesh per
step, parsed from the compiled HLO's collective ops by
tools/traffic_report.py.  The asserted relations are the design claims
of parallel/sharding.py and parallel/bh_shard.py:

* gather and ring move IDENTICAL per-chip bytes (the ring trades
  latency for O(N/P) memory, not for traffic) — an exact identity;
* the 2-D torus moves strictly less than the 1-D paths at the same P
  (O(N/pi + N/pj) vs O(N));
* the Morton-halo exchange moves a small fraction of the persistent
  gather mode's bytes;
* the HLO-parsed totals match the analytic shape model exactly where
  one is recorded (a drifting model means the implementation changed).

Reference analog: the thread-scaling efficiency study
(README.md:80-99) — ICI collectives are the TPU version of that story.
"""

import json
import os
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

RECORD = os.path.join(REPO, "bench", "traffic_scaling.json")
PREDICTION = os.path.join(REPO, "bench", "scaling_prediction.json")


def _rows():
    if not os.path.exists(RECORD):
        pytest.skip("no traffic record yet")
    with open(RECORD) as f:
        return {
            (r["path"], r["p"]): r
            for r in (json.loads(x) for x in f if x.strip())
        }


def test_traffic_record_well_formed():
    rows = _rows()
    for p in (2, 4, 8):
        assert ("exhaustive/gather", p) in rows
        assert ("exhaustive/ring", p) in rows
    assert ("exhaustive/torus2x4", 8) in rows
    assert ("bh-persistent/gather", 8) in rows
    assert ("bh-persistent/halo", 8) in rows
    for r in rows.values():
        assert r["per_chip_step_bytes"] > 0
        assert r["collectives"], r["path"]


def test_gather_ring_traffic_identity():
    """Both 1-D j-streams move the remote (P-1)/P of the 16-byte j-side
    past every chip: the ring's win is MEMORY (mem_scaling.json), not
    traffic.  Exact equality, and both match the shape model."""
    rows = _rows()
    for p in (2, 4, 8):
        g = rows[("exhaustive/gather", p)]
        r = rows[("exhaustive/ring", p)]
        assert g["per_chip_step_bytes"] == r["per_chip_step_bytes"]
        assert g["per_chip_step_bytes"] == g["model_bytes"]
        assert r["per_chip_step_bytes"] == r["model_bytes"]


def test_torus_cuts_traffic():
    """O(N/pi + N/pj) vs O(N): the 2x4 torus must move strictly fewer
    bytes per chip than either 1-D stream at P=8, and match its model."""
    rows = _rows()
    t = rows[("exhaustive/torus2x4", 8)]
    g = rows[("exhaustive/gather", 8)]
    assert t["per_chip_step_bytes"] < g["per_chip_step_bytes"], (t, g)
    assert abs(t["per_chip_step_bytes"] - t["model_bytes"]) <= (
        0.02 * t["model_bytes"]
    ), t


def test_halo_cuts_bh_traffic():
    """The Morton-halo all_to_all (capped shell rows + psum'd grid
    floats) vs the planar-slot all_gather: measured 6.1x at 8k/ld4 —
    assert a conservative 3x so capacity-knob tweaks don't flap."""
    rows = _rows()
    h = rows[("bh-persistent/halo", 8)]["per_chip_step_bytes"]
    g = rows[("bh-persistent/gather", 8)]["per_chip_step_bytes"]
    assert h < g / 3.0, (h, g)


def test_traffic_matches_live_hlo():
    """Re-derive one row live (exhaustive/gather at P=8: a seconds-fast
    compile) so the record can't silently diverge from the code."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from traffic_report import exhaustive_traffic

    rows = _rows()
    live = exhaustive_traffic("gather", 8)
    rec = rows[("exhaustive/gather", 8)]
    assert live["per_chip_step_bytes"] == rec["per_chip_step_bytes"], (
        live, rec,
    )
    assert live["collectives"] == rec["collectives"]


def test_prediction_record():
    """The scaling-study deliverable: step-time-vs-P predictions under
    the ICI bandwidth model, anchored to measured single-chip rates.
    The design claim: at P=8 the flagship configs stay COMPUTE-bound
    (comm hides under compute), i.e. near-linear predicted scaling."""
    if not os.path.exists(PREDICTION):
        pytest.skip("no prediction record yet")
    with open(PREDICTION) as f:
        rows = [json.loads(x) for x in f if x.strip()]
    assert rows
    by_cfg = {}
    for r in rows:
        assert r["step_s_overlap"] <= r["step_s_serial"]
        assert r["step_s_overlap"] >= max(r["compute_s"], r["comm_s"])
        by_cfg.setdefault(r["config"], {})[r["p"]] = r
    for cfg, per_p in by_cfg.items():
        if 8 in per_p:
            r = per_p[8]
            assert r["comm_s"] < r["compute_s"], (cfg, r)
