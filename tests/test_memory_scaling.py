"""Measured per-chip memory receipts for the multi-chip paths.

VERDICT r3 weak #2: parity tests alone would stay green if a refactor
silently reintroduced an O(N) gather into a claimed-O(N/P) path.  These
tests read XLA's per-device allocation stats off the lowered programs
(`.lower().compile().memory_analysis()` on the forced 8-device CPU
mesh) and assert the SCALING RELATIONS the round-3 designs claim:

* ring j-stream: per-chip temp bytes fall ~1/P with chip count;
* gather: per-chip temp is P-independent (the O(N) baseline);
* 2-D torus (2x4): well under the 1-D gather at the same P;
* persistent Barnes-Hut Morton-halo: well under its own gather mode.

The measured table lives in bench/mem_scaling.json (tools/mem_report.py)
and docs/PERFORMANCE.md.
"""

import sys
import os

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _need_mesh():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")


def test_ring_temp_scales_inverse_p():
    _need_mesh()
    from mem_report import exhaustive_row

    t2 = exhaustive_row("ring", 2)["temp_bytes"]
    t8 = exhaustive_row("ring", 8)["temp_bytes"]
    # N/P scaling: 4x more chips -> ~4x less per-chip temp (allow 25%
    # slack for P-independent constants; measured 3.9x)
    assert t8 < t2 / 3.0, (t2, t8)


def test_gather_temp_is_o_n():
    _need_mesh()
    from mem_report import exhaustive_row

    t2 = exhaustive_row("gather", 2)["temp_bytes"]
    t8 = exhaustive_row("gather", 8)["temp_bytes"]
    # the gathered j-side (and the pair-chunk temps against it) do not
    # shrink with P — that is WHY ring/torus/halo exist
    assert t8 > 0.8 * t2, (t2, t8)


def test_ring_beats_gather_at_8():
    _need_mesh()
    from mem_report import exhaustive_row

    tg = exhaustive_row("gather", 8)["temp_bytes"]
    tr = exhaustive_row("ring", 8)["temp_bytes"]
    assert tr < tg / 4.0, (tg, tr)  # measured 7.7x


def test_torus_beats_1d_gather():
    _need_mesh()
    from mem_report import exhaustive_row, torus_row

    tg = exhaustive_row("gather", 8)["temp_bytes"]
    tt = torus_row((2, 4))["temp_bytes"]
    # O(N/pi + N/pj) vs O(N): measured 4.0x at (2, 4)
    assert tt < tg / 2.5, (tg, tt)


def test_bh_halo_beats_gather():
    """The Morton-halo exchange's O(M_l + P*H) source array vs the
    all_gather's O(N) — measured 2.3x at only 8k bodies / ld=4 (the
    gap widens with N since H tracks the AABB shell, not N)."""
    _need_mesh()
    from mem_report import bh_row

    tg = bh_row(False)["temp_bytes"]
    th = bh_row(True)["temp_bytes"]
    assert th < 0.6 * tg, (tg, th)
