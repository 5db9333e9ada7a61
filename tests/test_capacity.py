"""HBM-budget capacity sizing (nbody_tpu.core.capacity) and the
measured-prescriptive CapacityError contract.

The reference sizes its node pool from free VRAM and aborts on
exhaustion (cuda/barnes-hut.cu:886-890, openmp/barnes-hut.c:158-160);
here the analogs are the predictive fit check, the budget-clamped group
margin, and overflow stats that carry the measured requirement so the
error message names the exact flag value that fits.
"""

import numpy as np

import jax.numpy as jnp
import pytest

from nbody_tpu.core import capacity as cap
from nbody_tpu.ops.barneshut import CapacityError
from nbody_tpu.ops.bh_fused import check_fused

GIB = 2**30


def test_env_override(monkeypatch):
    monkeypatch.setenv("NBODY_HBM_BYTES", str(4 * GIB))
    assert cap.hbm_limit_bytes() == 4 * GIB
    assert cap.hbm_free_bytes() == 4 * GIB
    assert cap.budget_bytes() == int(4 * GIB * cap.BUDGET_FRAC)


def test_cpu_budget_is_none(monkeypatch):
    # the forced-CPU test devices have no HBM table entry -> heuristics
    # keep their legacy deterministic values
    monkeypatch.delenv("NBODY_HBM_BYTES", raising=False)
    assert cap.budget_bytes() is None


def test_auto_keep_legacy_without_budget():
    assert cap.auto_keep(10**6, 2048, 10**9, None) == 3 * (10**6 // 2048) + 256


def test_auto_keep_clamps_to_budget():
    n, b = 10**6, 2048
    legacy = 3 * (n // b) + 256
    # plentiful budget: unchanged (the margin costs time, never inflate)
    assert cap.auto_keep(n, b, 10**9, 64 * GIB) == legacy
    # tight budget: shrinks toward the occupancy floor, never below it
    tight = cap.auto_keep(n, b, 10**9, 20 * 2**20)
    assert cap.occupied_groups_floor(n, b) <= tight < legacy
    # g_max always clamps
    assert cap.auto_keep(n, b, 100, None) == 100


def test_estimate_and_ensure_fits():
    est = cap.estimate_fused_bytes(10**7, 2048, 15000, 6)
    # the measured 10M footprint is ~2.7 GiB; the estimate must be the
    # right order of magnitude and fit a 16 GiB chip
    assert 1.5 * GIB < est["total"] < 6 * GIB
    cap.ensure_fits(est, "10M", budget=12 * GIB)  # fits: no raise
    with pytest.raises(CapacityError) as ei:
        cap.ensure_fits(est, "fused Barnes-Hut at n=10000000", budget=1 * GIB)
    msg = str(ei.value)
    assert "GiB" in msg and "--shard" in msg and "Breakdown" in msg


def _cluster(n=384, seed=11):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-1, 1, (n, 3))
    pos[: n // 2] = 0.001 * rng.uniform(-1, 1, (n // 2, 3)) + 0.5
    return (
        jnp.asarray(pos, jnp.float32),
        jnp.asarray(rng.uniform(0.1, 1.0, n), jnp.float32),
    )


def test_trim_overflow_prescribes_keep_groups():
    pos, mass = _cluster()
    with pytest.raises(CapacityError) as ei:
        check_fused(
            pos, mass, group_size=128, keep_groups=1, interpret=True
        )
    msg = str(ei.value)
    assert "--bh-keep-groups" in msg
    # the prescription is exact: 1 kept + trimmed occupied groups
    need = int(msg.split("--bh-keep-groups ")[1].split()[0])
    stats = check_fused(
        pos, mass, group_size=128, keep_groups=need, interpret=True
    )
    assert int(stats["trimmed_groups"]) == 0


def test_frontier_overflow_prescribes_cap():
    # leaf_cap=1 + tiny theta forces full descent: the level-4 frontier
    # holds one octet per multi-body level-3 cell (~0.3 * 576 > 128)
    rng = np.random.default_rng(5)
    n = 576
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.1, 1.0, n), jnp.float32)
    kw = dict(
        group_size=576, ld=4, leaf_cap=1, theta=0.05, interpret=True
    )
    with pytest.raises(CapacityError) as ei:
        check_fused(pos, mass, frontier_cap=128, **kw)
    msg = str(ei.value)
    assert "--bh-frontier-cap" in msg
    # the prescription is a measured LOWER bound (a corrupted level can
    # undercount deeper ones): following it must converge, growing
    # monotonically, in a couple of rounds
    cap_now, tried = 128, []
    for _ in range(4):
        need = int(msg.split("--bh-frontier-cap ")[1].split()[0])
        assert need % 128 == 0 and need > cap_now
        cap_now, _ = need, tried.append(need)
        try:
            stats = check_fused(pos, mass, frontier_cap=cap_now, **kw)
            break
        except CapacityError as e:
            msg = str(e)
    else:
        pytest.fail(f"prescriptions did not converge: {tried}")
    assert int(stats["frontier_overflow"]) == 0
