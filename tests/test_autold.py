"""Data-adaptive grid depth (nbody_tpu.ops.bh_autold).

The quick-tier tests exercise the pure-NumPy cost estimator; the heavy
one pins its near-volume estimate against the fused kernel's own
occupancy receipts (interpret mode)."""

import numpy as np
import pytest

from nbody_tpu.ops.bh_autold import (
    choose_ld,
    estimate_bh_costs,
    np_morton_encode,
    robust_border_np,
)


def _plummer(n, seed=0, core=True, escapers=True):
    rng = np.random.default_rng(seed)
    if core:
        u = rng.uniform(0.05, 0.95, n)
        r = 1.0 / np.sqrt(u ** (-2.0 / 3.0) - 1.0)
    else:
        r = rng.uniform(0.4, 2.8, n)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = (r[:, None] * d).astype(np.float32)
    if escapers:
        pos[: max(4, n // 10000)] *= 1000.0
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    return pos, mass


def test_np_morton_matches_jax():
    import jax.numpy as jnp

    from nbody_tpu.ops.morton import morton_encode

    rng = np.random.default_rng(3)
    pos = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    border = 2.0 * float(np.max(np.abs(pos)))
    want = np.asarray(morton_encode(jnp.asarray(pos), jnp.float32(border), 8))
    got = np_morton_encode(pos, border, 8)
    np.testing.assert_array_equal(got, want.astype(np.int64))


def test_robust_border_matches_fused():
    """Same box the robust wrapper computes (median center, (K+1)-th
    largest Chebyshev distance)."""
    pos, mass = _plummer(4000, seed=1)
    center, border, out_idx = robust_border_np(pos, outlier_slots=128)
    np.testing.assert_allclose(center, np.median(pos, axis=0), rtol=1e-6)
    d = np.max(np.abs(pos - center), axis=1)
    k = 128
    want = 2.0 * np.sort(d)[-(k + 1)] * 1.0001
    assert abs(border - want) / want < 1e-5
    assert len(out_idx) == k
    # the K outliers are exactly the K largest distances
    assert set(out_idx) == set(np.argsort(d)[-k:])


def test_uniform_does_not_overdeepen():
    """A uniform cloud resolves at auto_ld; the table term must stop the
    chooser from paying for depth it cannot use."""
    from nbody_tpu.ops.bh_fused import auto_ld

    rng = np.random.default_rng(0)
    n = 40_000
    pos = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    ld, costs = choose_ld(pos, mass, persistent=True)
    assert ld <= auto_ld(n) + 1


def test_core_deepens_past_shell():
    """The core-dense Plummer must price deeper than the shell-like one
    (the round-3 hand-tuning this chooser replaces: ld 8 vs ld 6)."""
    n = 60_000
    pos_c, mass = _plummer(n, seed=0, core=True)
    pos_s, _ = _plummer(n, seed=0, core=False)
    ld_c, costs_c = choose_ld(pos_c, mass, robust=True, persistent=True)
    ld_s, costs_s = choose_ld(pos_s, mass, robust=True, persistent=True)
    assert ld_c >= ld_s
    # the core's near volume must keep dropping with depth while the
    # shell's has flattened (fully resolved)
    dc = sorted(costs_c)
    assert costs_c[dc[0]]["near"] > costs_c[dc[-1]]["near"]


def test_deeper_never_increases_near():
    """near(d) is monotonically non-increasing in d by construction."""
    pos, mass = _plummer(30_000, seed=2)
    center, border, _ = robust_border_np(pos)
    costs = estimate_bh_costs(
        pos, mass, border=border, center=center, depths=(4, 5, 6, 7, 8)
    )
    ds = sorted(costs)
    nears = [costs[d]["near"] for d in ds]
    assert all(a >= b - 1e-6 for a, b in zip(nears, nears[1:]))


@pytest.mark.heavy
def test_estimate_matches_kernel_receipts():
    """The estimator's near volume must land within 2x of the fused
    kernel's measured near_bodies receipt (all groups sampled, same
    theta/leaf_cap/group_size)."""
    import jax.numpy as jnp

    from nbody_tpu.ops.bh_fused import barneshut_fused

    rng = np.random.default_rng(7)
    n = 2048
    pos = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.5, 1.5, n).astype(np.float32)
    border = 2.0 * float(np.max(np.abs(pos)))
    gs = 256
    _, stats = barneshut_fused(
        jnp.asarray(pos),
        jnp.asarray(mass),
        G=1.0,
        softening_sq=1e-2,
        theta=0.5,
        ld=3,
        group_size=gs,
        interpret=True,
        return_stats=True,
    )
    got_near = float(stats["near_bodies"])
    costs = estimate_bh_costs(
        pos,
        mass,
        border=border,
        theta=0.5,
        group_size=gs,
        depths=(3,),
        sample_groups=10_000,
    )
    est = costs[3]["near"]
    assert est / got_near < 2.0 and got_near / est < 2.0, (est, got_near)


def test_choose_ld_cached_memo(tmp_path, monkeypatch):
    """The persistent probe memo (VERDICT r4 weak #7): a re-run on the
    same input skips the probe and returns the same pick; a different
    input or pricing config misses."""
    from nbody_tpu.ops import bh_autold

    monkeypatch.setenv("NBODY_TPU_COMPILE_CACHE", str(tmp_path))
    monkeypatch.delenv("NBODY_TPU_NO_COMPILE_CACHE", raising=False)
    pos, mass = _plummer(60000, seed=5)
    ld0, hit0 = bh_autold.choose_ld_cached(pos, mass, robust=True)
    assert not hit0
    ld1, hit1 = bh_autold.choose_ld_cached(pos, mass, robust=True)
    assert hit1 and ld1 == ld0
    # config change -> new key (probe runs again)
    ld2, hit2 = bh_autold.choose_ld_cached(
        pos, mass, robust=True, theta=0.9
    )
    assert not hit2
    # content change -> new key
    pos2 = pos.copy()
    pos2[0] += 100.0
    _, hit3 = bh_autold.choose_ld_cached(pos2, mass, robust=True)
    assert not hit3
    # opt-out env falls back to probing, never reads the memo
    monkeypatch.setenv("NBODY_TPU_NO_COMPILE_CACHE", "1")
    ld4, hit4 = bh_autold.choose_ld_cached(pos, mass, robust=True)
    assert not hit4 and ld4 == ld0
