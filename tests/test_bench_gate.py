"""Performance-regression gate (VERDICT r1 item 6).

bench/bench_grid_best.json records the best seconds-per-eval this
framework has achieved per (algo, n) config on the real TPU chip
(written by `python tools/bench_grid.py --out ...` and checked in each
round).  On a TPU backend this gate re-times each recorded config and
fails on a >1.5x regression; on the CPU test mesh it validates the
record's shape and gates the physics instead (energy drift of a leapfrog
run must stay within the reference's 1e-3 contract, BASELINE.md:66-68).
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "bench", "bench_grid_best.json")
ENVELOPE = 1.5  # allowed slowdown vs the recorded round best


def _load_record():
    if not os.path.exists(RECORD):
        pytest.skip("no recorded benchmark grid yet")
    with open(RECORD) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_record_well_formed():
    recs = _load_record()
    assert recs, "record exists but is empty"
    for r in recs:
        assert r["algo"] in (
            "exhaustive", "barnes-hut", "barnes-hut-persistent",
        )
        assert r["n"] >= 1000 and r["value"] > 0 and r["unit"] == "s/step"
        if r["vs_baseline"] is not None:
            # the point of the framework: never slower than the reference,
            # at ANY size in its own table.  (Round 3 removed the n<10k
            # carve-out: with the reference's own per-size step counts —
            # 1000 iterations at 1k, not 16 — the dispatch cost amortizes
            # and every row wins, tools/bench_grid.py REF_STEPS.)
            assert r["vs_baseline"] > 1.0, (
                f"recorded config {r['algo']}/{r['n']} is slower than the "
                f"reference best ({r['vs_baseline']:.2f}x)"
            )


def test_perf_envelope_on_tpu():
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("perf envelope is only meaningful on the real chip")
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_grid import bench_config

    for r in _load_record():
        if r["n"] > 200_000:
            continue  # fast gate; the 1M rows run under -m slow below
        sec = bench_config(r["algo"], r["n"], reps=2)
        assert sec < r["value"] * ENVELOPE, (
            f"{r['algo']}/{r['n']} regressed: {sec:.4f}s vs recorded "
            f"{r['value']:.4f}s (envelope {ENVELOPE}x)"
        )


@pytest.mark.slow
def test_perf_envelope_on_tpu_1m():
    """The 1M rows of the grid, multi-minute: opt in with -m slow."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("perf envelope is only meaningful on the real chip")
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_grid import bench_config

    for r in _load_record():
        if r["n"] <= 200_000:
            continue
        sec = bench_config(r["algo"], r["n"], reps=2)
        assert sec < r["value"] * ENVELOPE, (
            f"{r['algo']}/{r['n']} regressed: {sec:.4f}s vs recorded "
            f"{r['value']:.4f}s (envelope {ENVELOPE}x)"
        )


def test_energy_drift_contract():
    """A 50-step leapfrog run of a virialized-ish cloud keeps |dE/E0|
    within the 1e-3 contract (BASELINE.md north star) on any backend."""
    import jax.numpy as jnp

    from nbody_tpu.core.types import Bodies
    from nbody_tpu.diag.energy import energy_drift, get_energy
    from nbody_tpu.integrate.leapfrog import leapfrog_steps
    from nbody_tpu.ops.barneshut import barneshut_accelerations

    rng = np.random.default_rng(12)
    n = 2000
    bodies = Bodies(
        pos=jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        vel=jnp.asarray(rng.uniform(-0.1, 0.1, (n, 3)), jnp.float32),
        mass=jnp.asarray(rng.uniform(0.04, 0.2, n), jnp.float32),
    )
    ke0, pe0 = get_energy(bodies.pos, bodies.vel, bodies.mass, G=1.0)
    out, _ = leapfrog_steps(
        bodies, 50, 1e-4,
        lambda p, m: barneshut_accelerations(p, m, G=1.0),
    )
    ke1, pe1 = get_energy(out.pos, out.vel, out.mass, G=1.0)
    drift = energy_drift(float(ke1 + pe1), float(ke0 + pe0))
    assert abs(drift) < 1e-3, drift


DRIFT_RECORD = os.path.join(REPO, "bench", "drift_series.json")


def test_drift_series_record():
    """Gate the recorded long-run drift CURVE (tools/drift_series.py):
    every sample of the 500-step Barnes-Hut run stays within the 1e-3
    contract, and the curve oscillates instead of growing — the second
    half's worst drift must not exceed 3x the first half's (a secular
    trend in a symplectic KDK run means a force path went wrong, e.g.
    silently dropped sources)."""
    if not os.path.exists(DRIFT_RECORD):
        pytest.skip("no recorded drift series yet")
    with open(DRIFT_RECORD) as f:
        lines = [json.loads(x) for x in f if x.strip()]
    head, samples = lines[0], lines[1:]
    assert head["config"]["algo"] == "barnes-hut"
    assert len(samples) >= 8
    drifts = np.array([s["drift"] for s in samples])
    steps = np.array([s["step"] for s in samples])
    assert (steps[1:] > steps[:-1]).all()
    assert np.isfinite(drifts).all()
    assert drifts.max() < 1e-3, drifts.max()
    half = len(drifts) // 2
    first, second = drifts[:half].max(), drifts[half:].max()
    assert second <= 3.0 * max(first, 1e-6), (first, second)


DRIFT_RECORD_1M = os.path.join(REPO, "bench", "drift_series_1m.json")


def test_drift_series_record_1m():
    """Same curve contract for the benchmark-scale (1M-body) drift
    record (tools/drift_series.py 1000000; fp64-grade df PE so the
    measurement noise sits far below the 1e-3 budget)."""
    if not os.path.exists(DRIFT_RECORD_1M):
        pytest.skip("no recorded 1M drift series yet")
    with open(DRIFT_RECORD_1M) as f:
        lines = [json.loads(x) for x in f if x.strip()]
    head, samples = lines[0], lines[1:]
    assert head["config"]["n"] >= 1_000_000
    assert head["config"]["algo"] == "barnes-hut"
    assert len(samples) >= 8
    drifts = np.array([s["drift"] for s in samples])
    assert np.isfinite(drifts).all()
    assert drifts.max() < 1e-3, drifts.max()
    half = len(drifts) // 2
    first, second = drifts[:half].max(), drifts[half:].max()
    assert second <= 3.0 * max(first, 1e-6), (first, second)


SCALE_RECORD = os.path.join(REPO, "bench", "bench_scale.json")


def _load_scale():
    if not os.path.exists(SCALE_RECORD):
        pytest.skip("no recorded scale rows yet")
    with open(SCALE_RECORD) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_scale_record_well_formed():
    """The beyond-reference scale rows (10M fused/persistent), recorded
    by `tools/bench_bh.py N [--persistent] --record` (VERDICT r3 item 5:
    receipts in gated JSON, not PERFORMANCE.md prose)."""
    recs = _load_scale()
    assert recs
    modes = {(r["n"], r["mode"]) for r in recs}
    assert (10_000_000, "fused") in modes
    assert (10_000_000, "persistent") in modes
    for r in recs:
        assert r["mode"] in ("fused", "persistent", "fused-df")
        assert r["unit"] == "s/step" and r["value"] > 0
        if r["mode"] == "fused-df" and r["vs_baseline"] is not None:
            # the df row is the apples-to-apples fp64 comparison: the
            # reference's 5.876 s/step at 1M is itself double-precision
            # (cuda/barnes-hut.cu double* arrays) — never lose to it
            assert r["vs_baseline"] > 1.0, r
        if r["n"] == 10_000_000:
            # linear-in-N sanity from the gated 1M grid rows: 10M must
            # run within 3x of 10 x the 1M fused record (superlinear
            # blowup = a capacity/occupancy regression)
            with open(RECORD) as f:
                one_m = [
                    json.loads(x) for x in f
                    if x.strip() and '"n": 1000000' in x
                    and "barnes-hut" in x
                ]
            if one_m:
                assert r["value"] < 30 * one_m[0]["value"]


@pytest.mark.slow
def test_scale_envelope_on_tpu_10m():
    """Re-time the 10M persistent row on the real chip (multi-minute:
    opt in with -m slow)."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("perf envelope is only meaningful on the real chip")
    recs = [r for r in _load_scale()
            if r["n"] == 10_000_000 and r["mode"] == "persistent"]
    if not recs:
        pytest.skip("no 10M persistent row yet")
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, os.path.join(REPO, "tools", "bench_bh.py"),
         "10000000", "--persistent"],
        capture_output=True, text=True, timeout=3600,
    )
    line = [x for x in out.stdout.splitlines() if x.startswith("{")][-1]
    sec = json.loads(line)["value"]
    assert sec < recs[0]["value"] * ENVELOPE, (sec, recs[0]["value"])


BLOCK_RECORD = os.path.join(REPO, "bench", "block_tiers.json")


def test_block_tiers_record():
    """The stratified-fixture block-step A/B on silicon (VERDICT r4
    item 3).  Measured truth (round 5, 1M hot-core/cold-halo fixture,
    tiers [900, 10, 94]): masked 845.2 vs prefix 849.8 ms/macro-step —
    the round-4 packed eval made masked-out groups nearly free, so the
    per-tier prefix subgrids were REFUTED as a win and masked is the
    CLI default (`--block-prefix` keeps the path for A/B).  The gate
    pins (a) the CLI default to the record's winner, (b) block mode
    beating the uniform-fine integration it exists to avoid, and (c)
    the winner under the verdict's 900 ms bar."""
    if not os.path.exists(BLOCK_RECORD):
        pytest.skip("no block-tiers record yet")
    with open(BLOCK_RECORD) as f:
        r = json.load(f)
    assert r["stratified"] and r["n"] >= 1_000_000
    hist = r["tier_histogram"]
    assert len(hist) == r["n_tiers"] and sum(hist) > 0
    # the regime premise: tiers actually stratified (not all-finest)
    assert max(hist) < sum(hist), hist
    assert r["masked_ms"] <= r["prefix_ms"], (
        "prefix grids beat masked on silicon — flip the CLI default "
        "back to prefix (cli/main.py --block-prefix)"
    )
    winner = min(r["masked_ms"], r["prefix_ms"])
    assert winner < r["uniform_fine_ms"], (
        "block tiers lost to uniform-fine integration"
    )
    assert winner < 900.0, winner


DRYRUN_RECORD = os.path.join(REPO, "bench", "dryrun_budget.json")


def test_dryrun_budget_record():
    """The multi-chip dryrun is the only driver-visible multi-chip receipt
    and it timed out in round 4 (MULTICHIP_r04 rc=124).  Gate the measured
    budget record: the recorded cold time must clear the self-check budget
    with >= 2x headroom, and the budget constant in __graft_entry__ must
    match the record (a future round that regrows the dryrun must
    re-measure, not just re-type the number)."""
    if not os.path.exists(DRYRUN_RECORD):
        pytest.skip("no dryrun budget record yet")
    with open(DRYRUN_RECORD) as f:
        r = json.load(f)
    assert r["warm_s"] <= r["cold_s"]
    assert r["cold_s"] * 2.0 <= r["budget_s"], (
        "cold dryrun no longer has 2x headroom under its self-check budget"
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_graft_entry_probe", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.DRYRUN_BUDGET_S == r["budget_s"]


DF_RECORD = os.path.join(REPO, "bench", "df_record.json")


def test_df_record_well_formed():
    """The fp64-grade (compensated-f32x2) throughput record: must beat
    the reference's fp64 GPU all-pairs number (exh_cuda 8.0e8 pairs/s,
    tests_result.txt:13) by a wide margin and carry a measured f64
    parity error at df precision."""
    if not os.path.exists(DF_RECORD):
        pytest.skip("no df record yet")
    with open(DF_RECORD) as f:
        r = json.load(f)
    assert r["unit"] == "pairs/s"
    assert r["value"] > 10 * r["ref_fp64_pairs_per_s"]
    assert r["force_rel_err_vs_f64"] < 1e-12


def test_df_perf_envelope_on_tpu():
    """Re-time the df kernel on the real chip (100k, inside lax.scan)
    against the recorded round best."""
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("perf envelope is only meaningful on the real chip")
    if not os.path.exists(DF_RECORD):
        pytest.skip("no df record yet")
    import time

    import jax.numpy as jnp
    from jax import lax

    from nbody_tpu.ops.pallas_df import pallas_rect_accelerations_df

    with open(DF_RECORD) as f:
        r = json.load(f)
    rng = np.random.default_rng(0)
    n = 100_000
    pos = jnp.asarray(rng.uniform(-2, 2, (n, 3)))
    mass = jnp.asarray(rng.uniform(0.04, 1.0, n))
    steps = 3

    @jax.jit
    def loop(pos, mass):
        def body(p, _):
            return p + 1e-9 * pallas_rect_accelerations_df(p, p, mass), None

        return lax.scan(body, pos, None, length=steps)[0]

    np.asarray(loop(pos, mass)[:1])  # compile + warm
    t0 = time.perf_counter()
    np.asarray(loop(pos, mass)[:1])
    dt = time.perf_counter() - t0
    pairs = n * n * steps / dt
    assert pairs > r["value"] / ENVELOPE, (
        f"df kernel regressed: {pairs:.3e} pairs/s vs recorded "
        f"{r['value']:.3e} (envelope {ENVELOPE}x)"
    )
