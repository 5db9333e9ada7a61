"""Outlier-robust fused Barnes-Hut (bh_fused.barneshut_fused_robust).

The pathology: one escaper at r ~ 1000 inflates the root cube until a
single terminal cell holds ~all bodies and the near-field degenerates
to O(N^2) (measured at 1M, docs/PERFORMANCE.md).  The robust hybrid
must stay EXACT — matching the fp64 oracle within the theta envelope on
outlier-laden inputs — and agree with the plain kernel on clean ones.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle import accel_exhaustive
from nbody_tpu.ops.bh_fused import barneshut_fused, barneshut_fused_robust

pytestmark = pytest.mark.heavy  # interpret-mode kernels: quick tier skips


def _cloud_with_outliers(n=700, n_out=6, seed=0, r_out=300.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-2, 2, (n, 3))
    mass = rng.uniform(0.04, 1.0, n)
    # fling a few bodies far out (escapers / ejected binaries)
    u = rng.normal(size=(n_out, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos[:n_out] = u * r_out * rng.uniform(0.5, 1.0, (n_out, 1))
    return pos, mass


@pytest.mark.parametrize("seed", [0, 1])
def test_robust_matches_oracle_with_outliers(seed):
    pos_np, mass_np = _cloud_with_outliers(seed=seed)
    want = accel_exhaustive(pos_np, mass_np)
    scale = np.abs(want).max()
    acc, stats = barneshut_fused_robust(
        jnp.asarray(pos_np, jnp.float32), jnp.asarray(mass_np, jnp.float32),
        theta=0.5, group_size=128, outlier_slots=32, ld=3, interpret=True,
        return_stats=True,
    )
    assert int(stats["frontier_overflow"]) == 0
    err = np.abs(np.asarray(acc) - want).max() / scale
    assert err < 0.02, err
    # the outliers themselves get accurate forces too (tiny magnitudes:
    # check relative to each body's own force scale)
    own = np.abs(want[:6]).max(axis=1)
    err_out = np.abs(np.asarray(acc)[:6] - want[:6]).max(axis=1) / own
    assert err_out.max() < 0.02, err_out


@pytest.mark.slow
def test_robust_shrinks_the_box():
    """With outliers, the robust near volume must be far below the plain
    kernel's degenerate O(N^2) (the whole point).  Explicit ld=5: at
    auto_ld's tiny-n depth every cell is near on BOTH paths and the
    contrast cannot show.  `-m slow`: ~8 min of interpret-mode near
    emulation."""
    pos_np, mass_np = _cloud_with_outliers(n=2000, seed=2)
    p = jnp.asarray(pos_np, jnp.float32)
    m = jnp.asarray(mass_np, jnp.float32)
    _, st_plain = barneshut_fused(
        p, m, theta=0.5, group_size=128, ld=5, interpret=True,
        return_stats=True,
    )
    # plain: the r~300 escapers blow the cube up; the whole cloud sits
    # inside one terminal cell -> every group ships ~everything
    assert int(st_plain["near_bodies"]) > 0.9 * 2000 * (2000 // 128)
    _, st_rob = barneshut_fused_robust(
        p, m, theta=0.5, group_size=128, ld=5, outlier_slots=32,
        interpret=True, return_stats=True,
    )
    # at interpret-scale n the group AABBs span a big fraction of the
    # cloud, so the contrast is geometric-limited (~0.68 measured at
    # n=2000); the at-scale contrast is the 1M Plummer measurement in
    # docs/PERFORMANCE.md (981M -> ~30M near bodies).  This guards the
    # mechanism, not the full ratio.
    assert int(st_rob["near_bodies"]) < 0.75 * int(st_plain["near_bodies"]), (
        int(st_rob["near_bodies"]), int(st_plain["near_bodies"]),
    )


def test_robust_matches_plain_on_clean_input():
    """No outliers: the top-K bodies just move from the tree to the
    exact rectangle — forces agree with the plain kernel within the
    theta envelope (they are not bitwise: the border differs)."""
    rng = np.random.default_rng(5)
    n = 600
    pos = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32)
    a_plain = barneshut_fused(pos, mass, theta=0.5, group_size=128,
                              interpret=True)
    a_rob = barneshut_fused_robust(pos, mass, theta=0.5, group_size=128,
                                   outlier_slots=32, ld=3, interpret=True)
    scale = float(jnp.abs(a_plain).max())
    err = float(jnp.abs(a_plain - a_rob).max()) / scale
    assert err < 0.02, err


def test_cli_auto_detects_outliers(tmp_path):
    """The CLI's --bh-robust auto detection: an outlier-laden input
    engages the hybrid (note on stderr), a clean one does not."""
    import subprocess
    import sys as _sys

    pos, mass = _cloud_with_outliers(n=300, seed=3)
    rng = np.random.default_rng(3)
    vel = rng.uniform(-0.1, 0.1, (300, 3))
    inp = tmp_path / "in.csv"
    np.savetxt(inp, np.concatenate([pos, vel, mass[:, None]], axis=1),
               delimiter=",")
    out = tmp_path / "out.csv"
    r = subprocess.run(
        [_sys.executable, "-m", "nbody_tpu", str(inp), "0", "0.2", "0.1",
         str(out), "--algo", "barnes-hut", "--bh-traversal", "fused"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "enabling --bh-robust" in r.stderr
    assert "fused/robust" in r.stdout
    # clean input: no engagement
    r = subprocess.run(
        [_sys.executable, "-m", "nbody_tpu", "tests/data/100_bodies_g1.csv",
         "0", "0.2", "0.1", str(out), "--algo", "barnes-hut",
         "--bh-traversal", "fused"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "enabling --bh-robust" not in r.stderr


def test_persistent_robust_matches_oracle():
    """The persistent layout's robust mode: outlier-laden cloud, two
    resort chunks — trajectory matches the fp64 leapfrog oracle, and the
    outliers' mass survives the resorts (conservation via the
    out_gm stash/restore)."""
    from nbody_tpu.integrate.leapfrog import leapfrog_steps
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.ops import bh_persistent as bp
    from nbody_tpu.ops.exhaustive import exhaustive_accelerations

    pos_np, mass_np = _cloud_with_outliers(n=500, n_out=4, seed=7)
    rng = np.random.default_rng(7)
    vel_np = rng.uniform(-0.1, 0.1, (500, 3))
    pos = jnp.asarray(pos_np, jnp.float32)
    vel = jnp.asarray(vel_np, jnp.float32)
    mass = jnp.asarray(mass_np, jnp.float32)

    p_s, v_s = bp.simulate_persistent(
        pos, vel, mass, 6, 1e-3, G=1.0, softening_sq=1e-2,
        group_size=128, resort_every=3, interpret=True,
        robust_slots=16, max_drift_frac=0.0,
    )
    ref, _ = leapfrog_steps(
        Bodies(pos, vel, mass), 6, 1e-3,
        lambda p, m: exhaustive_accelerations(
            p, m, G=1.0, softening_sq=1e-2),
    )
    scale = float(jnp.abs(ref.vel).max())
    dv = np.abs(np.asarray(v_s) - np.asarray(ref.vel)).max() / scale
    dp = np.abs(np.asarray(p_s) - np.asarray(ref.pos)).max()
    assert np.isfinite(dv) and dv < 0.02, dv
    assert dp < 1e-2, dp


def test_persistent_robust_mass_restored_at_resort():
    from nbody_tpu.ops import bh_persistent as bp

    pos_np, mass_np = _cloud_with_outliers(n=400, n_out=4, seed=8)
    pos = jnp.asarray(pos_np, jnp.float32)
    vel = jnp.zeros((400, 3), jnp.float32)
    mass = jnp.asarray(mass_np, jnp.float32)
    st = bp.init_state(pos, vel, mass, G=1.0, group_size=128,
                       robust_slots=16, ld=4)
    # layout gm excludes the 16 stashed outliers...
    gm_layout = float(jnp.where(st.valid, st.pg[:, 3, :], 0.0).sum())
    gm_out = float(st.out_gm.sum())
    assert abs(gm_layout + gm_out - float(mass.sum())) < 1e-3
    assert gm_out > 0
    # ...and a resort restores then re-stashes it (no mass leaks)
    st2 = bp.resort(st, 400, 128, robust_slots=16, ld=4)
    gm2 = float(jnp.where(st2.valid, st2.pg[:, 3, :], 0.0).sum())
    assert abs(gm2 + float(st2.out_gm.sum()) - float(mass.sum())) < 1e-3


@pytest.fixture(scope="module")
def mesh8():
    import jax

    from nbody_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh(jax.devices()[:8])


def test_sharded_robust_matches_oracle(mesh8):
    """Distributed outlier hybrid (fused_shard_force_fn robust_slots):
    escaper-laden cloud through the full 8-chip pipeline — collective
    robust border, zero-massed outlier transit, replicated (K, 4) table,
    per-chip exact rectangle — vs the fp64 oracle.  The cloud is
    off-center and straddles the robust cube edge, covering the
    centered-frame key encode (the persistent layout's off-center
    regression above)."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.parallel.bh_shard import fused_shard_force_fn
    from nbody_tpu.parallel.sharding import shard_bodies

    n = 1024
    pos_np, mass_np = _cloud_with_outliers(n=n, n_out=5, seed=3)
    pos_np = pos_np + np.array([3.0, -1.0, 2.0])
    want = accel_exhaustive(pos_np, mass_np)
    scale = np.abs(want).max()
    bodies = shard_bodies(
        Bodies(
            jnp.asarray(pos_np, jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.asarray(mass_np, jnp.float32),
        ),
        mesh=mesh8,
    )
    force = fused_shard_force_fn(
        mesh=mesh8, G=1.0, softening_sq=0.01, theta=0.5, group_size=128,
        robust_slots=32, return_stats=True,
    )
    acc, stats = force(bodies.pos, bodies.mass)
    assert int(stats["bucket_overflow"]) == 0
    assert int(stats["trimmed_groups"]) == 0
    assert int(stats["frontier_overflow"]) == 0
    got = np.asarray(acc)[:n]
    err = np.abs(got - want).max() / scale
    assert err < 0.02, err
    # the escapers' own (tiny) forces are exact-rectangle accurate too
    own = np.abs(want[:5]).max(axis=1)
    err_out = np.abs(got[:5] - want[:5]).max(axis=1) / own
    assert err_out.max() < 0.02, err_out


def test_sharded_robust_matches_unsharded(mesh8):
    """Same robust scheme, different partitioning: the 8-chip pipeline
    must agree with the single-chip robust kernel far inside theta."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.parallel.bh_shard import fused_shard_force_fn
    from nbody_tpu.parallel.sharding import shard_bodies

    n = 768
    pos_np, mass_np = _cloud_with_outliers(n=n, n_out=4, seed=4)
    p = jnp.asarray(pos_np, jnp.float32)
    m = jnp.asarray(mass_np, jnp.float32)
    ref = np.asarray(
        barneshut_fused_robust(
            p, m, G=1.0, softening_sq=0.01, theta=0.5, group_size=128,
            outlier_slots=32, interpret=True,
        )
    )
    bodies = shard_bodies(
        Bodies(p, jnp.zeros((n, 3), jnp.float32), m), mesh=mesh8
    )
    force = fused_shard_force_fn(
        mesh=mesh8, G=1.0, softening_sq=0.01, theta=0.5, group_size=128,
        robust_slots=32,
    )
    got = np.asarray(force(bodies.pos, bodies.mass))[:n]
    # not bitwise (chip-median center vs global median shifts the cube;
    # chip-local groups tile differently) but far tighter than theta
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 0.01, err


def test_persistent_robust_off_center_cloud():
    """The robust cube is sized by distances from the MEDIAN center, so
    Morton keys must be encoded in the centered frame: an off-center
    cloud (centroid far from the origin) would otherwise assign massive
    bodies to the wrong cells (measured: 384/384 outside their nominal
    box, 14% force error at this offset) — MAC unsoundness of the kind
    robust mode exists to prevent.  Regression for the absolute-frame
    encode bug.  The offset must leave the cloud STRADDLING the cube
    edge: a fully-clipped cloud collapses into one exact near-field
    cell and cannot discriminate."""
    from nbody_tpu.ops import bh_persistent as bp
    from tests.oracle import accel_exhaustive

    n = 400
    pos_np, mass_np = _cloud_with_outliers(n=n, n_out=4, seed=9)
    pos_np = pos_np + np.array([3.0, -1.0, 2.0])  # off-center, straddling
    st = bp.init_state(
        jnp.asarray(pos_np, jnp.float32), jnp.zeros((n, 3), jnp.float32),
        jnp.asarray(mass_np, jnp.float32), G=1.0, group_size=128,
        robust_slots=16, ld=4,
    )
    acc = bp.state_forces(
        st, theta=0.5, softening_sq=0.01, leaf_cap=64, ld=4, interpret=True
    )
    g, _, b = st.pg.shape
    got_flat = np.asarray(
        jnp.transpose(acc, (0, 2, 1)).reshape(g * b, 3)
    )
    dest = np.asarray(st.orig).reshape(-1)
    keep = dest < n
    got = np.zeros((n, 3), np.float32)
    got[dest[keep]] = got_flat[keep]
    want = accel_exhaustive(pos_np, mass_np)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 0.02, err


def test_sharded_persistent_robust_matches_oracle(mesh8):
    """Sharded PERSISTENT robust (the sgm sideband design): escaper-laden
    off-center cloud, migrant resorts between chunks, vs the fp64
    leapfrog trajectory.  Covers the frozen centered frame, the stashed
    G*mass riding the exchanges, and the per-step outlier table."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.integrate.leapfrog import leapfrog_steps
    from nbody_tpu.ops.exhaustive import exhaustive_accelerations
    from nbody_tpu.parallel.bh_shard import simulate_persistent_sharded
    from nbody_tpu.parallel.sharding import shard_bodies

    n = 512
    pos_np, mass_np = _cloud_with_outliers(n=n, n_out=4, seed=13)
    pos_np = pos_np + np.array([2.0, -1.0, 1.5])
    rng = np.random.default_rng(13)
    vel_np = rng.uniform(-0.1, 0.1, (n, 3))
    pos = jnp.asarray(pos_np, jnp.float32)
    vel = jnp.asarray(vel_np, jnp.float32)
    mass = jnp.asarray(mass_np, jnp.float32)
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh8)
    p_s, v_s = simulate_persistent_sharded(
        bodies, 4, 1e-3, mesh=mesh8, resort_every=2, max_drift_frac=0.0,
        G=1.0, softening_sq=0.01, theta=0.5, group_size=128,
        robust_slots=32,
    )
    ref, _ = leapfrog_steps(
        Bodies(pos, vel, mass), 4, 1e-3,
        lambda p, m: exhaustive_accelerations(
            p, m, G=1.0, softening_sq=0.01),
    )
    dp = np.abs(np.asarray(p_s)[:n] - np.asarray(ref.pos)).max()
    assert np.isfinite(dp) and dp < 1e-3, dp
    dv = np.abs(np.asarray(v_s)[:n] - np.asarray(ref.vel)).max()
    scale = float(jnp.abs(ref.vel).max())
    assert dv / scale < 0.02, dv / scale
