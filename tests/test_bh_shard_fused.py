"""Morton-range-sharded Barnes-Hut (nbody_tpu.parallel.bh_shard).

Runs the full distributed pipeline — local sort, sample-sort splitters,
all_to_all redistribution, psum'd dense-grid build, per-chip fused
traversal (Pallas interpret mode) — on the forced 8-device CPU mesh and
checks forces against fp64 direct summation.  N stays small: the fused
kernel executes pop-by-pop in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.oracle import accel_exhaustive_f64
import pytest

from nbody_tpu.core.types import Bodies
from nbody_tpu.parallel.bh_shard import check_sharded_fused, fused_shard_force_fn
from nbody_tpu.parallel.mesh import make_mesh
from nbody_tpu.parallel.sharding import shard_bodies

pytestmark = pytest.mark.heavy  # interpret-mode kernels: quick tier skips

EPS2 = 0.01
G = 1.0


def _direct(pos, mass):
    # EPS2/G here match tests.oracle's module constants (0.01 / 1.0)
    return accel_exhaustive_f64(pos, mass, G=G)


def _cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32),
        jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32),
    )


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh(jax.devices()[:8])


def test_sharded_fused_parity_vs_direct(mesh):
    n = 1024
    pos, vel, mass = _cloud(n, seed=2)
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    force = fused_shard_force_fn(
        mesh=mesh, G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        return_stats=True,
    )
    acc, stats = force(bodies.pos, bodies.mass)
    assert int(stats["bucket_overflow"]) == 0
    assert int(stats["trimmed_groups"]) == 0
    assert int(stats["frontier_overflow"]) == 0
    got = np.asarray(acc)[:n]
    want = _direct(pos, mass)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 0.02, err


def test_sharded_fused_matches_single_chip(mesh):
    """The distributed pipeline must agree with the single-chip fused path
    far beyond theta accuracy — same tree refinement, same grouping rules,
    different partitioning."""
    from nbody_tpu.ops.bh_fused import barneshut_fused

    n = 768
    pos, vel, mass = _cloud(n, seed=5)
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    force = fused_shard_force_fn(
        mesh=mesh, G=G, softening_sq=EPS2, theta=0.5, group_size=128
    )
    got = np.asarray(force(bodies.pos, bodies.mass))[:n]
    ref = np.asarray(
        barneshut_fused(
            pos, mass, G=G, softening_sq=EPS2, theta=0.5,
            group_size=128, interpret=True,
        )
    )
    scale = np.abs(ref).max()
    # not bitwise (chip-local groups tile the Morton order differently,
    # and group AABBs gate the MAC) but far tighter than the theta error
    err = np.abs(got - ref).max() / scale
    assert err < 0.01, err


def test_sharded_fused_clustered(mesh):
    """Two dense clusters + empty space: exercises splitter snapping,
    uneven buckets, and exact near-field shipping of over-full cells."""
    rng = np.random.default_rng(11)
    n = 1024
    half = n // 2
    a = rng.normal([-1.5, 0, 0], 0.03, size=(half, 3))
    c = rng.normal([1.5, 0, 0], 0.03, size=(n - half, 3))
    pos = jnp.asarray(np.vstack([a, c]), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32)
    bodies = shard_bodies(
        Bodies(pos, jnp.zeros((n, 3), jnp.float32), mass), mesh=mesh
    )
    stats = check_sharded_fused(
        bodies, mesh=mesh, G=G, softening_sq=EPS2, theta=0.5,
        group_size=128, bucket_frac=8.0,
    )
    assert int(stats["near_bodies"]) > 0
    force = fused_shard_force_fn(
        mesh=mesh, G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        bucket_frac=8.0,
    )
    got = np.asarray(force(bodies.pos, bodies.mass))[:n]
    want = _direct(pos, mass)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 0.02, err


def test_halo_matches_gather(mesh):
    """halo=True (per-chip O(N/P + halo) memory) must produce the SAME
    forces as the all_gather path: the kernel evaluates identical values
    from relocated slots, so only theta-independent noise is allowed."""
    n = 1024
    pos, vel, mass = _cloud(n, seed=31)
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    f_halo = fused_shard_force_fn(
        mesh=mesh, G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        halo=True, return_stats=True,
    )
    f_gath = fused_shard_force_fn(
        mesh=mesh, G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        halo=False,
    )
    acc_h, stats = f_halo(bodies.pos, bodies.mass)
    assert int(stats["halo_overflow"]) == 0
    acc_g = np.asarray(f_gath(bodies.pos, bodies.mass))
    np.testing.assert_allclose(
        np.asarray(acc_h), acc_g, rtol=1e-5, atol=1e-6
    )


def test_halo_clustered_matches_gather(mesh):
    """Clustered input (over-full terminal cells shipped exactly, uneven
    chip AABBs, cross-boundary near fields) through the halo exchange."""
    rng = np.random.default_rng(37)
    n = 1024
    half = n // 2
    a = rng.normal([-1.5, 0, 0], 0.03, size=(half, 3))
    c = rng.normal([1.5, 0, 0], 0.03, size=(n - half, 3))
    pos = jnp.asarray(np.vstack([a, c]), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32)
    bodies = shard_bodies(
        Bodies(pos, jnp.zeros((n, 3), jnp.float32), mass), mesh=mesh
    )
    f_halo = fused_shard_force_fn(
        mesh=mesh, G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        bucket_frac=8.0, halo=True, return_stats=True,
    )
    f_gath = fused_shard_force_fn(
        mesh=mesh, G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        bucket_frac=8.0, halo=False,
    )
    acc_h, stats = f_halo(bodies.pos, bodies.mass)
    assert int(stats["halo_overflow"]) == 0
    acc_g = np.asarray(f_gath(bodies.pos, bodies.mass))
    # not bitwise: near-field runs merge differently across the packed
    # segment boundaries, reordering the f32 lane accumulation (measured
    # 2/3072 lanes at ~9e-5 rel); a genuinely dropped source in a
    # 0.03-sigma cluster would be orders of magnitude louder
    np.testing.assert_allclose(
        np.asarray(acc_h), acc_g, rtol=5e-4, atol=1e-5
    )


def test_halo_overflow_detected(mesh):
    """An undersized halo_cap must flag, never silently drop sources."""
    n = 1024
    pos, vel, mass = _cloud(n, seed=41)
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    f = fused_shard_force_fn(
        mesh=mesh, G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        halo=True, halo_cap=128, return_stats=True,
    )
    acc, stats = f(bodies.pos, bodies.mass)
    assert int(stats["halo_overflow"]) > 0
    assert not np.isfinite(np.asarray(acc)).all()  # NaN-poisoned


def test_sharded_fused_in_leapfrog(mesh):
    """One KDK step end-to-end with the sharded force (the production
    wiring: shard_bodies + leapfrog_steps)."""
    from nbody_tpu.integrate.leapfrog import leapfrog_steps
    from nbody_tpu.ops.exhaustive import direct_accelerations

    n = 512
    pos, vel, mass = _cloud(n, seed=9)
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    force = fused_shard_force_fn(
        mesh=mesh, G=G, softening_sq=EPS2, theta=0.5, group_size=128
    )
    out, _ = leapfrog_steps(bodies, 2, 1e-3, force)
    ref, _ = leapfrog_steps(
        Bodies(pos, vel, mass), 2, 1e-3, direct_accelerations
    )
    dp = np.abs(np.asarray(out.pos)[:n] - np.asarray(ref.pos)).max()
    assert dp < 5e-4, dp


def test_sharded_persistent_matches_reference(mesh):
    """Sharded persistent order (redistribution = resort, per-step psum'd
    float tables): 4 KDK steps vs the fp64 direct-summation trajectory."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.integrate.leapfrog import leapfrog_steps
    from nbody_tpu.ops.exhaustive import direct_accelerations
    from nbody_tpu.parallel.bh_shard import simulate_persistent_sharded

    n = 512
    pos, vel, mass = _cloud(n, seed=17)
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    p_s, v_s = simulate_persistent_sharded(
        bodies, 4, 1e-3, mesh=mesh, resort_every=2,
        G=G, softening_sq=EPS2, theta=0.5, group_size=128,
    )
    ref, _ = leapfrog_steps(
        Bodies(pos, vel, mass), 4, 1e-3, direct_accelerations
    )
    dp = np.abs(np.asarray(p_s)[:n] - np.asarray(ref.pos)).max()
    assert dp < 5e-5, dp
    dv = np.abs(np.asarray(v_s)[:n] - np.asarray(ref.vel)).max()
    # theta-level force error integrated over 4 steps: ~1e-3-scale like
    # the position bound (measured 4.5e-4; the old 5e-1 proved only
    # finiteness)
    assert np.isfinite(dv) and dv < 2e-3


def test_sharded_persistent_migration(mesh):
    """Migrant-only resorts under REAL migration: fast bodies cross chip
    Morton ranges between resorts (drift guard disabled so multi-step
    chunks run), trajectory parity vs fp64 direct summation."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.integrate.leapfrog import leapfrog_steps
    from nbody_tpu.ops.exhaustive import direct_accelerations
    from nbody_tpu.parallel.bh_shard import simulate_persistent_sharded

    n = 512
    pos, vel, mass = _cloud(n, seed=23)
    vel = vel * 20.0  # ~0.4 per chunk of 2 steps: crosses terminal cells
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    p_s, v_s = simulate_persistent_sharded(
        bodies, 6, 1e-2, mesh=mesh, resort_every=2, max_drift_frac=0.0,
        G=G, softening_sq=EPS2, theta=0.5, group_size=128,
    )
    ref, _ = leapfrog_steps(
        Bodies(pos, vel, mass), 6, 1e-2, direct_accelerations
    )
    dp = np.abs(np.asarray(p_s)[:n] - np.asarray(ref.pos)).max()
    # stale-partition MAC error accumulates over the un-resorted steps;
    # positions move ~1.2 over the run, so 5e-3 is theta-level accuracy
    assert dp < 5e-3, dp


def test_sharded_persistent_oob_rebalance(mesh):
    """A body escaping the frozen root cube must trigger the oob flag and
    a full rebalance (fresh border + splitters), not silent key clamping."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.integrate.leapfrog import leapfrog_steps
    from nbody_tpu.ops.exhaustive import direct_accelerations
    from nbody_tpu.parallel.bh_shard import simulate_persistent_sharded

    n = 512
    pos, vel, mass = _cloud(n, seed=29)
    # exits the root cube after ~3 steps
    vel = vel.at[7].set(jnp.asarray([60.0, 0.0, 0.0], jnp.float32))
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    p_s, v_s = simulate_persistent_sharded(
        bodies, 8, 1e-2, mesh=mesh, resort_every=2, max_drift_frac=0.0,
        G=G, softening_sq=EPS2, theta=0.5, group_size=128,
    )
    ref, _ = leapfrog_steps(
        Bodies(pos, vel, mass), 8, 1e-2, direct_accelerations
    )
    got = np.asarray(p_s)[:n]
    want = np.asarray(ref.pos)
    assert np.isfinite(got).all()
    dp = np.abs(got - want).max()
    assert dp < 5e-3, dp
    # the escaper really did leave the initial cube (the test premise)
    assert np.abs(want[7]).max() > 2.0 * np.abs(np.asarray(pos)).max()


def test_sharded_persistent_halo_matches_gather(mesh):
    """Persistent halo exchange (plan frozen per regroup, per-step
    fixed-index all_to_all of body rows) must match the all_gather path:
    same trajectory up to float summation order, zero overflow, finite."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.parallel.bh_shard import simulate_persistent_sharded

    n = 512
    pos, vel, mass = _cloud(n, seed=31)
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    kw = dict(
        mesh=mesh, resort_every=2, G=G, softening_sq=EPS2, theta=0.5,
        group_size=128,
    )
    p_h, v_h = simulate_persistent_sharded(
        bodies, 4, 1e-3, halo=True, halo_cap=4096, **kw
    )
    p_g, v_g = simulate_persistent_sharded(bodies, 4, 1e-3, halo=False, **kw)
    got, want = np.asarray(p_h)[:n], np.asarray(p_g)[:n]
    assert np.isfinite(got).all()
    dp = np.abs(got - want).max()
    # identical sources in a different near-field memory order: only
    # summation-order float noise integrated over 4 steps
    assert dp < 1e-5, dp
    dv = np.abs(np.asarray(v_h)[:n] - np.asarray(v_g)[:n]).max()
    assert dv < 1e-4, dv


def test_sharded_persistent_halo_overflow_raises(mesh):
    """An undersized persistent halo capacity must raise the prescriptive
    CapacityError at init, never run with an aliased plan."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.ops.barneshut import CapacityError
    from nbody_tpu.parallel.bh_shard import simulate_persistent_sharded

    # 2048 bodies / 8 chips = ~256 occupied slots per chip; at theta=0.5
    # on a compact cloud nearly every remote cell is stageable, so the
    # per-(dst, src) halo union exceeds the minimum 128-slot capacity
    n = 2048
    pos, vel, mass = _cloud(n, seed=37)
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    with pytest.raises(CapacityError, match="--halo-cap"):
        simulate_persistent_sharded(
            bodies, 2, 1e-3, mesh=mesh, resort_every=2, halo=True,
            halo_cap=128, G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        )


def test_sharded_persistent_halo_violation_poisons(mesh):
    """Bodies drifting past the planned padded AABB (drift guard disabled,
    zero pad) must NaN-poison the forces in-graph, and the driver must
    translate the poison into the prescriptive CapacityError — violations
    are never silent."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.ops.barneshut import CapacityError
    from nbody_tpu.parallel.bh_shard import simulate_persistent_sharded

    n = 512
    pos, vel, mass = _cloud(n, seed=41)
    vel = vel * 50.0  # crosses many terminal cells per 4-step chunk
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    with pytest.raises(CapacityError, match="halo"):
        simulate_persistent_sharded(
            bodies, 4, 1e-2, mesh=mesh, resort_every=4, max_drift_frac=0.0,
            halo=True, halo_cap=4096, halo_pad_frac=0.0,
            G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        )


def test_sharded_persistent_halo_source_drift_poisons(mesh):
    """SOURCE side of the halo premise (ADVICE r3 medium): a body moving
    more than halo_pad_frac/2 terminal cells since the regroup erodes the
    frozen flags' far guarantee (the cell COM it belonged to no longer
    sits in its cell box) even while the body stays INSIDE its own chip's
    padded AABB — the dst-side box check alone would pass.  The exact
    in-graph displacement check must poison and the driver must raise."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.ops.barneshut import CapacityError
    from nbody_tpu.parallel.bh_shard import simulate_persistent_sharded

    n = 512
    pos, vel, mass = _cloud(n, seed=43)
    # fast body buried inside its octant: cloud spans +-2 (border ~4,
    # ld=2, cell width ~1, pad/2 = 0.25); it moves 0.4 in 2 steps —
    # past pad/2 but still well inside its chip's ~2-wide padded AABB
    pos = pos.at[3].set(jnp.full((3,), 0.05, jnp.float32))
    vel = vel.at[3].set(jnp.asarray([200.0, 0.0, 0.0], jnp.float32))
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    with pytest.raises(CapacityError, match="halo"):
        simulate_persistent_sharded(
            bodies, 2, 1e-3, mesh=mesh, resort_every=2, max_drift_frac=0.0,
            halo=True, halo_cap=4096, halo_pad_frac=0.5,
            G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        )


def test_sharded_persistent_adaptive_matches_unsharded(mesh):
    """Adaptive global dt on the sharded persistent layout: the pmax'd
    |a|_max gives every chip the identical traced dt, so the run must
    take the same step SEQUENCE as the unsharded persistent adaptive
    path and land on the same trajectory (f32 op-order noise only)."""
    from nbody_tpu.core.types import Bodies
    from nbody_tpu.ops.bh_persistent import simulate_persistent_adaptive
    from nbody_tpu.parallel.bh_shard import simulate_persistent_sharded

    n = 512
    pos, vel, mass = _cloud(n, seed=23)
    t_end = 6e-3
    eta, dt_max = 0.05, 2e-3

    p_u, v_u, taken_u = simulate_persistent_adaptive(
        pos, vel, mass, 0.0, t_end,
        G=G, softening_sq=EPS2, theta=0.5, eta=eta, dt_max=dt_max,
        group_size=128, resort_every=2, interpret=True,
    )
    bodies = shard_bodies(Bodies(pos, vel, mass), mesh=mesh)
    p_s, v_s, taken_s = simulate_persistent_sharded(
        bodies, 0, dt_max, mesh=mesh, resort_every=2,
        G=G, softening_sq=EPS2, theta=0.5, group_size=128,
        adaptive_eta=eta, t_start=0.0, t_end=t_end,
    )
    assert taken_s == taken_u, (taken_s, taken_u)
    dp = np.abs(np.asarray(p_s)[:n] - np.asarray(p_u)).max()
    assert dp < 5e-5, dp
    dv = np.abs(np.asarray(v_s)[:n] - np.asarray(v_u)).max()
    assert np.isfinite(dv) and dv < 2e-3
