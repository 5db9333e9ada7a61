import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from conftest import random_cloud
from nbody_tpu.ops.barneshut import (
    barneshut_accelerations,
    check_capacities,
)
from nbody_tpu.ops.bh_tree import build_tree
from nbody_tpu.ops.exhaustive import direct_accelerations
from nbody_tpu.ops.morton import bounding_border, morton_encode, morton_sort


# ---------------------------------------------------------------------------
# Morton / tree structure
# ---------------------------------------------------------------------------


def test_morton_octant_convention():
    # Bit layout must match the reference octant z*4+y*2+x
    # (serial/barnes-hut.c:114-133): at depth 1 the key IS the octant.
    pos = jnp.asarray(
        [
            [-1.0, -1.0, -1.0],  # x<0,y<0,z<0 -> 0
            [1.0, -1.0, -1.0],  # x>0 -> 1
            [-1.0, 1.0, -1.0],  # y>0 -> 2
            [1.0, 1.0, 1.0],  # -> 7
        ],
        jnp.float32,
    )
    keys = morton_encode(pos, jnp.float32(4.0), 1)
    np.testing.assert_array_equal(np.asarray(keys), [0, 1, 2, 7])


def test_tree_mass_conservation():
    arr = random_cloud(500, seed=21)
    pos = jnp.asarray(arr[:, :3], jnp.float64)
    mass = jnp.asarray(arr[:, 6], jnp.float64)
    perm, keys, border = morton_sort(pos, 6)
    levels = build_tree(pos[perm], mass[perm], keys[perm], 6)
    total = float(np.sum(arr[:, 6]))
    for d, lvl in enumerate(levels):
        assert float(jnp.sum(lvl.mass)) == pytest.approx(total, rel=1e-12), d
        assert int(jnp.sum(lvl.count)) == 500
        # mass-weighted COM of all nodes must equal the global COM
        com = np.asarray(lvl.com)
        m = np.asarray(lvl.mass)
        global_com = (arr[:, 6:7] * arr[:, :3]).sum(0) / total
        np.testing.assert_allclose(
            (m[:, None] * com).sum(0) / total, global_com, rtol=1e-10
        )


def test_tree_child_links():
    arr = random_cloud(200, seed=22)
    pos = jnp.asarray(arr[:, :3], jnp.float64)
    mass = jnp.asarray(arr[:, 6], jnp.float64)
    perm, keys, border = morton_sort(pos, 5)
    levels = build_tree(pos[perm], mass[perm], keys[perm], 5)
    for d in range(len(levels) - 1):
        parent, child = levels[d], levels[d + 1]
        pc = np.asarray(parent.count)
        cs = np.asarray(parent.child_start)
        cc = np.asarray(parent.child_count)
        child_cnt = np.asarray(child.count)
        for k in np.nonzero(pc > 0)[0]:
            # children partition the parent's bodies
            assert cc[k] >= 1
            assert child_cnt[cs[k] : cs[k] + cc[k]].sum() == pc[k]


# ---------------------------------------------------------------------------
# Forces
# ---------------------------------------------------------------------------


def _forces(n, seed, **kw):
    arr = random_cloud(n, seed=seed)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    acc = np.asarray(barneshut_accelerations(pos, mass, backend="jnp", **kw))
    a_ex = oracle.accel_exhaustive(arr[:, :3], arr[:, 6])
    return arr, acc, a_ex


def test_bh_close_to_exhaustive():
    arr, acc, a_ex = _forces(1000, 13, depth=8, group_size=64)
    scale = np.abs(a_ex).max()
    # theta=0.5 group-MAC is strictly more conservative than the
    # reference's per-body criterion, so our error bound is tighter than
    # the serial BH's own (~1%) on the same cloud.
    assert np.abs(acc - a_ex).max() / scale < 0.01


def test_bh_error_bounded_by_reference_bh():
    arr = random_cloud(600, seed=31)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    acc = np.asarray(
        barneshut_accelerations(pos, mass, backend="jnp", depth=8, group_size=64)
    )
    a_ex = oracle.accel_exhaustive(arr[:, :3], arr[:, 6])
    a_bh = oracle.accel_bh(arr[:, :3], arr[:, 6])
    scale = np.abs(a_ex).max()
    ours = np.abs(acc - a_ex).max() / scale
    ref = np.abs(a_bh - a_ex).max() / scale
    assert ours <= ref * 1.5, (ours, ref)


def test_bh_tight_theta_is_nearly_exact():
    arr, acc, a_ex = _forces(
        300, 17, theta=0.05, depth=8, group_size=32,
        frontier_size=4096, list_size=4096,
    )
    scale = np.abs(a_ex).max()
    assert np.abs(acc - a_ex).max() / scale < 2e-3


def test_bh_unaligned_n_padding():
    # N not a multiple of group_size exercises the zero-mass padding.
    arr, acc, a_ex = _forces(333, 19, depth=8, group_size=64)
    scale = np.abs(a_ex).max()
    assert acc.shape == (333, 3)
    assert np.abs(acc - a_ex).max() / scale < 0.01


def test_capacity_overflow_detected():
    arr = random_cloud(1000, seed=23)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    with pytest.raises(RuntimeError, match="capacity overflow"):
        check_capacities(
            pos, mass, backend="jnp", depth=8, group_size=64, list_size=128
        )
    # and a roomy config passes
    stats = check_capacities(
        pos, mass, backend="jnp", depth=8, group_size=64,
        frontier_size=2048, list_size=4096,
    )
    assert not stats.overflowed()


def test_pallas_evaluator_matches_jnp():
    arr = random_cloud(512, seed=29)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    a_jnp = np.asarray(
        barneshut_accelerations(pos, mass, backend="jnp", depth=7, group_size=128)
    )
    a_pl = np.asarray(
        barneshut_accelerations(
            pos, mass, backend="pallas", interpret=True, depth=7, group_size=128
        )
    )
    scale = np.abs(a_jnp).max()
    np.testing.assert_allclose(a_pl, a_jnp, atol=1e-5 * scale, rtol=1e-4)


def test_bh_trajectory_close_to_exhaustive():
    from functools import partial

    from nbody_tpu.core.types import Bodies
    from nbody_tpu.integrate.leapfrog import leapfrog_steps

    arr = random_cloud(256, seed=37)
    b = Bodies.from_numpy(arr, dtype=jnp.float32)
    bh = partial(
        barneshut_accelerations, backend="jnp", depth=8, group_size=64
    )
    out_bh, _ = leapfrog_steps(b, 20, 0.005, bh)
    out_ex, _ = leapfrog_steps(b, 20, 0.005, direct_accelerations)
    # short-horizon trajectories must stay close (theta-approx error only)
    dp = np.abs(np.asarray(out_bh.pos) - np.asarray(out_ex.pos)).max()
    scale = np.abs(np.asarray(out_ex.pos)).max()
    assert dp / scale < 5e-3, dp / scale


def test_flat_and_padded_traversals_agree():
    """The two traversals share classification criteria; flat additionally
    quantizes group boxes (outward-rounded, so its MAC is strictly MORE
    conservative).  Their outputs must agree at the sub-theta level, and
    both must sit within the theta error budget of the exact force."""
    arr = random_cloud(1500, seed=53)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    kw = dict(depth=8, group_size=64, backend="jnp")
    a_flat = np.asarray(barneshut_accelerations(pos, mass, traversal="flat", **kw))
    a_pad = np.asarray(
        barneshut_accelerations(pos, mass, traversal="padded", **kw)
    )
    a_ex = oracle.accel_exhaustive(arr[:, :3], arr[:, 6])
    scale = np.abs(a_ex).max()
    assert np.abs(a_flat - a_pad).max() / scale < 2e-3
    # conservative boxes: flat's error must not exceed padded's by much
    err_flat = np.abs(a_flat - a_ex).max() / scale
    err_pad = np.abs(a_pad - a_ex).max() / scale
    assert err_flat <= err_pad * 1.5 + 1e-4, (err_flat, err_pad)
