"""Differential fuzzing: random configurations through every traversal.

The TPU-era version of the reference's de-facto QA process (run any two
binaries on the same fixture and diff the outputs, SURVEY.md §4): each
random configuration — size, distribution shape, theta, group size — is
evaluated by the flat XLA traversal, the fused Pallas kernel (interpret
mode), and the fp64 NumPy all-pairs oracle; all three must agree within
the theta-error envelope, and the capacity stats must be clean.  Seeds
are fixed so failures reproduce.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.oracle import accel_exhaustive
from nbody_tpu.ops.barneshut import barneshut_accelerations
from nbody_tpu.ops.bh_fused import barneshut_fused

pytestmark = pytest.mark.heavy  # fuzz sweep: quick tier skips

CONFIGS = [
    # (n, shape, theta, group_size, seed)
    (257, "uniform", 0.5, 128, 0),
    (512, "clusters", 0.5, 128, 1),
    (700, "disk", 0.3, 128, 2),
    (384, "line", 0.7, 128, 3),
    (500, "shell", 0.5, 256, 4),
]


def _make(n, shape, seed):
    rng = np.random.default_rng(seed)
    if shape == "uniform":
        pos = rng.uniform(-2, 2, (n, 3))
    elif shape == "clusters":
        k = rng.integers(2, 5)
        centers = rng.uniform(-3, 3, (k, 3))
        pos = centers[rng.integers(0, k, n)] + rng.normal(0, 0.05, (n, 3))
    elif shape == "disk":
        r = np.sqrt(rng.uniform(0.01, 4.0, n))
        th = rng.uniform(0, 2 * np.pi, n)
        pos = np.stack(
            [r * np.cos(th), r * np.sin(th), rng.normal(0, 0.05, n)], axis=1
        )
    elif shape == "line":
        t = rng.uniform(-3, 3, n)
        pos = np.stack([t, 0.1 * t, rng.normal(0, 0.01, n)], axis=1)
    else:  # shell
        v = rng.normal(size=(n, 3))
        pos = 2.0 * v / np.linalg.norm(v, axis=1, keepdims=True)
        pos += rng.normal(0, 0.02, (n, 3))
    mass = rng.uniform(0.04, 1.0, n)
    return pos, mass


@pytest.mark.parametrize("n,shape,theta,gs,seed", CONFIGS)
def test_traversals_agree_with_oracle(n, shape, theta, gs, seed):
    pos_np, mass_np = _make(n, shape, seed)
    pos = jnp.asarray(pos_np, jnp.float32)
    mass = jnp.asarray(mass_np, jnp.float32)
    want = accel_exhaustive(pos_np, mass_np)
    scale = np.abs(want).max()
    # theta-error envelope: the group-AABB MAC is strictly more
    # conservative than the reference's per-body test, which empirically
    # stays well under 2% of the force scale at theta <= 0.7
    tol = 0.02 if theta <= 0.5 else 0.04

    flat, stats = barneshut_accelerations(
        pos, mass, theta=theta, return_stats=True
    )
    assert not stats.overflowed()
    err_flat = np.abs(np.asarray(flat) - want).max() / scale
    assert err_flat < tol, (shape, err_flat)

    fused, fstats = barneshut_fused(
        pos, mass, theta=theta, group_size=gs, interpret=True,
        return_stats=True,
    )
    assert int(fstats["frontier_overflow"]) == 0
    assert int(fstats["trimmed_groups"]) == 0
    err_fused = np.abs(np.asarray(fused) - want).max() / scale
    assert err_fused < tol, (shape, err_fused)


SHARD_CONFIGS = [
    # (n, shape, theta, group_size, halo, seed)
    (768, "clusters", 0.5, 64, False, 11),
    (1024, "disk", 0.5, 128, True, 12),
    (896, "shell", 0.7, 64, True, 13),
]


@pytest.mark.parametrize("n,shape,theta,gs,halo,seed", SHARD_CONFIGS)
def test_sharded_pipeline_agrees_with_oracle(n, shape, theta, gs, halo, seed):
    """Differential fuzz over the DISTRIBUTED pipeline (local sort,
    sample-sort all_to_all, psum'd build, per-chip fused traversal, with
    and without the Morton-halo exchange) on the 8-device mesh — the
    multi-chip twin of the single-device cases above."""
    import jax

    from nbody_tpu.core.types import Bodies
    from nbody_tpu.parallel.bh_shard import fused_shard_force_fn
    from nbody_tpu.parallel.mesh import make_mesh
    from nbody_tpu.parallel.sharding import shard_bodies

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(jax.devices()[:8])

    pos_np, mass_np = _make(n, shape, seed)
    want = accel_exhaustive(pos_np, mass_np)
    scale = np.abs(want).max()
    tol = 0.02 if theta <= 0.5 else 0.04

    bodies = shard_bodies(
        Bodies(
            jnp.asarray(pos_np, jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.asarray(mass_np, jnp.float32),
        ),
        mesh=mesh,
    )
    force = fused_shard_force_fn(
        mesh=mesh, theta=theta, group_size=gs, halo=halo,
        return_stats=True,
    )
    acc, stats = force(bodies.pos, bodies.mass)
    for name in ("bucket_overflow", "trimmed_groups", "frontier_overflow",
                 "halo_overflow"):
        assert int(stats[name]) == 0, (name, int(stats[name]))
    err = np.abs(np.asarray(acc)[:n] - want).max() / scale
    assert err < tol, (shape, err)
