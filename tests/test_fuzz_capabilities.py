"""Property fuzz for the round-3 capabilities (merging, per-body
softening, adaptive dt).

Same philosophy as tests/test_fuzz_differential.py: fixed-seed random
configurations, each checked against invariants that must hold for ANY
input — conservation laws for merging, jnp/Pallas agreement for
per-body softening, landing/bounds for adaptive stepping.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.core.types import Bodies
from nbody_tpu.ops.collisions import merge_pass
from nbody_tpu.ops.exhaustive import exhaustive_accelerations

pytestmark = pytest.mark.heavy  # fuzz sweep: quick tier skips


@pytest.mark.parametrize("seed", range(6))
def test_merge_pass_invariants(seed):
    """Any input: exact mass/momentum conservation, KE non-increase,
    ghosts inert and parked at their root's COM, merged count equals
    the number of newly-dead bodies."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    pos = rng.uniform(-1, 1, (n, 3))
    vel = rng.uniform(-1, 1, (n, 3))
    mass = rng.uniform(0.0, 1.0, n)
    mass[rng.uniform(size=n) < 0.1] = 0.0  # pre-existing ghosts
    radius = float(rng.uniform(0.02, 0.3))

    p, v, m, nm = merge_pass(
        jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
        jnp.asarray(mass, jnp.float32), radius,
        chunk=int(rng.choice([32, 128, 512])),
    )
    p = np.asarray(p, np.float64)
    v = np.asarray(v, np.float64)
    m = np.asarray(m, np.float64)

    assert abs(m.sum() - mass.sum()) < 1e-4 * max(mass.sum(), 1)
    mom0 = (mass[:, None] * vel).sum(0)
    mom1 = (m[:, None] * v).sum(0)
    assert np.abs(mom1 - mom0).max() < 1e-4 * max(np.abs(mom0).max(), 1)
    ke0 = 0.5 * (mass * (vel**2).sum(1)).sum()
    ke1 = 0.5 * (m * (v**2).sum(1)).sum()
    assert ke1 <= ke0 + 1e-5 * max(ke0, 1)
    died = (mass > 0) & (m == 0)
    assert int(nm) == int(died.sum())
    # dead-before stays untouched
    was_dead = mass == 0
    assert np.allclose(p[was_dead], pos[was_dead], atol=1e-6)
    assert np.allclose(v[was_dead], vel[was_dead], atol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_per_body_softening_jnp_pallas_agree(seed):
    """Random shapes/eps ranges: the production Pallas kernel and the
    jnp chunked path must agree on per-body-softened forces."""
    from nbody_tpu.ops.pallas_exhaustive import pallas_accelerations

    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(100, 500))
    pos = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.05, 1, n), jnp.float32)
    e2 = jnp.asarray(10.0 ** rng.uniform(-4, -1, n), jnp.float32)
    a_jnp = exhaustive_accelerations(
        pos, mass, G=1.0, mode="chunked", chunk=64, eps2_per_body=e2
    )
    a_pl = pallas_accelerations(
        pos, mass, G=1.0, block_i=128, block_j=128, interpret=True,
        eps2_per_body=e2,
    )
    scale = float(jnp.abs(a_jnp).max())
    err = float(jnp.abs(a_jnp - a_pl).max()) / scale
    assert err < 1e-5, err


@pytest.mark.parametrize("seed", range(4))
def test_adaptive_landing_invariants(seed):
    """Random clouds and etas: time lands exactly on t_end, dt bounds
    hold, and velocities stay finite."""
    from nbody_tpu.integrate.adaptive import adaptive_steps

    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(32, 128))
    b = Bodies(
        pos=jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        vel=jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)), jnp.float32),
        mass=jnp.asarray(rng.uniform(0.05, 0.5, n), jnp.float32),
    )
    eps2 = 1e-3
    force = lambda p, m: exhaustive_accelerations(
        p, m, G=1.0, softening_sq=eps2
    )
    t_end = float(rng.uniform(0.05, 0.4))
    dt_max = float(rng.uniform(0.005, 0.05))
    eta = float(rng.uniform(0.005, 0.1))

    t = jnp.asarray(0.0, jnp.float32)
    bodies, acc = b, None
    dts_all, ts_all = [], []
    for _ in range(80):
        bodies, acc, t, (ts, dts) = adaptive_steps(
            bodies, 32, t, t_end, force,
            eta=eta, eps=math.sqrt(eps2), dt_min=0.0, dt_max=dt_max,
            acc0=acc,
        )
        ts_all.append(np.asarray(ts)); dts_all.append(np.asarray(dts))
        if float(t) >= t_end:
            break
    ts = np.concatenate(ts_all); dts = np.concatenate(dts_all)
    real = dts > 0
    assert real.any()
    assert abs(ts[real][-1] - t_end) < 1e-5
    assert (dts[real] <= dt_max * (1 + 1e-6)).all()
    assert np.isfinite(np.asarray(bodies.vel)).all()
