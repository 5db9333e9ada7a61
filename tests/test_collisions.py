"""Inelastic merging (ops/collisions.py) — conservation and mechanics.

Contract: mass and momentum conserved exactly per pass; absorbed bodies
become zero-mass ghosts (the framework's inert-body convention) riding
at the merged COM; kinetic energy may only drop (perfectly inelastic).
"""

import jax.numpy as jnp
import pytest
import numpy as np

from nbody_tpu.core.types import Bodies
from nbody_tpu.ops.collisions import merge_pass, simulate_merging
from nbody_tpu.ops.exhaustive import exhaustive_accelerations


def test_two_body_merge_conserves():
    pos = jnp.asarray([[0.0, 0, 0], [0.05, 0, 0], [5.0, 5, 5]], jnp.float32)
    vel = jnp.asarray([[1.0, 0, 0], [-1.0, 0, 0], [0.1, 0, 0]], jnp.float32)
    mass = jnp.asarray([2.0, 1.0, 3.0], jnp.float32)
    p, v, m, nm = merge_pass(pos, vel, mass, 0.1)
    assert int(nm) == 1
    m = np.asarray(m)
    assert np.allclose(m, [3.0, 0.0, 3.0])
    # momentum of the pair: 2*1 + 1*(-1) = 1 -> v_merged = 1/3
    v = np.asarray(v)
    assert np.allclose(v[0], [1 / 3, 0, 0], atol=1e-6)
    # COM position: (2*0 + 1*0.05)/3
    p = np.asarray(p)
    assert np.allclose(p[0], [0.05 / 3, 0, 0], atol=1e-6)
    # ghost rides at the merged COM state
    assert np.allclose(p[1], p[0]) and np.allclose(v[1], v[0])
    # bystander untouched
    assert np.allclose(p[2], [5, 5, 5]) and np.allclose(v[2], [0.1, 0, 0])


def test_chain_merges_to_one_root():
    """Five bodies in mutual contact collapse to index 0 in one pass
    (pointer jumping resolves the chain)."""
    n = 5
    pos = jnp.asarray(
        [[0.01 * i, 0, 0] for i in range(n)] + [[9.0, 9, 9]], jnp.float32
    )
    vel = jnp.zeros((n + 1, 3), jnp.float32)
    mass = jnp.ones(n + 1, jnp.float32)
    p, v, m, nm = merge_pass(pos, vel, mass, 0.2)
    m = np.asarray(m)
    assert int(nm) == n - 1
    assert m[0] == n and np.all(m[1:n] == 0) and m[n] == 1


def test_conservation_random():
    rng = np.random.default_rng(0)
    n = 200
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.1, 1, n), jnp.float32)
    p, v, m, nm = merge_pass(pos, vel, mass, 0.15)
    assert int(nm) > 0  # dense enough to collide
    m_np, v_np = np.asarray(m, np.float64), np.asarray(v, np.float64)
    mass_np, vel_np = np.asarray(mass, np.float64), np.asarray(vel, np.float64)
    assert abs(m_np.sum() - mass_np.sum()) < 1e-4
    assert np.abs(
        (m_np[:, None] * v_np).sum(0) - (mass_np[:, None] * vel_np).sum(0)
    ).max() < 1e-4
    # inelastic: KE may only drop
    ke0 = 0.5 * (mass_np * (vel_np**2).sum(1)).sum()
    ke1 = 0.5 * (m_np * (np.asarray(v, np.float64) ** 2).sum(1)).sum()
    assert ke1 <= ke0 + 1e-6


def test_ghosts_never_remerge():
    pos = jnp.asarray([[0.0, 0, 0], [0.05, 0, 0]], jnp.float32)
    vel = jnp.zeros((2, 3), jnp.float32)
    mass = jnp.asarray([1.0, 0.0], jnp.float32)  # body 1 already a ghost
    p, v, m, nm = merge_pass(pos, vel, mass, 0.1)
    assert int(nm) == 0
    assert np.allclose(np.asarray(p), np.asarray(pos))  # ghost kept state


def test_simulate_merging_head_on():
    """Two heavy bodies launched at each other merge mid-run; total mass
    and momentum survive the full scan."""
    pos = jnp.asarray([[-1.0, 0, 0], [1.0, 0, 0]], jnp.float32)
    vel = jnp.asarray([[2.0, 0, 0], [-2.0, 0, 0]], jnp.float32)
    mass = jnp.asarray([1.0, 1.0], jnp.float32)
    force = lambda p, m: exhaustive_accelerations(p, m, G=1.0)
    # radius must cover the relative displacement between merge checks
    # (~0.04/step closing) or the pair can tunnel through contact
    out, acc, merged = simulate_merging(
        Bodies(pos, vel, mass), 200, 0.01, force, radius=0.2, merge_every=1
    )
    assert int(merged) == 1
    m = np.asarray(out.mass)
    assert np.allclose(sorted(m), [0.0, 2.0])
    # equal and opposite momenta -> merged body nearly at rest
    v = np.asarray(out.vel)[np.argmax(m)]
    assert np.abs(v).max() < 1e-3, v


def test_no_merge_matches_plain_leapfrog():
    """radius tiny -> the merging scan must be step-for-step identical
    to the plain KDK scan."""
    from nbody_tpu.integrate.leapfrog import leapfrog_steps

    rng = np.random.default_rng(1)
    n = 64
    b = Bodies(
        pos=jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32),
        vel=jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32),
        mass=jnp.asarray(rng.uniform(0.1, 1, n), jnp.float32),
    )
    force = lambda p, m: exhaustive_accelerations(p, m, G=1.0)
    want, _ = leapfrog_steps(b, 20, 1e-3, force)
    got, _, merged = simulate_merging(
        b, 20, 1e-3, force, radius=1e-9, merge_every=4
    )
    assert int(merged) == 0
    # same math, different XLA fusion layout -> float-noise-tight, not
    # bitwise
    assert np.allclose(np.asarray(want.pos), np.asarray(got.pos),
                       rtol=0, atol=1e-6)
    assert np.allclose(np.asarray(want.vel), np.asarray(got.vel),
                       rtol=0, atol=1e-6)


def test_cli_merge_flag(tmp_path):
    import subprocess
    import sys as _sys

    out = tmp_path / "out.csv"
    r = subprocess.run(
        [_sys.executable, "-m", "nbody_tpu", "tests/data/10_bodies.csv",
         "0", "2", "0.1", str(out), "--backend", "jnp",
         "--algo", "exhaustive", "--merge-radius", "5.0"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "Merged bodies:" in r.stdout
    # sharded runs reject the flag instead of silently ignoring it
    r = subprocess.run(
        [_sys.executable, "-m", "nbody_tpu", "tests/data/10_bodies.csv",
         "0", "1", "0.1", str(out), "--backend", "jnp", "--shard",
         "--algo", "exhaustive", "--merge-radius", "5.0"],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "unsharded" in r.stderr


@pytest.mark.heavy  # interpret-mode fused kernel compile
def test_cli_merge_with_persistent_layout(tmp_path):
    """--merge-radius composed with --resort-every (the persistent
    Morton layout; VERDICT r4 item 6): the run merges, reports, and
    writes the merged masses to the output CSV."""
    import subprocess
    import sys as _sys

    out = tmp_path / "out.csv"
    r = subprocess.run(
        [_sys.executable, "-m", "nbody_tpu", "tests/data/10_bodies.csv",
         "0", "0.002", "0.001", str(out), "--algo", "barnes-hut",
         "--bh-traversal", "fused", "--bh-group-size", "128",
         "--resort-every", "2", "--merge-radius", "5.0"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "Merged bodies:" in r.stdout
    k = int(r.stdout.split("Merged bodies:")[1].split()[0])
    assert k > 0
    # trajectory rows are headerless `id,x,y,z,mass`; the last frame's
    # mass column must reflect the merges (mass_update plumbing)
    rows = [ln.split(",") for ln in open(out) if ln.strip()]
    last = rows[-10:]  # 10 bodies per frame
    assert sum(1 for r_ in last if float(r_[4]) == 0.0) == k
    first = rows[:10]  # initial frame precedes any merge
    assert all(float(r_[4]) > 0.0 for r_ in first)
