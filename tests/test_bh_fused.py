"""Fused Pallas traverse+evaluate kernel (nbody_tpu.ops.bh_fused).

Runs in Pallas interpreter mode on the forced-CPU mesh — the same kernel
code the TPU compiles, checked against fp64 direct summation.  Keep N
small: interpreter-mode while-loops execute pop-by-pop.
"""

import numpy as np

from tests.oracle import accel_exhaustive_f64
import jax.numpy as jnp
import pytest

from nbody_tpu.ops.bh_fused import auto_ld, barneshut_fused

pytestmark = pytest.mark.heavy  # interpret-mode kernels: quick tier skips

EPS2 = 0.01
G = 1.0


def _direct(pos, mass):
    # EPS2/G here match tests.oracle's module constants (0.01 / 1.0)
    return accel_exhaustive_f64(pos, mass, G=G)


def _run(pos, mass, **kw):
    acc, stats = barneshut_fused(
        pos,
        mass,
        G=G,
        softening_sq=EPS2,
        theta=0.5,
        interpret=True,
        return_stats=True,
        **kw,
    )
    assert int(stats["frontier_overflow"]) == 0
    assert int(stats["trimmed_groups"]) == 0
    return np.asarray(acc), stats


def test_fused_uniform_parity():
    rng = np.random.default_rng(3)
    n = 384
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.1, 1.0, n), jnp.float32)
    acc, stats = _run(pos, mass, group_size=128)
    want = _direct(pos, mass)
    err = np.abs(acc - want).max() / np.abs(want).max()
    assert err < 0.02, err
    # every body is accounted for exactly once: near + COM coverage
    assert int(stats["near_bodies"]) > 0


def test_fused_clustered_exact():
    """A dense cluster (all bodies inside one deep cell) plus far outliers:
    the fused kernel ships cluster bodies exactly (no terminal-COM merge,
    the role of the reference's unbounded leaf split,
    serial/barnes-hut.c:206-245), so forces match direct summation at
    theta accuracy even where the old flat path reported a residual."""
    rng = np.random.default_rng(7)
    n_core, n_out = 300, 20
    core = rng.normal(0, 1e-4, (n_core, 3))  # far below any cell size
    outliers = rng.uniform(-1, 1, (n_out, 3)) * 50.0
    pos = jnp.asarray(np.vstack([core, outliers]), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.1, 1.0, n_core + n_out), jnp.float32)
    acc, _ = _run(pos, mass, group_size=128)
    want = _direct(pos, mass)
    err = np.abs(acc - want).max() / np.abs(want).max()
    assert err < 0.02, err


def test_fused_plummer_exact_forces():
    """Plummer sphere (the VERDICT round-1 gap): tails put outliers at
    100+ scale radii, stretching the Morton domain until deep cells exceed
    the core size.  The flat path COM-merges over-full terminal cells and
    *reports* the residual; the fused kernel ships those bodies exactly,
    so this asserts accurate forces unconditionally — no reported-residual
    escape hatch (serial/barnes-hut.c:206-245 is the reference analog)."""
    from nbody_tpu.utils.fixtures import plummer_cloud

    arr = plummer_cloud(700, seed=9)
    pos = jnp.asarray(arr[:, :3], jnp.float32)
    mass = jnp.asarray(arr[:, 6], jnp.float32)
    acc, stats = _run(pos, mass, group_size=128)
    want = _direct(pos, mass)
    err = np.abs(acc - want).max() / np.abs(want).max()
    assert err < 0.02, err


def test_fused_two_groups_and_padding():
    """N spanning several non-full groups: pad-slot duplicates must be
    dropped on the scatter-back and empty groups skipped."""
    rng = np.random.default_rng(11)
    n = 300  # group_size 128 -> partial groups
    pos = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.1, 1.0, n), jnp.float32)
    acc, _ = _run(pos, mass, group_size=128, burst_rows=4)
    want = _direct(pos, mass)
    err = np.abs(acc - want).max() / np.abs(want).max()
    assert err < 0.02, err


def test_auto_ld():
    assert auto_ld(100) == 2
    assert auto_ld(100_000) == 5
    assert auto_ld(1_000_000) == 6
    assert auto_ld(20_000_000) == 6
