"""2-D torus force decomposition (parallel/sharding.shard_force_fn2d)
on the virtual 8-device CPU mesh, factored as (2,4)/(4,2)/(8,1)/(1,8).

The decomposition tiles the N x N interaction matrix into (row group a)
x (column group b) blocks, one per chip; correctness means every block
tiling reproduces the single-device direct force and energy exactly (in
fp64) regardless of the mesh factorization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import random_cloud
from nbody_tpu.core.types import Bodies
from nbody_tpu.integrate.leapfrog import leapfrog_steps
from nbody_tpu.ops.exhaustive import direct_accelerations, rect_accelerations
from nbody_tpu.parallel.mesh import make_mesh2d, parse_mesh_shape
from nbody_tpu.parallel.sharding import (
    shard_bodies,
    shard_force_fn2d,
    sharded_energy2d,
)


SHAPES = [(2, 4), (4, 2), (8, 1), (1, 8)]


def _mesh(shape):
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return make_mesh2d(shape, jax.devices()[:8])


@pytest.mark.parametrize("shape", SHAPES)
def test_2d_force_matches_single_device(shape):
    mesh = _mesh(shape)
    arr = random_cloud(256, seed=11)
    pos = jnp.asarray(arr[:, :3], jnp.float64)
    mass = jnp.asarray(arr[:, 6], jnp.float64)
    want = np.asarray(direct_accelerations(pos, mass))
    b = shard_bodies(
        Bodies(pos, jnp.zeros_like(pos), mass), mesh=mesh
    )
    got = np.asarray(
        shard_force_fn2d(rect_accelerations, mesh=mesh)(b.pos, b.mass)
    )[:256]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_2d_simulation_parity(shape):
    mesh = _mesh(shape)
    arr = random_cloud(128, seed=12)
    b = Bodies.from_numpy(arr, dtype=jnp.float64)
    force = shard_force_fn2d(rect_accelerations, mesh=mesh)
    out_s, _ = leapfrog_steps(shard_bodies(b, mesh=mesh), 20, 0.01, force)
    out_r, _ = leapfrog_steps(b, 20, 0.01, direct_accelerations)
    np.testing.assert_allclose(
        np.asarray(out_s.pos)[:128], np.asarray(out_r.pos),
        rtol=1e-10, atol=1e-12,
    )


@pytest.mark.parametrize("shape", SHAPES)
def test_2d_energy_matches_reference_convention(shape):
    from nbody_tpu.diag.energy import get_energy

    mesh = _mesh(shape)
    arr = random_cloud(192, seed=13)
    b = Bodies.from_numpy(arr, dtype=jnp.float64)
    ke_w, pe_w = get_energy(b.pos, b.vel, b.mass)
    bs = shard_bodies(b, mesh=mesh)
    ke, pe = sharded_energy2d(mesh=mesh)(bs.pos, bs.vel, bs.mass)
    np.testing.assert_allclose(float(ke), float(ke_w), rtol=1e-12)
    np.testing.assert_allclose(float(pe), float(pe_w), rtol=1e-12)


def test_parse_mesh_shape():
    assert parse_mesh_shape("2x4", 8) == (2, 4)
    assert parse_mesh_shape("auto", 8) == (4, 2)  # most-square, pi >= pj
    assert parse_mesh_shape("auto", 16) == (4, 4)
    assert parse_mesh_shape("auto", 7) == (7, 1)
    with pytest.raises(ValueError, match="devices"):
        parse_mesh_shape("2x2", 8)
    with pytest.raises(ValueError, match="devices"):
        parse_mesh_shape("-2x-4", 8)
    with pytest.raises(ValueError, match="PIxPJ"):
        parse_mesh_shape("nope", 8)


def test_cli_mesh_shape_end_to_end(tmp_path):
    """--shard --mesh-shape 2x4 end-to-end: banner notes the mesh, output
    parity vs the unsharded run on the same input."""
    from nbody_tpu.cli.main import main

    arr = random_cloud(96, seed=14)
    src = tmp_path / "in.csv"
    np.savetxt(src, arr, delimiter=",", fmt="%.17g")
    out2d = tmp_path / "out2d.csv"
    out1 = tmp_path / "out1.csv"
    rc = main([str(src), "0", "0.1", "0.01", str(out2d),
               "--algo", "exhaustive", "--shard", "--mesh-shape", "2x4"])
    assert rc == 0
    rc = main([str(src), "0", "0.1", "0.01", str(out1),
               "--algo", "exhaustive"])
    assert rc == 0
    a = np.loadtxt(out2d, delimiter=",", ndmin=2)
    bref = np.loadtxt(out1, delimiter=",", ndmin=2)
    np.testing.assert_allclose(a, bref, rtol=1e-5, atol=1e-6)


def test_cli_mesh_shape_requires_sharded_exhaustive(tmp_path, capsys):
    from nbody_tpu.cli.main import main

    arr = random_cloud(32, seed=15)
    src = tmp_path / "in.csv"
    np.savetxt(src, arr, delimiter=",", fmt="%.17g")
    rc = main([str(src), "0", "0.01", "0.01", str(tmp_path / "o.csv"),
               "--algo", "exhaustive", "--mesh-shape", "2x4"])
    assert rc == 2
    assert "--mesh-shape requires" in capsys.readouterr().err
