"""Multi-chip scaling: i-bodies sharded over a 1-D mesh.

This layer has no counterpart in the reference (single-process OpenMP or a
single CUDA device; no MPI/NCCL anywhere — SURVEY.md §2.5).  The scaling
story is re-architected for TPU ICI:

* bodies are sharded along axis 0 of pos/vel/mass over the mesh
  (the analog of OpenMP's `omp for` over i-bodies,
  openmp/exhaustive.c:166-200, and of one-thread-per-body CUDA);
* each step, every chip `all_gather`s the (pos, Gm) j-side over ICI and
  computes the rectangular force block for its local i-rows — the same
  dataflow as the CUDA shared-memory j-tile streaming, lifted one level up
  the memory hierarchy (HBM->VMEM becomes ICI->HBM);
* reductions (energy, bounding box) are `psum`/`pmax` collectives.

Kick/drift are purely elementwise, so under jit with sharded inputs XLA
runs them shard-locally with zero communication; the only per-step
collective is the j-side all_gather.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from nbody_tpu.core import constants
from nbody_tpu.core.types import Bodies
from nbody_tpu.parallel.mesh import BODY_AXIS, make_mesh

# rect force signature: (pos_i, pos_all, mass_all) -> acc_i
RectForceFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def default_rect_fn(**kw) -> RectForceFn:
    """Backend-appropriate rectangular all-pairs force."""
    if jax.default_backend() == "cpu":
        from nbody_tpu.ops.exhaustive import rect_accelerations

        return partial(rect_accelerations, **kw)
    from nbody_tpu.ops.pallas_exhaustive import pallas_rect_accelerations

    return partial(pallas_rect_accelerations, **kw)


def shard_bodies(bodies: Bodies, mesh=None) -> Bodies:
    """Pad N to a multiple of the mesh size and place state sharded on
    axis 0 (zero-mass padding is inert; core/types.py)."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    bodies = bodies.pad(n_dev)
    sh3 = NamedSharding(mesh, P(BODY_AXIS, None))
    sh1 = NamedSharding(mesh, P(BODY_AXIS))
    return Bodies(
        jax.device_put(bodies.pos, sh3),
        jax.device_put(bodies.vel, sh3),
        jax.device_put(bodies.mass, sh1),
    )


def shard_force_fn(
    rect_fn: Optional[RectForceFn] = None,
    mesh=None,
    axis_name: str = BODY_AXIS,
):
    """Wrap a rectangular force into a sharded (pos, mass) -> acc ForceFn.

    Inside shard_map each chip holds its i-shard, all_gathers the j-side
    over ICI, and evaluates its rows of the interaction matrix.
    """
    mesh = mesh or make_mesh()
    if rect_fn is None:
        rect_fn = default_rect_fn()

    def local(pos_l, mass_l):
        pos_all = lax.all_gather(pos_l, axis_name, axis=0, tiled=True)
        mass_all = lax.all_gather(mass_l, axis_name, axis=0, tiled=True)
        return rect_fn(pos_l, pos_all, mass_all)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name)),
        out_specs=P(axis_name, None),
    )


def sharded_energy(
    mesh=None,
    axis_name: str = BODY_AXIS,
    G: float = constants.BIG_G,
):
    """(pos, vel, mass) -> (KE, PE) over the mesh, reference conventions
    (common/get_energy.c:7-47): per-chip partial sums + psum over ICI."""
    mesh = mesh or make_mesh()

    def local(pos_l, vel_l, mass_l):
        dtype = pos_l.dtype
        ke_l = 0.5 * jnp.sum(mass_l * jnp.sum(vel_l * vel_l, axis=-1))
        pos_all = lax.all_gather(pos_l, axis_name, axis=0, tiled=True)
        mass_all = lax.all_gather(mass_l, axis_name, axis=0, tiled=True)
        d = pos_all[None, :, :] - pos_l[:, None, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        inv_r = jnp.where(r > 0, 1.0 / jnp.where(r > 0, r, 1.0), 0.0)
        pe_l = jnp.sum(-mass_l[:, None] * mass_all[None, :] * inv_r)
        ke = lax.psum(ke_l, axis_name)
        # full matrix counted once per (i, j) and (j, i): halve, diagonal is
        # zero via the r == 0 guard — equals the reference upper triangle.
        pe = lax.psum(pe_l, axis_name) * jnp.asarray(0.5 * G, dtype)
        return ke.reshape(()), pe.reshape(())

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name)),
        out_specs=(P(), P()),
    )
