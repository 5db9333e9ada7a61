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
  the memory hierarchy (HBM->VMEM becomes ICI->HBM) — or, above
  RING_THRESHOLD, streams it shard-by-shard around a `ppermute` ring;
* on a 2-D (pi, pj) mesh (mesh.make_mesh2d), `shard_force_fn2d` tiles the
  interaction matrix into (row group) x (column group) blocks so per-chip
  j-side memory and traffic drop to O(N/pi + N/pj), each collective
  riding one ICI torus dimension;
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
from nbody_tpu.parallel.mesh import BODY_AXIS, J_AXIS, make_mesh

# rect force signature: (pos_i, pos_all, mass_all) -> acc_i
RectForceFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


def default_rect_fn(**kw) -> RectForceFn:
    """Backend-appropriate rectangular all-pairs force."""
    if jax.default_backend() == "cpu":
        from nbody_tpu.ops.exhaustive import rect_accelerations

        return partial(rect_accelerations, **kw)
    from nbody_tpu.ops.pallas_exhaustive import pallas_rect_accelerations

    return partial(pallas_rect_accelerations, **kw)


def shard_bodies(bodies: Bodies, mesh=None, multiple: int = 1) -> Bodies:
    """Pad N to a multiple of (mesh size * multiple) and place state sharded
    on axis 0 (zero-mass padding is inert; core/types.py).  Pass
    multiple=group_size for the sharded Barnes-Hut path, which needs whole
    Morton groups per chip."""
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    bodies = bodies.pad(n_dev * multiple)
    # 2-D (BODY_AXIS, J_AXIS) meshes shard bodies over BOTH axes flattened:
    # the device at mesh position (a, b) owns global segment a * pj + b.
    ax = (
        (BODY_AXIS, J_AXIS) if J_AXIS in mesh.axis_names else BODY_AXIS
    )
    sh3 = NamedSharding(mesh, P(ax, None))
    sh1 = NamedSharding(mesh, P(ax))
    return Bodies(
        jax.device_put(bodies.pos, sh3),
        jax.device_put(bodies.vel, sh3),
        jax.device_put(bodies.mass, sh1),
    )


# Above this many bodies the all_gathered j-side (16 bytes/body planar +
# gather scratch) stops being noise next to HBM's ~16 GB; the ring keeps
# per-chip memory O(N/P) at the cost of P rectangular evals per step.
RING_THRESHOLD = 2_000_000


def shard_force_fn(
    rect_fn: Optional[RectForceFn] = None,
    mesh=None,
    axis_name: str = BODY_AXIS,
    *,
    jstream: str = "auto",
    eps2_per_body: jax.Array | None = None,
):
    """Wrap a rectangular force into a sharded (pos, mass) -> acc ForceFn.

    Inside shard_map each chip holds its i-shard and evaluates its rows of
    the interaction matrix against the full j-side, streamed one of two
    ways (SURVEY.md §5: "all_gather or ring permute for memory-bound
    sizes"):

    * ``jstream="gather"``: one all_gather materializes all N j-bodies per
      chip — minimal latency, per-chip memory O(N).
    * ``jstream="ring"``: the j-side stays sharded; P-1 `ppermute` hops
      rotate each shard around the ICI ring while every chip accumulates
      the rectangular block it currently holds — per-chip memory O(N/P),
      the TPU analog of the reference's shared-memory j-tile streaming
      loop (cuda/exhaustive.cu:303-331) lifted to the mesh level.  Each
      hop moves only 16 N/P bytes over one ICI link, and XLA overlaps the
      collective-permute with the previous block's force math.
    * ``jstream="auto"``: ring above RING_THRESHOLD bodies, gather below.

    ``eps2_per_body`` (N, unpadded) switches on symmetric-mean per-body
    softening: the eps2 array shards along i like mass, and its j-side
    rides the same exchange as the sources (gathered once, or rotated
    around the ppermute ring) — per-body softening costs one extra (N,)
    lane of traffic, nothing more.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    if rect_fn is None:
        rect_fn = default_rect_fn()
    per_body = eps2_per_body is not None

    def local(pos_l, mass_l, *rest):
        e2_l = rest[0] if per_body else None
        n = pos_l.shape[0] * n_dev
        mode = jstream
        if mode == "auto":
            mode = "ring" if n >= RING_THRESHOLD else "gather"
        ekw = lambda e2_j: (
            dict(eps2_i=e2_l, eps2_all=e2_j) if per_body else {}
        )
        if mode == "gather" or n_dev == 1:
            pos_all = lax.all_gather(pos_l, axis_name, axis=0, tiled=True)
            mass_all = lax.all_gather(mass_l, axis_name, axis=0, tiled=True)
            e2_all = (
                lax.all_gather(e2_l, axis_name, axis=0, tiled=True)
                if per_body else None
            )
            return rect_fn(pos_l, pos_all, mass_all, **ekw(e2_all))
        ring = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        pos_j, mass_j, e2_j = pos_l, mass_l, e2_l
        acc = None
        for k in range(n_dev):
            blk = rect_fn(pos_l, pos_j, mass_j, **ekw(e2_j))
            acc = blk if acc is None else acc + blk
            if k + 1 < n_dev:
                pos_j = lax.ppermute(pos_j, axis_name, ring)
                mass_j = lax.ppermute(mass_j, axis_name, ring)
                if per_body:
                    e2_j = lax.ppermute(e2_j, axis_name, ring)
        return acc

    in_specs = (P(axis_name, None), P(axis_name))
    if per_body:
        in_specs = in_specs + (P(axis_name),)
    mapped = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P(axis_name, None),
            check_vma=False,  # pallas_call outputs carry no vma annotations
        )
    )
    if not per_body:
        return mapped
    return _close_over_eps2(mapped, eps2_per_body, mesh, P(axis_name))


def _close_over_eps2(mapped, eps2_per_body, mesh, spec):
    """Wrap a shard_mapped (pos, mass, eps2) force into the framework's
    (pos, mass) ForceFn contract: the caller's state arrives padded by
    shard_bodies, so the constant eps2 array pads and places lazily at
    first call, keyed on the padded size.

    Pads get eps2 = 1, NOT 0: sharded pads live in the integrator STATE,
    and two coincident zero-mass pads with eps2 = 0 make r2 = 0 ->
    inf * (gm = 0) = NaN in the pad's own acceleration, which the next
    step's kick feeds back as a NaN source position poisoning every real
    body.  A positive pad softening keeps pad rows finite; their value
    never matters (zero-mass sources contribute exactly 0)."""
    sh = NamedSharding(mesh, spec)
    cache: dict[int, jax.Array] = {}

    def force(pos, mass, _e2=eps2_per_body):
        m = pos.shape[0]
        e2 = cache.get(m)
        if e2 is None:
            e2 = jnp.pad(
                jnp.asarray(_e2, jnp.float32), (0, m - _e2.shape[0]),
                constant_values=1.0,
            )
            e2 = cache[m] = jax.device_put(e2, sh)
        return mapped(pos, mass, e2)

    return force


def shard_force_fn2d(
    rect_fn: Optional[RectForceFn] = None,
    mesh=None,
    *,
    eps2_per_body: jax.Array | None = None,
):
    """2-D torus force decomposition: (pos, mass) sharded over a
    (BODY_AXIS, J_AXIS) mesh (mesh.make_mesh2d) -> acc, same sharding.

    The 1-D design's per-step j-side traffic is O(N) per chip (gather)
    or P sequential hops (ring).  The classic 2-D decomposition cuts
    both: partition the P = pi*pj chips into a (pi, pj) grid, bodies
    into P segments (chip (a, b) owns segment a*pj + b); chip (a, b)
    computes the force block (row group a) x (column group b), where

    * row group a  = all_gather over J_AXIS of the (a, *) chips'
      segments — contiguous global rows [a*N/pi, (a+1)*N/pi);
    * column group b = all_gather over BODY_AXIS of the (*, b) chips'
      segments — a strided 1/pj subset of all bodies (order is a fixed
      permutation; forces sum over all j regardless);
    * the (N/pi, 3) partial block reduces over J_AXIS with ONE
      psum_scatter whose b-th output chunk is exactly segment a*pj + b
      — each chip receives only its own rows.

    Per chip: memory O(N/pi + N/pj), compute O(N^2/P), and the three
    collectives each ride ONE torus dimension (the j-gather moves
    N/pi rows over the pj-ring, the i-gather N/pj rows over the
    pi-ring) — the TPU-pod mapping of the reference's j-tile streaming
    (cuda/exhaustive.cu:303-331) scaled to two ICI axes.  At pi = pj =
    sqrt(P) per-chip traffic falls from O(N) to O(N/sqrt(P)).
    """
    mesh = mesh or make_mesh()
    if J_AXIS not in mesh.axis_names:
        raise ValueError("shard_force_fn2d needs a make_mesh2d mesh")
    if rect_fn is None:
        rect_fn = default_rect_fn()
    per_body = eps2_per_body is not None

    def local(pos_l, mass_l, *rest):
        pos_i = lax.all_gather(pos_l, J_AXIS, axis=0, tiled=True)
        pos_j = lax.all_gather(pos_l, BODY_AXIS, axis=0, tiled=True)
        mass_j = lax.all_gather(mass_l, BODY_AXIS, axis=0, tiled=True)
        ekw = {}
        if per_body:
            # eps2 rides the same two gathers as the i/j position sides
            ekw = dict(
                eps2_i=lax.all_gather(rest[0], J_AXIS, axis=0, tiled=True),
                eps2_all=lax.all_gather(
                    rest[0], BODY_AXIS, axis=0, tiled=True
                ),
            )
        blk = rect_fn(pos_i, pos_j, mass_j, **ekw)  # (N/pi, 3) partials
        return lax.psum_scatter(
            blk, J_AXIS, scatter_dimension=0, tiled=True
        )

    in_specs = (P((BODY_AXIS, J_AXIS), None), P((BODY_AXIS, J_AXIS)))
    if per_body:
        in_specs = in_specs + (P((BODY_AXIS, J_AXIS)),)
    mapped = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P((BODY_AXIS, J_AXIS), None),
            check_vma=False,  # pallas_call outputs carry no vma annotations
        )
    )
    if not per_body:
        return mapped
    return _close_over_eps2(
        mapped, eps2_per_body, mesh, P((BODY_AXIS, J_AXIS))
    )


def sharded_energy2d(
    mesh=None,
    G: float = constants.BIG_G,
):
    """(pos, vel, mass) on a 2-D mesh -> (KE, PE): each chip sums the
    (row group a) x (column group b) PE block — the blocks tile the full
    N x N matrix exactly once — then psum over both axes."""
    mesh = mesh or make_mesh()
    if J_AXIS not in mesh.axis_names:
        raise ValueError("sharded_energy2d needs a make_mesh2d mesh")

    def local(pos_l, vel_l, mass_l):
        dtype = pos_l.dtype
        ke_l = 0.5 * jnp.sum(mass_l * jnp.sum(vel_l * vel_l, axis=-1))
        pos_i = lax.all_gather(pos_l, J_AXIS, axis=0, tiled=True)
        mass_i = lax.all_gather(mass_l, J_AXIS, axis=0, tiled=True)
        pos_j = lax.all_gather(pos_l, BODY_AXIS, axis=0, tiled=True)
        mass_j = lax.all_gather(mass_l, BODY_AXIS, axis=0, tiled=True)
        d = pos_j[None, :, :] - pos_i[:, None, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        inv_r = jnp.where(r > 0, 1.0 / jnp.where(r > 0, r, 1.0), 0.0)
        pe_l = jnp.sum(-mass_i[:, None] * mass_j[None, :] * inv_r)
        ke = lax.psum(lax.psum(ke_l, BODY_AXIS), J_AXIS)
        pe = lax.psum(lax.psum(pe_l, BODY_AXIS), J_AXIS)
        # both (i, j) and (j, i) appear across the block tiling: halve,
        # diagonal zero via the r == 0 guard (reference upper triangle).
        return ke.reshape(()), pe.reshape(()) * jnp.asarray(0.5 * G, dtype)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P((BODY_AXIS, J_AXIS), None),
                P((BODY_AXIS, J_AXIS), None),
                P((BODY_AXIS, J_AXIS)),
            ),
            out_specs=(P(), P()),
        )
    )


def barneshut_shard_force_fn(
    mesh=None,
    axis_name: str = BODY_AXIS,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    theta: float = constants.THETA,
    depth: int = 9,
    group_size: int = 0,
    leaf_cap: int = 0,
    frontier_size: int = 1024,
    range_size: int = 1024,
    list_size: int = 16384,
    backend: str = "auto",
    interpret: bool = False,
):
    """Sharded Barnes-Hut ForceFn: (pos, mass) sharded on axis 0 -> acc.

    DEMOTED round-1 fallback — explicit opt-in only (--bh-traversal
    flat/padded with --shard; the CLI's auto default is the
    Morton-range-sharded fused pipeline, parallel/bh_shard.py, which
    costs O(N/P + halo) memory and O(N/P) build per chip).  This path
    all_gathers positions over ICI and builds the full Morton tree
    redundantly on every chip (the analog of the reference rebuilding
    the whole tree every step, serial/barnes-hut.c:496-500), then
    traverses and evaluates only its own contiguous slice of Morton
    groups — O(N) memory and O(N log N) build per chip, an Amdahl floor
    at scale.  It remains as the only sharded route for the flat XLA
    traversal engines.  The per-chip sorted acceleration slices are
    all_gathered and scattered back to the original body order.

    Requires the sharded N to be a multiple of group_size * n_devices
    (shard_bodies + group-size-aligned padding handles this upstream).
    """
    from nbody_tpu.ops.barneshut import (
        _forces_for_groups,
        _prepare,
        auto_layout,
        effective_depth,
    )

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size

    def local(pos_l, mass_l):
        dtype = pos_l.dtype
        pos = lax.all_gather(pos_l, axis_name, axis=0, tiled=True)
        mass = lax.all_gather(mass_l, axis_name, axis=0, tiled=True)
        n = pos.shape[0]
        gs_eff, sl_eff, cap_eff = auto_layout(n, group_size, leaf_cap)
        d_eff = effective_depth(n, depth, cap_eff, gs_eff)
        d_eff = max(d_eff, sl_eff + 3)
        (_, perm, levels, border, pos_s, mass_s, group_idx, group_valid,
         pg, lo, hi) = _prepare(
            pos, mass, d_eff, gs_eff, sl_eff, groups_multiple=n_dev
        )
        gm_s = jnp.asarray(G, dtype) * mass_s
        g_per_dev = pg.shape[0] // n_dev
        k = lax.axis_index(axis_name)
        sl = lambda x: lax.dynamic_slice_in_dim(x, k * g_per_dev, g_per_dev, 0)
        acc_slice, _ = _forces_for_groups(
            levels,
            border,
            pos_s,
            gm_s,
            sl(pg),
            sl(lo),
            sl(hi),
            G=G,
            softening_sq=softening_sq,
            theta=theta,
            leaf_cap=cap_eff,
            frontier_size=frontier_size,
            range_size=range_size,
            list_size=list_size,
            backend=backend,
            interpret=interpret,
        )
        # gather every chip's group-slice accelerations, then scatter
        # (group, slot) -> sorted body -> original order, locally.
        acc_groups = lax.all_gather(acc_slice, axis_name, axis=0, tiled=True)
        dest = jnp.where(group_valid, group_idx, n)  # n -> dropped
        acc_sorted = (
            jnp.zeros((n, 3), dtype)
            .at[dest.reshape(-1)]
            .set(acc_groups.reshape(-1, 3).astype(dtype), mode="drop")
        )
        acc = jnp.zeros((n, 3), dtype).at[perm].set(acc_sorted)
        return lax.dynamic_slice_in_dim(acc, k * (n // n_dev), n // n_dev, 0)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name)),
            out_specs=P(axis_name, None),
            check_vma=False,  # pallas_call outputs carry no vma annotations
        )
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

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name, None), P(axis_name)),
            out_specs=(P(), P()),
        )
    )
