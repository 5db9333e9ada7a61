"""Collisional merging — perfectly inelastic body mergers (beyond the
reference, which is strictly collisionless).

TPU-shaped design: merging must not change array shapes (XLA traces
once, static shapes), so an absorbed body is not removed — it becomes a
ZERO-MASS GHOST, which the whole framework already treats as inert (the
padding convention, core/types.py): gm = 0 sources exert no force, and
segment sums ignore them.  The ghost continues from the merge point
with the center-of-mass velocity, i.e. as a massless tracer of the
merged body.

One merge pass (`merge_pass`) is fully vectorized:

  1. pair detection — chunked O(N^2) distance test (same lax.map
     blocking as ops/exhaustive.py; collisional problems are planetary-
     scale N, not 10M), live bodies only;
  2. each body points at the LOWEST-INDEX live partner within the merge
     radius (itself if none) — a union-find parent array built in one
     vector min-reduction per chunk;
  3. chains (A<-B<-C in one pass) resolve by pointer jumping:
     parent = parent[parent] iterated ceil(log2(N)) times — O(log N)
     gathers, no loops over bodies;
  4. conservation — mass and momentum scatter-add to each root
     (segment_sum); the root's new position is the mass-weighted COM.
     Mass and momentum are conserved exactly; kinetic energy drops, as
     a perfectly inelastic merger must.

`simulate_merging` runs the KDK scan with a merge pass every
`merge_every` steps, carrying mass in the scan state (it changes!) and
recomputing the force after each pass.  The CLI exposes
``--merge-radius`` / ``--merge-every``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.core import constants
from nbody_tpu.core.types import Bodies


@partial(jax.jit, static_argnames=("chunk",))
def merge_pass(pos, vel, mass, radius, *, chunk: int = 512):
    """One inelastic merge pass.

    Returns (pos, vel, mass, n_merged) with the same shapes; absorbed
    bodies have mass 0 and ride at the merged COM state.  `radius` is
    the scalar contact distance (bodies closer than this merge).
    """
    n = pos.shape[0]
    dtype = pos.dtype
    idx = jnp.arange(n, dtype=jnp.int32)
    live = mass > 0
    r2_contact = jnp.asarray(radius, dtype) ** 2

    c = min(chunk, max(8, n))
    n_pad = -(-n // c) * c
    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    # pad rows are far away AND dead, but belt-and-braces: mark them dead
    live_p = jnp.pad(live, (0, n_pad - n))
    idx_p = jnp.pad(idx, (0, n_pad - n), constant_values=n)

    def chunk_min_partner(args):
        pos_i, live_i, idx_i = args  # (C, 3), (C,), (C,)
        d = pos[None, :, :] - pos_i[:, None, :]  # (C, N, 3)
        r2 = jnp.sum(d * d, axis=-1)
        hit = (r2 < r2_contact) & live_i[:, None] & live[None, :] & (
            idx[None, :] != idx_i[:, None]
        )
        # lowest-index partner in contact; n if none
        return jnp.min(jnp.where(hit, idx[None, :], n), axis=1)

    part = lax.map(
        chunk_min_partner,
        (pos_p.reshape(-1, c, 3), live_p.reshape(-1, c), idx_p.reshape(-1, c)),
    ).reshape(n_pad)[:n]

    # parent: merge INTO the lowest index of the pair — only adopt a
    # partner with a smaller index, so every parent step strictly
    # decreases and pointer jumping terminates at the cluster's root
    parent = jnp.where(part < idx, part, idx)
    for _ in range(max(1, math.ceil(math.log2(max(n, 2))))):
        parent = parent[parent]

    # conservation: scatter mass / momentum / mass-weighted position
    new_mass = jax.ops.segment_sum(mass, parent, num_segments=n)
    mom = jax.ops.segment_sum(mass[:, None] * vel, parent, num_segments=n)
    mpos = jax.ops.segment_sum(mass[:, None] * pos, parent, num_segments=n)
    safe = jnp.maximum(new_mass, jnp.asarray(1e-30, dtype))[:, None]
    com_pos = mpos / safe
    com_vel = mom / safe

    moved = parent != idx  # absorbed bodies
    root_of = parent  # ghosts adopt their root's COM state
    out_pos = jnp.where(
        (new_mass > 0)[:, None], com_pos, com_pos[root_of]
    )
    out_vel = jnp.where(
        (new_mass > 0)[:, None], com_vel, com_vel[root_of]
    )
    # dead-before-pass bodies (mass already 0, parent self) keep their
    # state instead of a 0/eps COM artifact
    was_dead = ~live & ~moved
    out_pos = jnp.where(was_dead[:, None], pos, out_pos)
    out_vel = jnp.where(was_dead[:, None], vel, out_vel)
    n_merged = jnp.sum(moved.astype(jnp.int32)).astype(jnp.int32)
    return out_pos, out_vel, new_mass, n_merged


def simulate_merging(
    bodies: Bodies,
    n_steps: int,
    dt: float,
    force_fn,
    *,
    radius: float,
    merge_every: int = 1,
    chunk: int = 512,
    acc0=None,
    k0: int = 0,
    with_history: bool = False,
):
    """KDK leapfrog with an inelastic merge pass every `merge_every`
    steps.  Returns (Bodies, acc, total_merged) — plus the (T, N, 3)
    post-drift position history when `with_history` (the frame contract
    of leapfrog_steps).  Mass rides in the scan carry (it changes); the
    force is re-evaluated after each pass so the next kick sees the
    merged field.  `acc0`/`k0` carry force and merge phase across
    chunked calls, exactly like leapfrog_steps' acc0."""
    dtype = bodies.pos.dtype
    dt = jnp.asarray(dt, dtype)
    half = dt * 0.5
    if acc0 is None:
        acc0 = force_fn(bodies.pos, bodies.mass)

    def step(carry, k):
        pos, vel, mass, acc, merged = carry
        vel = vel + acc * half
        pos = pos + vel * dt
        out_pos = pos  # post-drift frame (reference row order)
        acc = force_fn(pos, mass)
        vel = vel + acc * half

        def do_merge(args):
            pos, vel, mass = args
            p2, v2, m2, nm = merge_pass(pos, vel, mass, radius, chunk=chunk)
            return p2, v2, m2, nm

        pos, vel, mass, nm = lax.cond(
            (k + 1) % merge_every == 0,
            do_merge,
            lambda args: (args[0], args[1], args[2], jnp.int32(0)),
            (pos, vel, mass),
        )
        # a merge changed masses/positions -> refresh the force the next
        # kick uses; runtime-branched so merge-free steps don't pay it
        acc = lax.cond(
            nm > 0, lambda a: force_fn(pos, mass), lambda a: a, acc
        )
        return (pos, vel, mass, acc, merged + nm), (
            out_pos if with_history else None
        )

    (pos, vel, mass, acc, merged), hist = lax.scan(
        step,
        (bodies.pos, bodies.vel, bodies.mass, acc0, jnp.int32(0)),
        jnp.arange(k0, k0 + n_steps, dtype=jnp.int32),
    )
    out = Bodies(pos, vel, mass)
    if with_history:
        return out, acc, merged, hist
    return out, acc, merged
