"""Vectorized group-based theta-gated octree traversal.

The reference traverses per body: serial recursion
(serial/barnes-hut.c:389-441) and, on the GPU, a warp-cooperative walk in
which 32 bodies share one stack and a node is accepted only if the whole
warp votes to accept (`__all_sync` theta vote, cuda/barnes-hut.cu:580-621)
after spatially sorting bodies so warp neighbors need similar paths
(:459-488).  That warp relaxation is the key precedent: accepting a node
for a *group* of nearby bodies — using the group's worst-case distance —
trades extra exact computation for divergence-free execution.

Here the "warp" becomes a Morton group of `group_size` bodies and the
traversal becomes a breadth-first level sweep with dense fixed-shape
frontiers.  For each level d and each frontier node:

  far   theta^2 * dist2(group_box, node_com) > border_d^2
        -> emit the node's (COM, G*mass) as one point source
           (the reference criterion border/dist < theta,
            serial/barnes-hut.c:405, with dist the *minimum* distance from
            the group's AABB — strictly more conservative than any member
            body's own distance, exactly like the warp's all-vote)
  near  node has count <= leaf_cap bodies
        -> emit the node's *bodies* (exact: bodies are points, so this is
           more accurate than the reference, which theta-approximates any
           node it accepts).  Bodies of a node are contiguous in Morton
           order, so only (start, count) is recorded during the sweep and
           one batched gather materializes all near-field sources at the
           end.
  else  -> expand into children for level d+1.

The leaf_cap rule is what keeps the frontier small: without it, every
occupied cell inside the group's own bounding box fails the MAC and must
be expanded to single-body depth, and the frontier degenerates to O(bodies
near the group).  Capping turns that near-field tail into direct body-body
interactions — the same exact/approximate split as the reference's
"leaf -> calculate directly" rule (serial/barnes-hut.c:405), generalized
from 1 body to leaf_cap bodies.

Every step is a gather / compare / cumsum-compact — no recursion, no
data-dependent shapes.  Overflow of any fixed capacity is reported in
TraverseStats so callers can fail fast and retry larger (the analog of the
reference's node-pool exhaustion abort, openmp/barnes-hut.c:158-160).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nbody_tpu.ops.bh_tree import TreeLevel


class TraverseStats(NamedTuple):
    max_list_needed: jax.Array  # i32: max total sources any group needs
    max_frontier_needed: jax.Array  # i32: widest frontier any group hit
    max_ranges_needed: jax.Array  # i32: most near-field ranges any group hit
    terminal_com_bodies: jax.Array  # i32: bodies COM-merged in over-full
    #     terminal cells (per group, worst case) — an accuracy residual,
    #     nonzero only for clusters denser than the terminal resolution


def _exclusive_cumsum(x: jax.Array, axis: int) -> jax.Array:
    c = jnp.cumsum(x, axis=axis)
    return c - x


def traverse(
    levels: list[TreeLevel],
    border0: jax.Array,
    group_lo: jax.Array,
    group_hi: jax.Array,
    pos_sorted: jax.Array,
    gm_sorted: jax.Array,
    *,
    G_const: float,
    theta: float,
    leaf_cap: int,
    frontier_size: int,
    range_size: int,
    list_size: int,
) -> tuple[jax.Array, jax.Array, TraverseStats]:
    """Build per-group source lists (far COMs + exact near bodies).

    Returns (lists, lengths, stats): lists is (G, 4, M) rows
    [x, y, z, Gm] with zero-Gm padding (inert in the force kernel),
    lengths (G,) i32.
    """
    n = pos_sorted.shape[0]
    n_groups = group_lo.shape[0]
    F = frontier_size
    R = range_size
    M = list_size
    cap = leaf_cap
    depth = len(levels) - 1
    dtype = pos_sorted.dtype

    g_rows_f = jax.lax.broadcasted_iota(jnp.int32, (n_groups, F), 0)
    g_rows_c = jax.lax.broadcasted_iota(jnp.int32, (n_groups, F * 8), 0)
    theta_sq = jnp.asarray(theta * theta, dtype)

    lists = jnp.zeros((n_groups, 4, M), dtype)
    total_len = jnp.zeros((n_groups,), jnp.int32)  # COM + body entries
    range_start = jnp.zeros((n_groups, R), jnp.int32)
    range_count = jnp.zeros((n_groups, R), jnp.int32)
    range_len = jnp.zeros((n_groups,), jnp.int32)
    need_ranges = jnp.zeros((n_groups,), jnp.int32)
    need_frontier = jnp.zeros((), jnp.int32)

    frontier = jnp.full((n_groups, F), -1, jnp.int32)
    frontier = frontier.at[:, 0].set(0)  # the root
    term_res = jnp.zeros((n_groups,), jnp.int32)

    for d, lvl in enumerate(levels):
        border_d = border0 / jnp.asarray(2.0**d, dtype)
        ids = frontier
        valid = ids >= 0
        idc = jnp.clip(ids, 0, lvl.capacity - 1)

        com = lvl.com[idc]  # (G, F, 3)
        m = lvl.mass[idc]  # (G, F)
        cnt = jnp.where(valid, lvl.count[idc], 0)
        start = lvl.start[idc]

        # min distance^2 from the group's AABB to the node COM
        dvec = com - jnp.clip(com, group_lo[:, None, :], group_hi[:, None, :])
        dist2 = jnp.sum(dvec * dvec, axis=-1)  # (G, F)

        far = (cnt > 0) & (theta_sq * dist2 > border_d * border_d)
        near = (cnt > 0) & ~far & ((cnt <= cap) | (d == depth))
        # terminal over-full cells (> leaf_cap bodies at max depth) fall
        # back to their COM — the tiny residual approximation.
        take_com = far | (near & (cnt > cap))
        take_body = near & (cnt <= cap)
        expand = (cnt > 0) & ~take_com & ~take_body
        term_res = term_res + jnp.sum(
            jnp.where(near & (cnt > cap), cnt, 0), axis=1
        )

        # ---- emit far/terminal COM entries ------------------------------
        dest = total_len[:, None] + _exclusive_cumsum(
            take_com.astype(jnp.int32), axis=1
        )
        dest = jnp.where(take_com & (dest < M), dest, M)  # M -> dropped
        vals = jnp.concatenate(
            [com, (jnp.asarray(G_const, dtype) * m)[..., None]], axis=-1
        )  # (G, F, 4)
        lists = lists.at[
            g_rows_f[:, None, :],
            jnp.arange(4)[None, :, None],
            dest[:, None, :],
        ].set(jnp.swapaxes(vals, 1, 2), mode="drop")
        total_len = total_len + jnp.sum(take_com.astype(jnp.int32), axis=1)

        # ---- record near-field body ranges ------------------------------
        rdest = range_len[:, None] + _exclusive_cumsum(
            take_body.astype(jnp.int32), axis=1
        )
        rdest = jnp.where(take_body & (rdest < R), rdest, R)
        range_start = range_start.at[g_rows_f, rdest].set(start, mode="drop")
        range_count = range_count.at[g_rows_f, rdest].set(cnt, mode="drop")
        n_ranges = jnp.sum(take_body.astype(jnp.int32), axis=1)
        need_ranges = need_ranges + n_ranges
        range_len = jnp.minimum(range_len + n_ranges, R)

        # ---- expand into the next frontier ------------------------------
        if d < depth:
            cs = lvl.child_start[idc]  # (G, F)
            cc = jnp.where(expand, lvl.child_count[idc], 0)
            offs = jnp.arange(8, dtype=jnp.int32)[None, None, :]
            child_ids = cs[..., None] + offs  # (G, F, 8)
            child_valid = offs < cc[..., None]
            flat_ids = child_ids.reshape(n_groups, F * 8)
            flat_valid = child_valid.reshape(n_groups, F * 8)
            fdest = _exclusive_cumsum(flat_valid.astype(jnp.int32), axis=1)
            n_children = jnp.sum(flat_valid.astype(jnp.int32), axis=1)
            need_frontier = jnp.maximum(need_frontier, jnp.max(n_children))
            fdest = jnp.where(flat_valid & (fdest < F), fdest, F)
            frontier = jnp.full((n_groups, F), -1, jnp.int32)
            frontier = frontier.at[g_rows_c, fdest].set(flat_ids, mode="drop")

    # ---- materialize near-field bodies with one batched gather ----------
    offs = jnp.arange(cap, dtype=jnp.int32)[None, None, :]  # (1, 1, C)
    bidx = jnp.clip(range_start[..., None] + offs, 0, n - 1)  # (G, R, C)
    bvalid = offs < range_count[..., None]
    base = total_len[:, None] + _exclusive_cumsum(range_count, axis=1)  # (G, R)
    bdest = base[..., None] + offs
    bdest = jnp.where(bvalid & (bdest < M), bdest, M)

    bpos = pos_sorted[bidx.reshape(n_groups, -1)]  # (G, R*C, 3)
    bgm = gm_sorted[bidx.reshape(n_groups, -1)]  # (G, R*C)
    bvals = jnp.concatenate([bpos, bgm[..., None]], axis=-1)  # (G, R*C, 4)
    g_rows_b = jax.lax.broadcasted_iota(jnp.int32, (n_groups, R * cap), 0)
    lists = lists.at[
        g_rows_b[:, None, :],
        jnp.arange(4)[None, :, None],
        bdest.reshape(n_groups, 1, -1),
    ].set(jnp.swapaxes(bvals, 1, 2), mode="drop")

    body_total = jnp.sum(range_count, axis=1)
    need_len = total_len + body_total
    lengths = jnp.minimum(need_len, M)

    stats = TraverseStats(
        max_list_needed=jnp.max(need_len),
        max_frontier_needed=need_frontier,
        max_ranges_needed=jnp.max(need_ranges),
        terminal_com_bodies=jnp.max(term_res),
    )
    return lists, lengths, stats
