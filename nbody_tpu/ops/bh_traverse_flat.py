"""Flat (occupancy-sized) group traversal — the TPU-fast path.

The padded traversal in nbody_tpu.ops.bh_traverse keeps a (G, F) frontier
where F must cover the *worst single group*; every level then pays
gathers/compactions on G*F padded entries even though the mean occupancy
is ~50x smaller.  On this TPU stack, multi-dimensional gathers and
lane-wise cumsum/sort/scatter are the dominant costs (measured on a v5e:
(903,8192) row-cumsum 173 ms, row-scatter 71 ms, 924k-row 8-wide gather
183 ms — vs ~27 ms for the same gather 1 element wide and ~12-34 ms for
1-D cumsum/segment ops at 100k-1M).

This module therefore keeps the frontier *flat*: one 1-D array of
(group, node) entries whose static capacity tracks per-level occupancy,
compacted with 1-D cumsum + scatter each level.  All bookkeeping is 1-D:

  1. 1-D gathers of node count/COM and group-box fields per entry
  2. classification — criteria identical to bh_traverse.traverse:
     far -> COM accept; near with <= leaf_cap bodies -> exact body accept;
     else expand (terminal over-full cells -> COM)
  3. per-group destination offsets via global exclusive cumsum minus a
     segment_min base (order-free segmented rank), 1-D scatters into the
     flattened per-group source lists
  4. near-field ranges carry their destination offset from the moment
     they are recorded, so the final body materialization is one bounded
     (flat_ranges x leaf_cap) gather with no ordering assumptions
  5. child expansion compacted by one 1-D cumsum + scatter

Outputs are identical to bh_traverse.traverse: (G, 4, M) source lists of
[x, y, z, Gm] rows, per-group lengths, and overflow stats (fail fast and
retry larger — the analog of the reference's node-pool exhaustion abort,
openmp/barnes-hut.c:158-160).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nbody_tpu.ops.bh_traverse import TraverseStats
from nbody_tpu.ops.bh_tree import TreeLevel


def _excl(x):
    return jnp.cumsum(x) - x


def _segmented_rank(weights, gid, num_segments):
    """Per-entry exclusive rank within its gid segment (any gid order):
    global exclusive cumsum minus the segment's minimum cumsum value.
    Empty segments hold INT32_MAX from segment_min, but only entries that
    belong to a (necessarily non-empty) segment ever read their base."""
    csum = _excl(weights)
    base = jax.ops.segment_min(csum, gid, num_segments=num_segments)
    return csum - jnp.take(base, jnp.clip(gid, 0, num_segments - 1), mode="clip")


def default_flat_sizes(n_groups: int, depth: int) -> tuple[int, ...]:
    """Static per-level flat-frontier capacities.

    Shallow levels are bounded by 8x the total possible node count; around
    the occupancy spike (cells holding ~leaf_cap bodies) the bound is an
    empirical ~768 entries per group; capacities shrink again for deep
    levels.  Runtime overflow is detected via TraverseStats.
    """
    sizes = []
    for d in range(depth + 1):
        # entries are (group, node) pairs: bounded by groups x nodes-at-level
        # and, around the occupancy spike, by an empirical ~384 per group
        # (with cell-aligned tight group boxes), tapering for deep levels.
        # deep levels (past the uniform-occupancy spike) only carry chains
        # through dense clusters: shrinking per-group budgets suffice
        schedule = {6: 640, 7: 128}
        per_group = min(8 ** min(d, 8), schedule.get(d, 1024 if d <= 5 else 64))
        k = n_groups * max(per_group, 1) + 8192
        # floor: with few (large) groups the per-group spread is wider
        floor = min(32_768, (n_groups + 1) * 8 ** min(d, 5))
        sizes.append(int(min(max(k, floor, 1024), 16_777_216)))
    return tuple(sizes)


def traverse_flat(
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
    list_size: int,
    range_size: int = 512,
    flat_sizes: tuple[int, ...] | None = None,
) -> tuple[jax.Array, jax.Array, TraverseStats]:
    """Flat traversal.  `range_size` here is the *average* near-field
    ranges per group (the flat range capacity is n_groups * range_size)."""
    n = pos_sorted.shape[0]
    n_groups = group_lo.shape[0]
    M = list_size
    cap = leaf_cap
    depth = len(levels) - 1
    dtype = pos_sorted.dtype
    if flat_sizes is None:
        flat_sizes = default_flat_sizes(n_groups, depth)

    theta_sq = jnp.asarray(theta * theta, dtype)
    gG = jnp.asarray(G_const, dtype)
    SENT = n_groups  # out-of-range gid sentinel: dropped by segment ops

    # --- quantize group boxes into 2 packed int32s ------------------------
    # Per-entry box gathers dominate the classify phase (6 of 11 gathered
    # fields); pack lo/hi into one i32 each (10 bits/axis over the root
    # cube, lo rounded DOWN and hi rounded UP so the dequantized box
    # contains the true box and the MAC stays conservative).  Empty groups
    # (the _FAR sentinel) are flagged in bit 30 of the lo word.
    half0 = 0.5 * border0.astype(jnp.float32)
    qcell = border0.astype(jnp.float32) / 1024.0
    inv_q = 1024.0 / border0.astype(jnp.float32)

    def _qdown(v):
        return jnp.clip(
            jnp.floor((v.astype(jnp.float32) + half0) * inv_q).astype(jnp.int32),
            0, 1023,
        )

    def _qup(v):
        # stored as (ceil - 1) in [0, 1023] so three axes fit 30 bits
        return jnp.clip(
            jnp.ceil((v.astype(jnp.float32) + half0) * inv_q).astype(jnp.int32),
            1, 1024,
        ) - 1

    empty_grp = group_lo[:, 0] > 1.0e17
    boxq_lo = (
        _qdown(group_lo[:, 0])
        | (_qdown(group_lo[:, 1]) << 10)
        | (_qdown(group_lo[:, 2]) << 20)
        | jnp.where(empty_grp, jnp.int32(1 << 30), 0)
    )
    boxq_hi = (
        _qup(group_hi[:, 0])
        | (_qup(group_hi[:, 1]) << 10)
        | (_qup(group_hi[:, 2]) << 20)
    )

    lists_flat = jnp.zeros((4, n_groups * M + 1), dtype)
    LIN_SENT = n_groups * M
    total_len = jnp.zeros((n_groups,), jnp.int32)

    flat_R = int(max(n_groups * range_size, 32_768))
    r_start = jnp.zeros((flat_R,), jnp.int32)
    r_count = jnp.zeros((flat_R,), jnp.int32)
    r_dest = jnp.full((flat_R,), LIN_SENT, jnp.int32)  # linear list offset
    r_len = jnp.zeros((), jnp.int32)
    need_ranges_tot = jnp.zeros((), jnp.int32)
    # For the flat path this tracks the worst per-level EXCESS over the
    # static capacity (0 = no overflow anywhere).
    need_frontier = jnp.zeros((), jnp.int32)
    term_res = jnp.zeros((n_groups,), jnp.int32)

    # flat frontier at level 0: every group at the root
    k0 = max(flat_sizes[0], n_groups)
    arange0 = jnp.arange(k0, dtype=jnp.int32)
    fvalid = arange0 < n_groups
    fgid = jnp.where(fvalid, arange0, SENT)
    fnid = jnp.zeros((k0,), jnp.int32)

    for d, lvl in enumerate(levels):
        border_d = border0.astype(dtype) / jnp.asarray(2.0**d, dtype)
        gid = fgid  # SENT for invalid entries
        nid = jnp.where(fvalid, fnid, 0)
        gid_c = jnp.clip(gid, 0, n_groups - 1)

        cnt = jnp.where(fvalid, jnp.take(lvl.count, nid, mode="clip"), 0)
        cx = jnp.take(lvl.com[:, 0], nid, mode="clip")
        cy = jnp.take(lvl.com[:, 1], nid, mode="clip")
        cz = jnp.take(lvl.com[:, 2], nid, mode="clip")
        blo = jnp.take(boxq_lo, gid_c, mode="clip")
        bhi = jnp.take(boxq_hi, gid_c, mode="clip")
        is_empty = (blo >> 30) & 1
        lox = ((blo & 1023).astype(jnp.float32)) * qcell - half0
        loy = (((blo >> 10) & 1023).astype(jnp.float32)) * qcell - half0
        loz = (((blo >> 20) & 1023).astype(jnp.float32)) * qcell - half0
        hix = ((bhi & 1023) + 1).astype(jnp.float32) * qcell - half0
        hiy = (((bhi >> 10) & 1023) + 1).astype(jnp.float32) * qcell - half0
        hiz = (((bhi >> 20) & 1023) + 1).astype(jnp.float32) * qcell - half0

        dx = cx - jnp.clip(cx, lox, hix)
        dy = cy - jnp.clip(cy, loy, hiy)
        dz = cz - jnp.clip(cz, loz, hiz)
        # empty groups: force an immediate far-accept of the root
        dist2 = jnp.where(
            is_empty > 0, jnp.asarray(1.0e30, dtype),
            (dx * dx + dy * dy + dz * dz).astype(dtype),
        )

        far = (cnt > 0) & (theta_sq * dist2 > border_d * border_d)
        near = (cnt > 0) & ~far & ((cnt <= cap) | (d == depth))
        take_com = far | (near & (cnt > cap))  # terminal over-full -> COM
        take_body = near & (cnt <= cap)
        expand = (cnt > 0) & ~take_com & ~take_body
        term_res = term_res + jax.ops.segment_sum(
            jnp.where(near & (cnt > cap), cnt, 0), gid, num_segments=n_groups
        )

        # ---- emit COM entries ------------------------------------------
        tc = take_com.astype(jnp.int32)
        rank = _segmented_rank(tc, gid, n_groups)
        dest = jnp.take(total_len, gid_c, mode="clip") + rank
        lin = jnp.where(take_com & (dest < M), gid_c * M + dest, LIN_SENT)
        mass_e = jnp.take(lvl.mass, nid, mode="clip")
        lists_flat = lists_flat.at[0, lin].set(cx, mode="drop")
        lists_flat = lists_flat.at[1, lin].set(cy, mode="drop")
        lists_flat = lists_flat.at[2, lin].set(cz, mode="drop")
        lists_flat = lists_flat.at[3, lin].set(
            jnp.where(take_com, gG * mass_e, 0.0).astype(dtype), mode="drop"
        )
        total_len = total_len + jax.ops.segment_sum(
            tc, gid, num_segments=n_groups
        )

        # ---- record near-field ranges with their destinations ----------
        tb_cnt = jnp.where(take_body, cnt, 0)
        rank_b = _segmented_rank(tb_cnt, gid, n_groups)
        dest_b = jnp.take(total_len, gid_c, mode="clip") + rank_b
        lin_b0 = jnp.where(
            take_body & (dest_b + tb_cnt <= M), gid_c * M + dest_b, LIN_SENT
        )
        tb = take_body.astype(jnp.int32)
        rpos = r_len + _excl(tb)
        rpos = jnp.where(take_body & (rpos < flat_R), rpos, flat_R)
        start_e = jnp.take(lvl.start, nid, mode="clip")
        r_start = r_start.at[rpos].set(start_e, mode="drop")
        r_count = r_count.at[rpos].set(tb_cnt, mode="drop")
        r_dest = r_dest.at[rpos].set(lin_b0, mode="drop")
        n_tb = jnp.sum(tb)
        need_ranges_tot = need_ranges_tot + n_tb  # total ranges recorded
        r_len = jnp.minimum(r_len + n_tb, flat_R)
        total_len = total_len + jax.ops.segment_sum(
            tb_cnt, gid, num_segments=n_groups
        )

        # ---- expand children into the next flat frontier ---------------
        if d < depth:
            k_next = flat_sizes[d + 1]
            cc = jnp.where(expand, jnp.take(lvl.child_count, nid, mode="clip"), 0)
            cs = jnp.take(lvl.child_start, nid, mode="clip")
            child_base = _excl(cc)
            n_children = jnp.sum(cc)
            need_frontier = jnp.maximum(need_frontier, n_children - k_next)
            offs8 = jnp.arange(8, dtype=jnp.int32)
            cdest = child_base[:, None] + offs8[None, :]
            cvalid = (offs8[None, :] < cc[:, None])
            cdest = jnp.where(cvalid & (cdest < k_next), cdest, k_next)
            cid = cs[:, None] + offs8[None, :]
            cgid = jnp.broadcast_to(gid[:, None], cdest.shape)
            fnid = (
                jnp.zeros((k_next + 1,), jnp.int32)
                .at[cdest.reshape(-1)]
                .set(cid.reshape(-1), mode="drop")[:k_next]
            )
            fgid_new = (
                jnp.full((k_next + 1,), SENT, jnp.int32)
                .at[cdest.reshape(-1)]
                .set(cgid.reshape(-1), mode="drop")[:k_next]
            )
            arange_n = jnp.arange(k_next, dtype=jnp.int32)
            fvalid = arange_n < jnp.minimum(n_children, k_next)
            fgid = jnp.where(fvalid, fgid_new, SENT)

    # ---- materialize near-field bodies, padding-free --------------------
    # Ragged range expansion via the cummax-rank trick: scatter each
    # range's index r at its exclusive body offset cum[r], take a running
    # max (range indices are monotone in scatter position), and every body
    # slot j then knows its owning range rid[j] and in-range offset
    # j - cum[rid].  Cost is O(total near bodies), not O(ranges * cap).
    rc = r_count
    cum = _excl(rc)
    body_total = jnp.sum(rc)
    # near-field bodies are a subset of list entries, so G * list_size is a
    # hard bound; with large (cell-scale) groups the near field is several
    # thousand bodies per group
    body_cap = int(min(max(n_groups * 5120, 1 << 19), n_groups * M, 16_777_216))
    rid0 = (
        jnp.zeros((body_cap + 1,), jnp.int32)
        .at[jnp.where(rc > 0, cum, body_cap)]
        .max(jnp.arange(flat_R, dtype=jnp.int32), mode="drop")[:body_cap]
    )
    rid = jax.lax.cummax(rid0)
    j = jnp.arange(body_cap, dtype=jnp.int32)
    jvalid = j < jnp.minimum(body_total, body_cap)
    off_in_range = j - jnp.take(cum, rid, mode="clip")
    bidx = jnp.clip(jnp.take(r_start, rid, mode="clip") + off_in_range, 0, n - 1)
    rdst = jnp.take(r_dest, rid, mode="clip")
    lin_b = jnp.where(jvalid & (rdst != LIN_SENT), rdst + off_in_range, LIN_SENT)

    lists_flat = lists_flat.at[0, lin_b].set(
        jnp.take(pos_sorted[:, 0], bidx, mode="clip"), mode="drop"
    )
    lists_flat = lists_flat.at[1, lin_b].set(
        jnp.take(pos_sorted[:, 1], bidx, mode="clip"), mode="drop"
    )
    lists_flat = lists_flat.at[2, lin_b].set(
        jnp.take(pos_sorted[:, 2], bidx, mode="clip"), mode="drop"
    )
    gm_b = jnp.where(jvalid, jnp.take(gm_sorted, bidx, mode="clip"), 0.0).astype(
        dtype
    )
    lists_flat = lists_flat.at[3, lin_b].set(gm_b, mode="drop")
    # Flat path reports EXCESS (0 = fits) in the ranges channel, covering
    # both the range store and the body store.
    ranges_excess = jnp.maximum(need_ranges_tot - flat_R, 0)
    body_excess = jnp.maximum(body_total - body_cap, 0)
    need_ranges_tot = jnp.maximum(ranges_excess, body_excess)

    lengths = jnp.minimum(total_len, M)
    lists = lists_flat[:, : n_groups * M].reshape(4, n_groups, M).transpose(1, 0, 2)

    stats = TraverseStats(
        max_list_needed=jnp.max(total_len),
        max_frontier_needed=need_frontier,
        max_ranges_needed=need_ranges_tot,
        terminal_com_bodies=jnp.max(term_res),
    )
    return lists, lengths, stats
