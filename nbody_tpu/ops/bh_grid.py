"""Dense-grid octree: the gather-free tree build for the Pallas traversal.

The compacted level tree (nbody_tpu.ops.bh_tree) re-runs segment
reductions over all N bodies at every level and derives child links with
1-D gathers — ~530 ms of the 1M-body force eval on a v5e (tools/
profile_bh.py), because XLA lowers each irregular op to a ~29 ns/element
scalar pass (docs/PERFORMANCE.md).

This module instead stores levels 0..Ld as COMPLETE 8^d grids, where the
node id of a cell IS its Morton prefix:

  * one segment_sum pass over bodies at level Ld only;
  * every coarser level is a dense (-1, 8) reshape-reduction — pure
    vector work, no gathers, no per-level body passes;
  * children of cell c at level d are ALWAYS cells [8c, 8c+8) at level
    d+1 — child links vanish from the data structure entirely;
  * `start` indices fall out of one exclusive cumsum over cell counts.

The reference analog of what this replaces: the pointer-insert build
(serial/barnes-hut.c:169-317) and the CUDA atomicCAS insert + spin-wait
COM sweep (cuda/barnes-hut.cu:206-451).

Cluster chains deeper than Ld (cells still holding more than leaf_cap
bodies at the terminal dense level) are handled by a compacted SUBSET
tree built only over the bodies of over-full level-Ld cells: on uniform
clouds the subset is empty and costs only fixed capacity-sized ops; on
clustered inputs it bounds the extra work by the cluster population.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nbody_tpu.ops.bh_tree import TreeLevel


def grid_offsets(ld: int) -> tuple[int, ...]:
    """Flat offsets of each dense level: OFF[d] = (8^d - 1) // 7."""
    return tuple((8**d - 1) // 7 for d in range(ld + 2))


class GridTree(NamedTuple):
    """Dense levels 0..ld concatenated (total T = (8^(ld+1) - 1) // 7).

    All arrays are (1, T) so Pallas kernels can scalar-index them as
    ref[0, t]; t = OFF[d] + morton_prefix.
    """

    cx: jax.Array  # (1, T) f32 center-of-mass x
    cy: jax.Array
    cz: jax.Array
    gm: jax.Array  # (1, T) f32 G * total mass
    cnt: jax.Array  # (1, T) i32 body count
    start: jax.Array  # (1, T) i32 first body index (sorted order)

    @property
    def total(self) -> int:
        return self.cx.shape[1]


def build_grid(
    pos_sorted: jax.Array,
    gm_sorted: jax.Array,
    keys_sorted: jax.Array,
    depth: int,
    ld: int,
) -> GridTree:
    """Build dense levels 0..ld from Morton-sorted bodies.

    gm_sorted is G * mass (the kernel emits [x y z Gm] rows directly).
    """
    n = pos_sorted.shape[0]
    k_terminal = 8**ld
    off = grid_offsets(ld)
    nid = (keys_sorted >> (3 * (depth - ld))).astype(jnp.int32)

    w = jax.ops.segment_sum(
        gm_sorted[:, None] * pos_sorted.astype(jnp.float32),
        nid,
        num_segments=k_terminal,
    )  # (K, 3)
    gm = jax.ops.segment_sum(gm_sorted, nid, num_segments=k_terminal)
    cnt = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), nid, num_segments=k_terminal
    )

    ws, gms, cnts = [w], [gm], [cnt]
    for _ in range(ld):
        ws.append(ws[-1].reshape(-1, 8, 3).sum(axis=1))
        gms.append(gms[-1].reshape(-1, 8).sum(axis=1))
        cnts.append(cnts[-1].reshape(-1, 8).sum(axis=1))
    ws.reverse(), gms.reverse(), cnts.reverse()  # level 0 first

    # start = exclusive cumsum of terminal counts; coarser = every 8th
    start_t = jnp.cumsum(cnt) - cnt
    starts = [start_t]
    for _ in range(ld):
        starts.append(starts[-1].reshape(-1, 8)[:, 0])
    starts.reverse()

    w_all = jnp.concatenate(ws, axis=0)
    gm_all = jnp.concatenate(gms, axis=0)
    cnt_all = jnp.concatenate(cnts, axis=0)
    start_all = jnp.concatenate(starts, axis=0)
    com = w_all / jnp.maximum(gm_all, 1e-30)[:, None]
    total = off[ld + 1]
    assert com.shape[0] == total

    return GridTree(
        cx=com[:, 0].reshape(1, total),
        cy=com[:, 1].reshape(1, total),
        cz=com[:, 2].reshape(1, total),
        gm=gm_all.astype(jnp.float32).reshape(1, total),
        cnt=cnt_all.reshape(1, total),
        start=start_all.astype(jnp.int32).reshape(1, total),
    )


def grid_from_terminal(w, gm, cnt, start_t, end_t, ld: int) -> GridTree:
    """Dense GridTree from terminal-level accumulators.

    `start_t`/`end_t` are first/last+1 body indices per terminal cell in
    whatever storage layout the caller evaluates from (occupancy-packed,
    chip-padded, or group-padded), with int32 INF / -1 sentinels when
    empty; coarse cells take min/max over their 8 children.  `cnt` is
    replaced in the result by the SPAN end - start, so ranges cover
    layout padding gaps — padding must carry gm = 0 (zero force) for this
    to stay exact.  Shared by the Morton-range-sharded build
    (parallel/bh_shard.py) and the persistent-order path
    (ops/bh_persistent.py)."""
    ws, gms, cnts, sts, ens = [w], [gm], [cnt], [start_t], [end_t]
    for _ in range(ld):
        ws.append(ws[-1].reshape(-1, 8, 3).sum(axis=1))
        gms.append(gms[-1].reshape(-1, 8).sum(axis=1))
        cnts.append(cnts[-1].reshape(-1, 8).sum(axis=1))
        sts.append(sts[-1].reshape(-1, 8).min(axis=1))
        ens.append(ens[-1].reshape(-1, 8).max(axis=1))
    for seq in (ws, gms, cnts, sts, ens):
        seq.reverse()

    w_all = jnp.concatenate(ws, axis=0)
    gm_all = jnp.concatenate(gms, axis=0)
    cnt_all = jnp.concatenate(cnts, axis=0)
    st_all = jnp.concatenate(sts, axis=0)
    en_all = jnp.concatenate(ens, axis=0)
    com = w_all / jnp.maximum(gm_all, 1e-30)[:, None]
    span = jnp.where(cnt_all > 0, en_all - st_all, 0)
    start = jnp.where(cnt_all > 0, st_all, 0)
    total = grid_offsets(ld)[ld + 1]
    return GridTree(
        cx=com[:, 0].reshape(1, total),
        cy=com[:, 1].reshape(1, total),
        cz=com[:, 2].reshape(1, total),
        gm=gm_all.astype(jnp.float32).reshape(1, total),
        cnt=span.astype(jnp.int32).reshape(1, total),
        start=start.astype(jnp.int32).reshape(1, total),
    )


class DeepSubset(NamedTuple):
    """Compacted levels ld+1..depth over bodies of over-full dense cells.

    levels:       TreeLevel list (as bh_tree), capacities = `cap`; `start`
                  fields index the ORIGINAL sorted body array.
    child_start:  (1, 8^ld) i32 — first level-(ld+1) subset node per dense
                  terminal cell (bridge from the dense grid into the chain)
    child_count:  (1, 8^ld) i32
    n_subset:     () i32 — bodies in over-full cells (> cap = overflow)
    """

    levels: list[TreeLevel]
    child_start: jax.Array
    child_count: jax.Array
    n_subset: jax.Array


def build_deep_subset(
    pos_sorted: jax.Array,
    gm_sorted: jax.Array,
    keys_sorted: jax.Array,
    depth: int,
    ld: int,
    leaf_cap: int,
    cap: int,
) -> DeepSubset:
    """Build the cluster-chain subtree below the dense grid.

    Only bodies whose terminal dense cell holds more than leaf_cap bodies
    participate; everything is capacity-bounded by `cap` (uniform clouds:
    zero occupancy, fixed small cost).  The reference resolves such
    chains with its unbounded leaf split (serial/barnes-hut.c:206-245).
    """
    n = pos_sorted.shape[0]
    k_terminal = 8**ld
    nid = (keys_sorted >> (3 * (depth - ld))).astype(jnp.int32)
    cnt_t = jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), nid, num_segments=k_terminal
    )
    overfull = jnp.take(cnt_t, nid) > leaf_cap  # (N,) per body

    slot = jnp.cumsum(overfull.astype(jnp.int32)) - overfull
    n_subset = jnp.sum(overfull.astype(jnp.int32))
    dst = jnp.where(overfull & (slot < cap), slot, cap)

    def compact(x, fill=0):
        shape = (cap + 1,) + x.shape[1:]
        return jnp.full(shape, fill, x.dtype).at[dst].set(x, mode="drop")[:cap]

    # Subset arrays; padding keys = all-ones so pad bodies form their own
    # trailing pseudo-node that no real chain ever reaches (cnt fields of
    # real nodes exclude them because segment ids differ).
    pad_key = jnp.int32((1 << 30) - 1)
    s_keys = compact(keys_sorted, fill=pad_key)
    s_pos = compact(pos_sorted.astype(jnp.float32))
    s_gm = compact(gm_sorted.astype(jnp.float32))
    s_orig = compact(jnp.arange(n, dtype=jnp.int32), fill=n)
    s_nid_t = compact(nid, fill=k_terminal)  # dense terminal cell per body
    valid = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(n_subset, cap)

    wpos = s_gm[:, None] * s_pos
    idx = jnp.arange(cap, dtype=jnp.int32)

    levels: list[TreeLevel] = []
    node_ids: list[jax.Array] = []
    for d in range(ld + 1, depth + 1):
        prefix = s_keys >> (3 * (depth - d))
        newseg = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), (prefix[1:] != prefix[:-1]).astype(jnp.int32)]
        )
        nid_d = jnp.cumsum(newseg) - 1
        node_ids.append(nid_d)

    for i, d in enumerate(range(ld + 1, depth + 1)):
        nid_d = node_ids[i]
        ones = jnp.where(valid, 1, 0)
        m = jax.ops.segment_sum(jnp.where(valid, s_gm, 0.0), nid_d, num_segments=cap)
        w = jax.ops.segment_sum(
            jnp.where(valid[:, None], wpos, 0.0), nid_d, num_segments=cap
        )
        cnt = jax.ops.segment_sum(ones, nid_d, num_segments=cap)
        com = w / jnp.maximum(m, 1e-30)[:, None]
        start = jax.ops.segment_min(
            jnp.where(valid, s_orig, n), nid_d, num_segments=cap
        )
        start = jnp.where(cnt > 0, start, 0)
        if d < depth:
            child_nid = node_ids[i + 1]
            first = jax.ops.segment_min(
                jnp.where(valid, child_nid, cap), nid_d, num_segments=cap
            )
            last = jax.ops.segment_max(
                jnp.where(valid, child_nid, -1), nid_d, num_segments=cap
            )
            child_start = jnp.where(cnt > 0, first, 0)
            child_count = jnp.where(cnt > 0, last - first + 1, 0)
        else:
            child_start = jnp.zeros((cap,), jnp.int32)
            child_count = jnp.zeros((cap,), jnp.int32)
        levels.append(
            TreeLevel(
                com=com,
                mass=m,  # holds G*mass (matches the kernel's gm convention)
                count=cnt,
                start=start,
                child_start=child_start.astype(jnp.int32),
                child_count=child_count.astype(jnp.int32),
            )
        )

    # Bridge: dense terminal cell -> its level-(ld+1) subset children.
    nid_first = node_ids[0]
    bf = jax.ops.segment_min(
        jnp.where(valid, nid_first, cap), s_nid_t, num_segments=k_terminal
    )
    bl = jax.ops.segment_max(
        jnp.where(valid, nid_first, -1), s_nid_t, num_segments=k_terminal
    )
    has = bl >= bf
    child_start = jnp.where(has, bf, 0).astype(jnp.int32)
    child_count = jnp.where(has, bl - bf + 1, 0).astype(jnp.int32)

    return DeepSubset(
        levels=levels,
        child_start=child_start.reshape(1, k_terminal),
        child_count=child_count.reshape(1, k_terminal),
        n_subset=n_subset,
    )
