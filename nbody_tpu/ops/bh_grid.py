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
bodies at the terminal dense level) need no structure at all: the fused
traversal (ops/bh_fused.py) ships the bodies of over-full terminal cells
exactly, bounding the extra work by the cluster population — the role of
the reference's unbounded leaf split (serial/barnes-hut.c:206-245).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


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
    table_dtype=jnp.float32,
) -> GridTree:
    """Build dense levels 0..ld from Morton-sorted bodies.

    gm_sorted is G * mass (the kernel emits [x y z Gm] rows directly).
    `table_dtype` selects the accumulation/table precision: the df
    Barnes-Hut path (ops/bh_fused_df.py) builds in f64 and splits the
    tables into f32 hi/lo halves.
    """
    n = pos_sorted.shape[0]
    k_terminal = 8**ld
    off = grid_offsets(ld)
    nid = (keys_sorted >> (3 * (depth - ld))).astype(jnp.int32)

    w = jax.ops.segment_sum(
        gm_sorted.astype(table_dtype)[:, None]
        * pos_sorted.astype(table_dtype),
        nid,
        num_segments=k_terminal,
    )  # (K, 3)
    gm = jax.ops.segment_sum(
        gm_sorted.astype(table_dtype), nid, num_segments=k_terminal
    )
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
        gm=gm_all.astype(table_dtype).reshape(1, total),
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
