"""Level-array octree built from sorted Morton keys with segment ops.

Replaces the reference's three build phases — pointer insert
(serial/barnes-hut.c:169-270), post-order center-of-mass recursion
(:285-317), and the OpenMP/CUDA concurrent variants (spin-wait data-flow
sweep openmp/barnes-hut.c:341-367, atomicCAS insert + compaction
cuda/barnes-hut.cu:206-451) — with dense, branch-free segment reductions:

For each level d, the node containing body b is the 3d-bit prefix of b's
Morton key.  With bodies sorted by key, every node is a contiguous run of
bodies, so per level:
  node ids     = prefix-change cumsum            (one vector pass)
  node mass    = segment_sum(m)
  node COM     = segment_sum(m * p) / mass       (mass-weighted, same
                 accumulation the reference's center_of_mass performs)
  child links  = segment min/count of the next level's node ids

Everything is fixed-shape; per-level node capacity is min(8^d, N) padded.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TreeLevel(NamedTuple):
    """Nodes of one octree level (padded to static capacity).

    com:         (K, 3) center of mass
    mass:        (K,)   total mass
    count:       (K,)   number of bodies in the node (0 = padding)
    start:       (K,)   first body index (sorted order)
    child_start: (K,)   index of first child in the next level's arrays
    child_count: (K,)   number of children (0 for the last level)
    """

    com: jax.Array
    mass: jax.Array
    count: jax.Array
    start: jax.Array
    child_start: jax.Array
    child_count: jax.Array

    @property
    def capacity(self) -> int:
        return self.mass.shape[0]


def _level_capacity(n: int, depth_level: int) -> int:
    return int(min(8**depth_level, n)) if depth_level > 0 else 1


def build_tree(
    pos_sorted: jax.Array,
    mass_sorted: jax.Array,
    keys_sorted: jax.Array,
    depth: int,
) -> list[TreeLevel]:
    """Build all levels 0..depth from Morton-sorted bodies.

    Returns a list of TreeLevel, root first.  All shapes are static; the
    number of real nodes per level is implicit in count > 0.
    """
    n = pos_sorted.shape[0]
    wpos = mass_sorted[:, None] * pos_sorted  # mass-weighted positions
    body_idx = jnp.arange(n, dtype=jnp.int32)

    # Per-level node id of every body, computed from key prefixes.
    node_ids: list[jax.Array] = []
    for d in range(depth + 1):
        if d == 0:
            nid = jnp.zeros((n,), jnp.int32)
        else:
            prefix = keys_sorted >> (3 * (depth - d))
            newseg = jnp.concatenate(
                [jnp.ones((1,), jnp.int32), (prefix[1:] != prefix[:-1]).astype(jnp.int32)]
            )
            nid = jnp.cumsum(newseg, dtype=jnp.int32) - 1
        node_ids.append(nid)

    levels: list[TreeLevel] = []
    for d in range(depth + 1):
        cap = _level_capacity(n, d)
        nid = node_ids[d]
        seg = lambda x: jax.ops.segment_sum(x, nid, num_segments=cap)
        m = seg(mass_sorted)
        w = jax.ops.segment_sum(wpos, nid, num_segments=cap)
        cnt = seg(jnp.ones((n,), jnp.int32))
        com = w / jnp.maximum(m, jnp.asarray(1e-30, m.dtype))[:, None]
        start = jax.ops.segment_min(body_idx, nid, num_segments=cap)
        start = jnp.where(cnt > 0, start, 0)

        if d < depth:
            child_nid = node_ids[d + 1]
            # children of node k at level d = contiguous run of level-(d+1)
            # nodes; first child = child id at this node's first body.
            child_start = child_nid[start]
            child_end_body = jnp.where(cnt > 0, start + cnt - 1, 0)
            child_count = jnp.where(
                cnt > 0, child_nid[child_end_body] - child_start + 1, 0
            )
        else:
            child_start = jnp.zeros((cap,), jnp.int32)
            child_count = jnp.zeros((cap,), jnp.int32)

        levels.append(
            TreeLevel(
                com=com,
                mass=m,
                count=cnt,
                start=start,
                child_start=child_start.astype(jnp.int32),
                child_count=child_count.astype(jnp.int32),
            )
        )
    return levels
