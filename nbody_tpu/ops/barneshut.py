"""Barnes-Hut force assembly: Morton sort -> level tree -> group traversal
-> dense group x interaction-list force evaluation.

End-to-end TPU re-architecture of serial/barnes-hut.c /
openmp/barnes-hut.c / cuda/barnes-hut.cu (see the module docstrings of
nbody_tpu.ops.morton / bh_tree / bh_traverse for the phase-by-phase
mapping).  The final phase evaluates, for every Morton group of bodies, the
dense pairwise interaction against that group's accepted nodes — the same
softened kernel as the exhaustive path, so a body's own leaf entry
contributes exactly zero (displacement zero), preserving the reference's
self-exclusion (serial/barnes-hut.c:411) without any masking.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.core import constants
from nbody_tpu.ops.bh_tree import build_tree
from nbody_tpu.ops.bh_traverse import TraverseStats, traverse
from nbody_tpu.ops.bh_traverse_flat import traverse_flat
from nbody_tpu.ops.morton import morton_sort


class BHStats(NamedTuple):
    traverse: TraverseStats
    list_capacity: int
    frontier_capacity: int
    range_capacity: int

    def overflowed(self) -> bool:
        return bool(
            int(self.traverse.max_list_needed) > self.list_capacity
            or int(self.traverse.max_frontier_needed) > self.frontier_capacity
            or int(self.traverse.max_ranges_needed) > self.range_capacity
        )


# ---------------------------------------------------------------------------
# Force evaluation: group bodies (B) x interaction list (M)
# ---------------------------------------------------------------------------


def _group_kernel(pg_ref, lists_ref, out_ref, *, eps2: float):
    """One group i-block vs one j-tile of its interaction list.

    pg_ref:    (1, BI, 4) group body positions [x y z 0]
    lists_ref: (1, 4, BJ) list slice, rows [x y z Gm]
    out_ref:   (1, BI, 4) accumulated accelerations
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pg = pg_ref[0]  # (B, 4)
    lj = lists_ref[0]  # (4, BJ)
    xi, yi, zi = pg[:, 0:1], pg[:, 1:2], pg[:, 2:3]
    xj, yj, zj, gmj = lj[0:1, :], lj[1:2, :], lj[2:3, :], lj[3:4, :]

    dx = xj - xi  # (B, BJ)
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz + eps2
    inv_r = lax.rsqrt(r2)
    w = gmj * (inv_r * inv_r * inv_r)

    ax = jnp.sum(w * dx, axis=1, keepdims=True)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    out_ref[0] += jnp.concatenate([ax, ay, az, jnp.zeros_like(ax)], axis=1)


def _eval_lists_pallas(pos_groups, lists, *, eps2, block_j, interpret):
    """pos_groups (G, B, 3), lists (G, 4, M) -> acc (G, B, 3)."""
    n_groups, b, _ = pos_groups.shape
    m = lists.shape[2]
    dtype = jnp.float32
    pg = jnp.concatenate(
        [pos_groups.astype(dtype), jnp.zeros((n_groups, b, 1), dtype)], axis=-1
    )
    bj = min(block_j, m)
    bi = 512 if b % 512 == 0 else (256 if b % 256 == 0 else b)
    grid = (n_groups, b // bi, m // bj)
    out = pl.pallas_call(
        functools.partial(_group_kernel, eps2=float(eps2)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bi, 4), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, 4, bj), lambda g, i, j: (g, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bi, 4), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_groups, b, 4), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=20 * n_groups * b * m,
            bytes_accessed=(n_groups * b * 8 + n_groups * 4 * m) * 4,
            transcendentals=n_groups * b * m,
        ),
        interpret=interpret,
    )(pg, lists)
    return out[:, :, :3]


def _eval_lists_jnp(pos_groups, lists, *, eps2, chunk_groups=8):
    """Pure-jnp fallback (CPU tests / parity)."""
    n_groups, b, _ = pos_groups.shape
    dtype = pos_groups.dtype
    gc = min(chunk_groups, n_groups)
    n_pad = ((n_groups + gc - 1) // gc) * gc
    pg = jnp.pad(pos_groups, ((0, n_pad - n_groups), (0, 0), (0, 0)))
    lv = jnp.pad(lists, ((0, n_pad - n_groups), (0, 0), (0, 0))).astype(dtype)

    def chunk(args):
        p, l = args  # (gc, B, 3), (gc, 4, M)
        d = l[:, None, :3, :] - p[..., None]  # (gc, B, 3, M)
        r2 = jnp.sum(d * d, axis=2) + jnp.asarray(eps2, dtype)  # (gc, B, M)
        inv_r = lax.rsqrt(r2) if dtype == jnp.float32 else r2 ** -0.5
        w = l[:, None, 3, :] * (inv_r * inv_r * inv_r)
        return jnp.einsum("gbm,gbdm->gbd", w, d)

    acc = lax.map(
        chunk, (pg.reshape(-1, gc, b, 3), lv.reshape(-1, gc, 4, lv.shape[2]))
    )
    return acc.reshape(n_pad, b, 3)[:n_groups]


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


_FAR = 1.0e18  # empty-group sentinel box: far away -> root accepted at once


def effective_depth(n: int, depth: int, leaf_cap: int, group_size: int) -> int:
    """Tree depth: the requested depth (<= 10 for int32 Morton keys) with a
    floor of split_level + 3.  Depth is NOT pruned to the uniform-occupancy
    estimate: clustered inputs put thousands of bodies in cells that a
    uniform model calls empty, and a shallow terminal level would COM-merge
    whole clusters (deep levels whose frontiers stay empty cost little —
    the flat traversal tapers their capacities instead)."""
    sl = max(0, math.ceil(math.log(max(n / group_size, 1.0), 8)))
    return max(3, sl + 3, min(depth, 10))


def auto_layout(n: int, group_size: int, leaf_cap: int) -> tuple[int, int, int]:
    """(group_size, split_level, leaf_cap) for N bodies.

    Traversal cost scales with the number of groups G (every frontier
    entry is a (group, node) pair), and G is bounded below by the number
    of occupied split-level cells — so the sweet spot sets the split level
    where cells hold ~group_size bodies and makes groups as large as the
    eval kernel tolerates (~2048).  leaf_cap tracks the mean occupancy two
    levels below the split so expansion stops quickly."""
    if group_size == 0:
        # choose the split level so cells hold <= 2048 bodies, then size
        # groups to the cell occupancy: chunks are whole cells, boxes are
        # cell-tight, and G stays near the occupied-cell count
        sl = max(0, math.ceil(math.log(max(n / 2048.0, 1.0), 8)))
        occ = -(-n // (8**sl))
        group_size = int(min(2048, max(256, -(-occ // 256) * 256)))
    else:
        sl = max(0, math.ceil(math.log(max(n / group_size, 1.0), 8)))
    if leaf_cap == 0:
        occ = n / (8 ** (sl + 2))
        leaf_cap = int(min(32, max(16, 2 * occ)))
    return group_size, sl, leaf_cap


def effective_leaf_cap(n: int, group_size: int, leaf_cap: int) -> int:
    """Back-compat wrapper over auto_layout."""
    return auto_layout(n, group_size or 512, leaf_cap)[2]


def group_bodies(
    keys_s, n: int, depth: int, group_size: int, split_level: int,
    groups_multiple: int = 1,
):
    """Cell-aligned grouping of Morton-sorted bodies (see _prepare's
    docstring for why chunks must not cross coarse-cell boundaries).

    Returns (gstart (G,), gcount (G,), group_idx (G, B), group_valid (G, B))
    with static capacity G = n // B + #split-cells + 1, rounded up to
    `groups_multiple`.  Shared by the level-tree path (_prepare) and the
    fused-kernel path (nbody_tpu.ops.bh_fused)."""
    b = group_size
    sl = min(split_level, depth)
    cell = keys_s >> (3 * (depth - sl))  # coarse cell per sorted body
    first_in_cell = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), cell[1:] != cell[:-1]]
    )
    idx = jnp.arange(n, dtype=jnp.int32)
    # index of the first body of this body's cell, via running maximum
    cell_start = jax.lax.cummax(jnp.where(first_in_cell, idx, 0))
    offset_in_cell = idx - cell_start
    new_group = first_in_cell | (offset_in_cell % b == 0)
    gid = jnp.cumsum(new_group.astype(jnp.int32)) - 1

    # static capacity: every cell adds at most one partial chunk
    g_max = n // b + min(8**sl, n) + 1
    g_max = ((g_max + groups_multiple - 1) // groups_multiple) * groups_multiple
    gstart = jax.ops.segment_min(idx, gid, num_segments=g_max)
    gcount = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), gid, num_segments=g_max)
    gstart = jnp.where(gcount > 0, gstart, 0)

    slots = jnp.arange(b, dtype=jnp.int32)[None, :]
    group_valid = slots < gcount[:, None]  # (G, B)
    # Pad slots repeat the group's FIRST body (never a neighbor group's —
    # that would inflate the bounding box up to the whole domain) so the
    # force kernel does harmless duplicate work that is dropped on the
    # scatter-back.
    group_idx = jnp.clip(
        jnp.where(group_valid, gstart[:, None] + slots, gstart[:, None]),
        0,
        n - 1,
    )
    return gstart, gcount, group_idx, group_valid


def compact_groups(gstart, gcount, group_idx, group_valid, keep: int):
    """Pack occupied groups to the front and trim capacity to `keep`.

    group_bodies' static capacity reserves one slot per split-level cell;
    at large N most slots are empty and a per-group kernel would burn a
    grid step on each.  Ordering is irrelevant to the force sum, so sort
    groups by emptiness (stable, preserving Morton order of the occupied
    ones) and keep a static `keep` prefix.  Returns the packed arrays plus
    the number of OCCUPIED groups that were trimmed (must be 0 for correct
    forces — callers fold it into their overflow stats)."""
    g_max = gstart.shape[0]
    keep = min(keep, g_max)
    order = jnp.argsort((gcount == 0).astype(jnp.int32), stable=True)
    gc_sorted = jnp.take(gcount, order, axis=0)
    trimmed = jnp.sum((gc_sorted[keep:] > 0).astype(jnp.int32))
    return (
        jnp.take(gstart, order, axis=0)[:keep],
        gc_sorted[:keep],
        jnp.take(group_idx, order, axis=0)[:keep],
        jnp.take(group_valid, order, axis=0)[:keep],
        trimmed,
    )


def _prepare(
    pos,
    mass,
    depth: int,
    group_size: int,
    split_level: int | None = None,
    groups_multiple: int = 1,
):
    """Morton-sort, build the level tree, and form *cell-aligned* body
    groups with their AABBs.  Shared by the single-chip and sharded paths.

    Groups are chunks of <= group_size consecutive sorted bodies that never
    cross a level-`split_level` cell boundary.  Naive fixed-stride chunks
    can straddle coarse cell boundaries — a chunk whose Morton range hops
    across the root's center plane has a bounding box covering most of the
    domain, and its traversal frontier degenerates toward O(N).  Aligning
    chunks to coarse cells bounds every group's box by one coarse cell
    (the same reason the CUDA version sorts bodies before its warp-shared
    traversal, cuda/barnes-hut.cu:459-488 — warp neighbors must need
    similar tree paths).

    Returns (n_pad, perm, levels, border, group_idx, group_valid, pg, lo, hi):
      group_idx   (G, B) indices into the sorted body array (clipped)
      group_valid (G, B) slot-occupancy mask
      pg          (G, B, 3) gathered group positions (pad slots repeat a
                  real body, keeping boxes tight)
    """
    n = pos.shape[0]
    b = group_size
    perm, keys, border = morton_sort(pos, depth)
    pos_s = pos[perm]
    mass_s = mass[perm]
    keys_s = keys[perm]

    levels = build_tree(pos_s, mass_s, keys_s, depth)

    # --- cell-aligned grouping ------------------------------------------
    if split_level is None:
        # split at the first level whose cells hold <= ~group_size bodies:
        # group boxes are then bounded by one such cell.  ceil (never
        # round down) — over-coarse cells make group boxes huge and the
        # traversal near field degenerates toward O(N) per group.
        split_level = max(0, math.ceil(math.log(max(n / b, 1.0), 8)))
    gstart, gcount, group_idx, group_valid = group_bodies(
        keys_s, n, depth, b, split_level, groups_multiple
    )
    # Empty groups get a far-away box below so the root is accepted
    # immediately and their traversal terminates at level 0.
    pg = pos_s[group_idx]  # (G, B, 3)
    empty = (gcount == 0)[:, None]
    lo = jnp.where(empty, _FAR, jnp.min(pg, axis=1))
    hi = jnp.where(empty, _FAR, jnp.max(pg, axis=1))
    return (
        n, perm, levels, border, pos_s, mass_s, group_idx, group_valid, pg, lo, hi
    )


def _forces_for_groups(
    levels,
    border,
    pos_sorted,
    gm_sorted,
    pg,
    lo,
    hi,
    *,
    G,
    softening_sq,
    theta,
    leaf_cap,
    frontier_size,
    range_size,
    list_size,
    backend,
    interpret,
    traversal="flat",
):
    """Traverse + evaluate a (slice of) groups; returns ((Gs,B,3), stats)."""
    dtype = pg.dtype
    if traversal == "flat":
        lists, lengths, tstats = traverse_flat(
            levels,
            border.astype(dtype),
            lo,
            hi,
            pos_sorted,
            gm_sorted,
            G_const=G,
            theta=theta,
            leaf_cap=leaf_cap,
            list_size=list_size,
        )
    else:
        lists, lengths, tstats = traverse(
            levels,
            border.astype(dtype),
            lo,
            hi,
            pos_sorted,
            gm_sorted,
            G_const=G,
            theta=theta,
            leaf_cap=leaf_cap,
            frontier_size=frontier_size,
            range_size=range_size,
            list_size=list_size,
        )
    if backend == "auto":
        backend = "jnp" if jax.default_backend() == "cpu" else "pallas"
    if backend == "pallas":
        acc_g = _eval_lists_pallas(
            pg, lists, eps2=softening_sq, block_j=1024, interpret=interpret
        )
    else:
        acc_g = _eval_lists_jnp(pg, lists.astype(dtype), eps2=softening_sq)
    return acc_g.astype(dtype), tstats


@functools.partial(
    jax.jit,
    static_argnames=(
        "G",
        "softening_sq",
        "theta",
        "depth",
        "group_size",
        "leaf_cap",
        "frontier_size",
        "range_size",
        "list_size",
        "backend",
        "interpret",
        "return_stats",
        "traversal",
    ),
)
def barneshut_accelerations(
    pos: jax.Array,
    mass: jax.Array,
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
    return_stats: bool = False,
    traversal: str = "flat",
):
    """Barnes-Hut accelerations (ForceFn signature).

    Capacities are static; if a run exceeds them the returned stats (ask
    with return_stats=True) report the required sizes — check_capacities()
    wraps that into a fail-fast probe.
    """
    n = pos.shape[0]
    dtype = pos.dtype
    group_size, split_level, leaf_cap = auto_layout(n, group_size, leaf_cap)
    depth = effective_depth(n, depth, leaf_cap, group_size)
    depth = max(depth, split_level + 3)

    (_, perm, levels, border, pos_s, mass_s, group_idx, group_valid,
     pg, lo, hi) = _prepare(pos, mass, depth, group_size, split_level)
    gm_s = jnp.asarray(G, dtype) * mass_s
    acc_g, tstats = _forces_for_groups(
        levels,
        border,
        pos_s,
        gm_s,
        pg,
        lo,
        hi,
        G=G,
        softening_sq=softening_sq,
        theta=theta,
        leaf_cap=leaf_cap,
        frontier_size=frontier_size,
        range_size=range_size,
        list_size=list_size,
        backend=backend,
        interpret=interpret,
        traversal=traversal,
    )
    # Scatter (group, slot) accelerations back: sorted order, then inverse
    # of the Morton permutation.
    dest = jnp.where(group_valid, group_idx, n)  # n -> dropped
    acc_s = (
        jnp.zeros((n, 3), dtype)
        .at[dest.reshape(-1)]
        .set(acc_g.reshape(-1, 3).astype(dtype), mode="drop")
    )
    acc = jnp.zeros((n, 3), dtype).at[perm].set(acc_s)

    if return_stats:
        stats = BHStats(
            traverse=tstats,
            list_capacity=list_size,
            # flat traversal reports frontier EXCESS (0 = fits)
            frontier_capacity=0 if traversal == "flat" else frontier_size,
            # flat traversal reports range/body EXCESS (0 = fits)
            range_capacity=0 if traversal == "flat" else range_size,
        )
        return acc, stats
    return acc


class CapacityError(RuntimeError):
    """Static traversal capacities exceeded — results would drop sources.
    The TPU-native analog of the reference's node-pool exhaustion abort
    (openmp/barnes-hut.c:158-160)."""


class ResolutionError(RuntimeError):
    """A cluster denser than the terminal Morton resolution was COM-merged;
    forces for those bodies are approximate beyond the theta contract."""


def check_capacities(pos, mass, *, strict_resolution: bool = True, **kw) -> BHStats:
    """Run one traversal and fail fast if capacities overflowed — the
    TPU-native analog of the reference's node-pool exhaustion abort
    (openmp/barnes-hut.c:158-160).  With strict_resolution, terminal-cell
    COM merging of over-dense clusters also raises (the reference resolves
    clusters exactly via its unbounded leaf split, serial/barnes-hut.c:206-245)."""
    _, stats = barneshut_accelerations(pos, mass, return_stats=True, **kw)
    if stats.overflowed():
        raise CapacityError(
            "Barnes-Hut capacity overflow: "
            f"need list={int(stats.traverse.max_list_needed)} "
            f"(have {stats.list_capacity}), "
            f"frontier={int(stats.traverse.max_frontier_needed)} "
            f"(have {stats.frontier_capacity}), "
            f"ranges={int(stats.traverse.max_ranges_needed)} "
            f"(have {stats.range_capacity}); rerun with larger "
            "list_size/frontier_size/range_size"
        )
    term = int(stats.traverse.terminal_com_bodies)
    if strict_resolution and term > 0:
        raise ResolutionError(
            f"Barnes-Hut terminal-resolution residual: up to {term} bodies "
            "per group were COM-merged in over-full terminal cells "
            "(cluster denser than the terminal Morton resolution); "
            "results are approximate beyond theta for those bodies"
        )
    return stats
