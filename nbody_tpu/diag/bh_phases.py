"""Per-phase Barnes-Hut timing breakdown.

The TPU analog of the reference's -DPRINT_KERNEL_TIME per-kernel timers
(cuda/barnes-hut.cu:938-948, 1040-1049): each pipeline phase is jitted and
fenced separately so the report shows where a force eval actually goes.
Phase splitting prevents XLA from fusing across phase boundaries, so the
sum slightly overestimates the fused end-to-end step — the report prints
the fused total alongside.

Used by `nbody --timers` (one report at startup) and tools/profile_bh.py.
"""

from __future__ import annotations

import functools
import math
import time

import numpy as np


def _timed(fn, *args, reps=2):
    from nbody_tpu.diag.timing import fence

    out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def fused_phase_times(pos, mass, *, G, softening_sq, theta,
                      group_size=1024, leaf_cap=64, reps=2,
                      interpret=False):
    """Phase times (dict name -> seconds) for the fused-kernel path."""
    import jax
    import jax.numpy as jnp

    from nbody_tpu.ops import bh_fused as bf
    from nbody_tpu.ops.barneshut import compact_groups, group_bodies
    from nbody_tpu.ops.bh_grid import build_grid, grid_offsets
    from nbody_tpu.ops.morton import morton_sort

    n = pos.shape[0]
    b = group_size
    ld = bf.auto_ld(n)
    depth = 10
    sl = bf.auto_split_level(n, b)
    times = {}

    @jax.jit
    def p_sort(pos, mass):
        perm, keys, border = morton_sort(pos, depth)
        return (
            pos[perm].astype(jnp.float32),
            (jnp.asarray(G, jnp.float32) * mass[perm]).astype(jnp.float32),
            keys[perm],
            border,
        )

    times["sort"], (pos_s, gm_s, keys_s, border) = _timed(p_sort, pos, mass, reps=reps)

    @jax.jit
    def p_grid(pos_s, gm_s, keys_s):
        tree = build_grid(pos_s, gm_s, keys_s, depth, ld)
        return bf.pack_tables(tree, ld)

    times["grid+pack"], (ft, it) = _timed(p_grid, pos_s, gm_s, keys_s, reps=reps)

    @jax.jit
    def p_group(pos_s, keys_s):
        gstart, gcount, group_idx, group_valid = group_bodies(
            keys_s, n, depth, b, sl
        )
        keep = min(gstart.shape[0], 3 * (n // b) + 256)
        gstart, gcount, group_idx, group_valid, trimmed = compact_groups(
            gstart, gcount, group_idx, group_valid, keep
        )
        pg = jnp.concatenate(
            [
                jnp.transpose(pos_s[group_idx], (0, 2, 1)),
                jnp.zeros((gcount.shape[0], 1, b), jnp.float32),
            ],
            axis=1,
        )
        return gcount, group_idx, group_valid, pg

    times["group"], (gcount, group_idx, group_valid, pg) = _timed(
        p_group, pos_s, keys_s, reps=reps
    )

    @jax.jit
    def p_kernel(gcount, pg, ft, it, pos_s, gm_s, border):
        np_pad = -(-n // 128) * 128
        ps = jnp.concatenate([pos_s.T, gm_s[None, :]], axis=0)
        ps = jnp.pad(ps, ((0, 0), (0, np_pad - n)))
        lev = jnp.arange(16, dtype=jnp.float32)
        bsq = (border.astype(jnp.float32) / jnp.exp2(lev)) ** 2
        ooff = bf.aux_octet_offsets()
        acc_g, stats = bf.fused_group_forces(
            gcount, pg, ft, it, ps, bsq, ooff,
            theta=theta, eps2=softening_sq, leaf_cap=leaf_cap, ld=ld,
            interpret=interpret,
        )
        return acc_g, stats

    times["kernel"], (acc_g, _stats) = _timed(
        p_kernel, gcount, pg, ft, it, pos_s, gm_s, border, reps=reps
    )

    @jax.jit
    def p_scatter(acc_g, group_idx, group_valid):
        dest = jnp.where(group_valid, group_idx, n)
        acc_s = (
            jnp.zeros((n, 3), jnp.float32)
            .at[dest.reshape(-1)]
            .set(jnp.transpose(acc_g, (0, 2, 1)).reshape(-1, 3), mode="drop")
        )
        return acc_s

    times["scatter"], _ = _timed(p_scatter, acc_g, group_idx, group_valid, reps=reps)

    fused = jax.jit(
        functools.partial(
            bf.barneshut_fused, G=G, softening_sq=softening_sq, theta=theta,
            group_size=group_size, leaf_cap=leaf_cap, interpret=interpret,
        )
    )
    times["TOTAL (fused jit)"], _ = _timed(fused, pos, mass, reps=reps)
    return times


def flat_phase_times(pos, mass, *, G, softening_sq, theta, reps=2, **bh_kw):
    """Phase times for the flat-XLA list path (sort+build / traverse / eval)."""
    import jax
    import jax.numpy as jnp

    from nbody_tpu.ops import barneshut as bh

    n = pos.shape[0]
    group_size, split_level, leaf_cap = bh.auto_layout(
        n, bh_kw.get("group_size", 0), bh_kw.get("leaf_cap", 0)
    )
    depth = bh.effective_depth(n, bh_kw.get("depth", 9), leaf_cap, group_size)
    depth = max(depth, split_level + 3)
    times = {}

    @jax.jit
    def p_prep(pos, mass):
        return bh._prepare(pos, mass, depth, group_size, split_level)

    times["sort+build+group"], prep = _timed(p_prep, pos, mass, reps=reps)
    (_, _, levels, border, pos_s, mass_s, _, _, pg, lo, hi) = prep
    gm_s = jnp.asarray(G, pos.dtype) * mass_s

    from nbody_tpu.ops.bh_traverse_flat import traverse_flat

    @jax.jit
    def p_trav(levels, border, lo, hi, pos_s, gm_s):
        return traverse_flat(
            levels, border.astype(pos_s.dtype), lo, hi, pos_s, gm_s,
            G_const=G, theta=theta, leaf_cap=leaf_cap,
            list_size=bh_kw.get("list_size", 16384),
        )

    times["traverse"], (lists, lengths, _) = _timed(
        p_trav, levels, border, lo, hi, pos_s, gm_s, reps=reps
    )

    backend = "jnp" if jax.default_backend() == "cpu" else "pallas"

    @jax.jit
    def p_eval(pg, lists):
        if backend == "pallas":
            return bh._eval_lists_pallas(
                pg, lists, eps2=softening_sq, block_j=1024, interpret=False
            )
        return bh._eval_lists_jnp(pg, lists.astype(pg.dtype), eps2=softening_sq)

    times["eval"], _ = _timed(p_eval, pg, lists, reps=reps)

    total = jax.jit(
        functools.partial(
            bh.barneshut_accelerations, G=G, softening_sq=softening_sq,
            theta=theta, **bh_kw,
        )
    )
    times["TOTAL (one jit)"], _ = _timed(total, pos, mass, reps=reps)
    return times


def report(times: dict) -> str:
    width = max(len(k) for k in times)
    lines = [
        f"  {k:<{width}}  {v * 1e3:10.1f} ms"
        for k, v in times.items()
    ]
    return "\n".join(lines)
