#!/usr/bin/env python
"""Per-phase Barnes-Hut profiler: where does a 1M-body force eval go?

Times each pipeline phase separately (jitted, fenced with a D2H readback)
so kernel work can target the real bottleneck — the TPU analog of the
reference's -DPRINT_KERNEL_TIME per-kernel timers
(cuda/barnes-hut.cu:938-948, 1040-1049).

Usage: python tools/profile_bh.py [N] [--reps K]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def timed(fn, *args, reps=3, warmup=1):
    """Best-of-reps wall time of fn(*args) with a D2H fence."""
    from nbody_tpu.diag.timing import fence

    for _ in range(warmup):
        fence(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--traversal", default="flat")
    args = ap.parse_args()

    from nbody_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from nbody_tpu.core import constants
    from nbody_tpu.ops import barneshut as bh
    from nbody_tpu.ops.bh_tree import build_tree
    from nbody_tpu.ops.bh_traverse_flat import traverse_flat
    from nbody_tpu.ops.morton import morton_sort

    n = args.n
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-2.0, 2.0, (n, 3)), jnp.float32)
    mass = jnp.asarray(rng.uniform(0.04, 1.0, n), jnp.float32)

    group_size, split_level, leaf_cap = bh.auto_layout(n, 0, 0)
    depth = bh.effective_depth(n, 9, leaf_cap, group_size)
    depth = max(depth, split_level + 3)
    print(
        f"N={n} depth={depth} group_size={group_size} "
        f"split_level={split_level} leaf_cap={leaf_cap} "
        f"backend={jax.default_backend()}",
        flush=True,
    )
    t = {}

    # --- phase 1: morton sort (key + argsort) ---------------------------
    sort_fn = jax.jit(functools.partial(morton_sort, depth=depth))
    t["sort"] = timed(sort_fn, pos, reps=args.reps)
    perm, keys, border = sort_fn(pos)

    # --- phase 2: apply permutation --------------------------------------
    permute = jax.jit(lambda p, m, pe: (p[pe], m[pe]))
    t["permute"] = timed(permute, pos, mass, perm, reps=args.reps)
    pos_s, mass_s = permute(pos, mass, perm)
    keys_s = keys[perm]

    # --- phase 3: tree build ---------------------------------------------
    build_fn = jax.jit(functools.partial(build_tree, depth=depth))
    t["build"] = timed(build_fn, pos_s, mass_s, keys_s, reps=args.reps)

    # --- phase 4: full prepare (sort + permute + build + grouping) -------
    prep = jax.jit(
        functools.partial(
            bh._prepare, depth=depth, group_size=group_size,
            split_level=split_level,
        )
    )
    t["prepare(all)"] = timed(prep, pos, mass, reps=args.reps)
    (_, perm, levels, border, pos_s, mass_s, group_idx, group_valid,
     pg, lo, hi) = prep(pos, mass)
    gm_s = mass_s  # G = 1
    n_groups = pg.shape[0]
    print(f"n_groups={n_groups}", flush=True)

    # --- phase 5: traversal ----------------------------------------------
    trav = jax.jit(
        functools.partial(
            traverse_flat,
            G_const=constants.BIG_G, theta=constants.THETA,
            leaf_cap=leaf_cap, list_size=16384,
        )
    )
    t["traverse"] = timed(
        trav, levels, border, lo, hi, pos_s, gm_s, reps=args.reps
    )
    lists, lengths, stats = trav(levels, border, lo, hi, pos_s, gm_s)
    print(
        f"lists: max_len={int(stats.max_list_needed)} "
        f"mean_len={float(jnp.mean(lengths)):.0f} "
        f"total={int(jnp.sum(lengths))} "
        f"capacity={n_groups * 16384}",
        flush=True,
    )

    # --- phase 6: eval ----------------------------------------------------
    if jax.default_backend() == "cpu":
        ev = jax.jit(
            functools.partial(bh._eval_lists_jnp, eps2=constants.SOFTENING_SQ)
        )
    else:
        ev = jax.jit(
            functools.partial(
                bh._eval_lists_pallas, eps2=constants.SOFTENING_SQ,
                block_j=1024, interpret=False,
            )
        )
    t["eval"] = timed(ev, pg, lists, reps=args.reps)
    acc_g = ev(pg, lists)

    # --- phase 7: scatter back --------------------------------------------
    def scatter_back(acc_g, group_valid, group_idx, perm):
        dest = jnp.where(group_valid, group_idx, n)
        acc_s = (
            jnp.zeros((n, 3), jnp.float32)
            .at[dest.reshape(-1)]
            .set(acc_g.reshape(-1, 3), mode="drop")
        )
        return jnp.zeros((n, 3), jnp.float32).at[perm].set(acc_s)

    t["scatter_back"] = timed(
        jax.jit(scatter_back), acc_g, group_valid, group_idx, perm,
        reps=args.reps,
    )

    # --- full pipeline ------------------------------------------------------
    full = functools.partial(
        bh.barneshut_accelerations, traversal=args.traversal
    )
    t["FULL"] = timed(full, pos, mass, reps=args.reps)

    print()
    phases = [k for k in t if k not in ("FULL", "prepare(all)")]
    acc = sum(t[k] for k in phases)
    for k, v in t.items():
        print(f"{k:>14}: {v * 1e3:9.1f} ms")
    print(f"{'sum(phases)':>14}: {acc * 1e3:9.1f} ms")


if __name__ == "__main__":
    main()
