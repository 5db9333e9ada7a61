"""fp64-grade Barnes-Hut: the fused traverse+evaluate kernel with
compensated-f32x2 (double-float) force arithmetic.

The reference's Barnes-Hut is `double` end-to-end (serial/barnes-hut.c:
101-434 operates on double Entity fields; cuda/barnes-hut.cu:22-27 ships
double* device arrays).  Round 4 built the df machinery for all-pairs
(ops/pallas_df.py); this module applies it to the tree code so
`--dtype f64 --algo barnes-hut` gets genuinely fp64-grade forces instead
of f64 state under f32 kernels:

  * the dense grid builds its COM/G*m tables in f64 (one XLA x64
    segment_sum pass — build phase only, off the per-pair hot path) and
    splits every float table into f32 hi/lo halves (`pack_tables_df`);
  * group bodies and the planar sorted-source array carry each
    coordinate as an unevaluated f32 hi+lo pair (8 planar channels
    [xh xl yh yl zh zl gmh gml] instead of [x y z gm]);
  * the fused kernel (ops/bh_fused._fused_kernel, static `df` mode)
    runs the SAME BFS traversal/staging/lane-packing machinery — the
    MAC classifies against the f32 hi halves, a decision rule the twin
    oracle replicates — but the eval chain is the full df pair pipeline
    (Knuth two_sum / Dekker two_prod / df Newton rsqrt, ~290 VPU flops
    per pair) with df lane accumulators and a compensated binary-
    halving cross-lane reduction.

Unit roundoff of the representation is ~3.6e-15 (47-bit effective
mantissa); parity vs an fp64 twin of the same algorithm is pinned below
1e-12 in tests/test_bh_fused_df.py.  The priced cost is the same ~13x
per-pair ratio the all-pairs df kernel measured (docs/PERFORMANCE.md) —
far under the reference's own f32->f64 hardware ratio on consumer GPUs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.core import constants
from nbody_tpu.ops.barneshut import compact_groups, group_bodies
from nbody_tpu.ops.bh_fused import (
    FRONTIER_CAP,
    aux_octet_offsets,
    auto_ld,
    auto_split_level,
    fused_group_forces,
    outlier_rect,
    pack_ft,
    pack_it,
)
from nbody_tpu.ops.bh_grid import GridTree, build_grid
from nbody_tpu.ops.morton import morton_sort


def _split_f64(x):
    """f64 array -> (hi, lo) f32 pair with hi + lo == x to f32x2."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def pack_tables_df(tree: GridTree, ld: int):
    """f64 GridTree -> (ft_hi, ft_lo, it): two (RF, 128) f32 octet field
    tables (hi/lo halves of the f64 COM/G*m fields) + the usual int
    table.  Same octet addressing as bh_fused.pack_tables."""
    hi = {}
    lo = {}
    for f in ("cx", "cy", "cz", "gm"):
        hi[f], lo[f] = _split_f64(getattr(tree, f))
    t_hi = GridTree(cnt=tree.cnt, start=tree.start, **hi)
    t_lo = GridTree(cnt=tree.cnt, start=tree.start, **lo)
    return pack_ft(t_hi, ld), pack_ft(t_lo, ld), pack_it(t_hi, ld)


def _interleave6(hi, lo):
    """(N, 3) df pairs -> (N, 6) [xh xl yh yl zh zl]."""
    return jnp.stack([hi, lo], axis=-1).reshape(hi.shape[0], 6)


@functools.partial(
    jax.jit,
    static_argnames=(
        "G",
        "softening_sq",
        "theta",
        "ld",
        "leaf_cap",
        "group_size",
        "burst_rows",
        "keep_groups",
        "frontier_cap",
        "interpret",
        "return_stats",
    ),
)
def barneshut_fused_df(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    theta: float = constants.THETA,
    ld: int = 0,
    leaf_cap: int = 64,
    group_size: int = 1024,
    burst_rows: int = 16,
    keep_groups: int = 0,
    frontier_cap: int = 0,
    interpret: bool = False,
    return_stats: bool = False,
    border=None,
):
    """fp64-grade Barnes-Hut accelerations (ForceFn signature): the df
    twin of bh_fused.barneshut_fused.  Returns f64 when x64 is enabled
    (the --dtype f64 contract), else the recombined f32.

    Sorting/grouping/classification mirror the f32 path exactly (same
    Morton keys, same groups, same f32 MAC decisions); only the force
    arithmetic and the tree's float tables change precision."""
    n = pos.shape[0]
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pos64 = pos.astype(f64)
    if ld == 0:
        ld = auto_ld(n)
    depth = 10
    b = group_size
    sl = auto_split_level(n, b)

    perm, keys, border = morton_sort(pos64, depth, border=border)
    pos_s64 = pos64[perm]
    gm_s64 = jnp.asarray(G, f64) * mass.astype(f64)[perm]
    keys_s = keys[perm]

    tree = build_grid(pos_s64, gm_s64, keys_s, depth, ld, table_dtype=f64)
    ft_hi, ft_lo, it = pack_tables_df(tree, ld)

    gstart, gcount, group_idx, group_valid = group_bodies(
        keys_s, n, depth, b, sl
    )
    from nbody_tpu.core import capacity as _cap

    budget = _cap.budget_bytes()
    keep = keep_groups or _cap.auto_keep(n, b, gstart.shape[0], budget)
    keep = min(keep, gstart.shape[0])
    # df groups/sources/tables carry 2x the f32 channel volume
    est = {k: 2 * v for k, v in _cap.estimate_fused_bytes(
        n, b, keep, ld).items()}
    _cap.ensure_fits(est, f"df fused Barnes-Hut at n={n}", budget=budget)
    gstart, gcount, group_idx, group_valid, trimmed = compact_groups(
        gstart, gcount, group_idx, group_valid, keep
    )
    gp64 = pos_s64[group_idx]  # (keep, B, 3) f64
    gp_hi, gp_lo = _split_f64(gp64.reshape(-1, 3))
    pg = jnp.concatenate(
        [
            jnp.transpose(
                _interleave6(gp_hi, gp_lo).reshape(keep, b, 6), (0, 2, 1)
            ),
            jnp.zeros((keep, 2, b), jnp.float32),
        ],
        axis=1,
    )  # (keep, 8, B) planar [xh; xl; yh; yl; zh; zl; 0; 0]

    np_pad = -(-n // 128) * 128
    ps_hi, ps_lo = _split_f64(pos_s64)
    gm_hi, gm_lo = _split_f64(gm_s64)
    ps = jnp.concatenate(
        [
            _interleave6(ps_hi, ps_lo),
            jnp.stack([gm_hi, gm_lo], axis=-1),
        ],
        axis=1,
    ).T  # (8, N)
    ps = jnp.pad(ps, ((0, 0), (0, np_pad - n)))

    lev = jnp.arange(16, dtype=jnp.float32)
    bsq = (border.astype(jnp.float32) / jnp.exp2(lev)) ** 2
    ooff = aux_octet_offsets()

    acc_g, stats = fused_group_forces(
        gcount,
        pg,
        ft_hi,
        it,
        ps,
        bsq,
        ooff,
        theta=theta,
        eps2=softening_sq,
        leaf_cap=leaf_cap,
        ld=ld,
        burst_rows=burst_rows,
        frontier_cap=frontier_cap or FRONTIER_CAP,
        interpret=interpret,
        ftl=ft_lo,
        df=True,
    )  # (keep, 8, B): hi rows 0..2, lo rows 4..6

    vals = jnp.transpose(acc_g[:, 0:3, :], (0, 2, 1)).astype(f64) + (
        jnp.transpose(acc_g[:, 4:7, :], (0, 2, 1)).astype(f64)
    )  # (keep, B, 3) f64

    final_dest = jnp.where(
        group_valid, perm[jnp.clip(group_idx, 0, n - 1)], n
    )
    acc = (
        jnp.zeros((n, 3), f64)
        .at[final_dest.reshape(-1)]
        .set(vals.reshape(-1, 3), mode="drop")
    )

    if return_stats:
        return acc, {
            "pops": jnp.sum(stats[:, 0].astype(jnp.float32)),
            "staged_sources": jnp.sum(stats[:, 1].astype(jnp.float32)),
            "near_bodies": jnp.sum(stats[:, 2].astype(jnp.float32)),
            "frontier_overflow": jnp.max(stats[:, 3]),
            "trimmed_groups": trimmed,
            "eval_rows": jnp.sum(stats[:, 4].astype(jnp.float32)),
            "far_children": jnp.sum(stats[:, 5].astype(jnp.float32)),
        }
    return acc


def barneshut_fused_robust_df(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    outlier_slots: int = 0,
    return_stats: bool = False,
    **kw,
):
    """Outlier-robust df Barnes-Hut: the same exact hybrid as
    bh_fused.barneshut_fused_robust (median-centered K-outlier-trimmed
    root cube + zero-massed riders + one exact rectangle), with BOTH
    halves fp64-grade — the tree through barneshut_fused_df, the
    outlier rectangle through pallas_rect_accelerations_df."""
    from nbody_tpu.ops.pallas_df import pallas_rect_accelerations_df

    n = pos.shape[0]
    if kw.get("ld", 0) == 0:
        kw["ld"] = min(8, auto_ld(n) + 2)
    k = int(outlier_slots) or max(128, n // 512)
    k = min(k, n - 1)
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pos64 = pos.astype(f64)
    pos32 = pos.astype(jnp.float32)
    center = jnp.median(pos32, axis=0)
    rel32 = pos32 - center
    d = jnp.max(jnp.abs(rel32), axis=1)
    vals, idx = lax.top_k(d, k + 1)
    out_idx = idx[:k]
    border = 2.0 * vals[k] * 1.0001
    mass_bh = mass.at[out_idx].set(0.0)
    res = barneshut_fused_df(
        pos64 - center.astype(f64), mass_bh, G=G,
        softening_sq=softening_sq, border=border,
        return_stats=return_stats, **kw,
    )
    acc = res[0] if return_stats else res
    side = pallas_rect_accelerations_df(
        pos64, pos64[out_idx],
        mass.astype(f64)[out_idx],
        G=G, softening_sq=softening_sq,
        interpret=bool(kw.get("interpret", False)),
    )
    acc = acc + side.astype(acc.dtype)
    if return_stats:
        return acc, res[1]
    return acc
