"""fp64-grade fused Barnes-Hut (nbody_tpu.ops.bh_fused_df).

Parity contract: the df kernel must match an fp64 NumPy twin of the SAME
algorithm (same Morton sort, same groups, same f32 MAC decisions, fp64
force arithmetic) to < 1e-12 relative — the df representation's ~2^-48
unit roundoff, far below the f32 kernel's ~1e-7.  The twin reuses the
pipeline's own jax-computed perm/keys/groups/tree so the ONLY difference
is arithmetic precision, never tree shape.

Reference analog: serial/barnes-hut.c:363-443 computes `double`
throughout; this is the TPU-native equivalent of that contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbody_tpu.ops.bh_fused import auto_ld, auto_split_level
from nbody_tpu.ops.bh_fused_df import (
    barneshut_fused_df,
    barneshut_fused_robust_df,
)

pytestmark = pytest.mark.heavy  # interpret-mode kernels: quick tier skips

EPS2 = 0.01
G = 1.0
THETA = 0.5
LEAF_CAP = 64


def twin_bh_f64(pos, mass, *, group_size, ld=0, border=None,
                theta=THETA, eps2=EPS2, g_const=G, leaf_cap=LEAF_CAP):
    """fp64 twin of barneshut_fused_df: identical tree/groups/MAC (the
    grouping and grid come from the SAME jax helpers), fp64 physics."""
    from nbody_tpu.ops.barneshut import compact_groups, group_bodies
    from nbody_tpu.ops.bh_grid import build_grid, grid_offsets
    from nbody_tpu.ops.morton import morton_sort

    n = pos.shape[0]
    depth = 10
    if ld == 0:
        ld = auto_ld(n)
    b = group_size
    sl = auto_split_level(n, b)
    pos64 = jnp.asarray(pos, jnp.float64)
    perm, keys, border = morton_sort(pos64, depth, border=border)
    pos_s = np.asarray(pos64[perm], np.float64)
    gm_s = np.asarray(g_const * np.asarray(mass, np.float64))[
        np.asarray(perm)
    ]
    tree = build_grid(
        pos64[perm],
        jnp.asarray(gm_s),
        keys[perm],
        depth,
        ld,
        table_dtype=jnp.float64,
    )
    gstart, gcount, group_idx, group_valid = group_bodies(
        keys[perm], n, depth, b, sl
    )
    gstart, gcount, group_idx, group_valid, trimmed = compact_groups(
        gstart, gcount, group_idx, group_valid, gstart.shape[0]
    )
    assert int(trimmed) == 0
    gcount = np.asarray(gcount)
    group_idx = np.asarray(group_idx)
    group_valid = np.asarray(group_valid)

    off = grid_offsets(ld)
    cx64 = np.asarray(tree.cx[0], np.float64)
    cy64 = np.asarray(tree.cy[0], np.float64)
    cz64 = np.asarray(tree.cz[0], np.float64)
    gm64 = np.asarray(tree.gm[0], np.float64)
    cnt = np.asarray(tree.cnt[0])
    start = np.asarray(tree.start[0])
    # the kernel classifies against the f32 hi halves
    cx32, cy32, cz32 = (
        cx64.astype(np.float32),
        cy64.astype(np.float32),
        cz64.astype(np.float32),
    )
    border32 = np.float32(np.asarray(border))
    bsq = (border32 / np.exp2(np.arange(16, dtype=np.float32))).astype(
        np.float32
    ) ** 2
    theta_sq = np.float32(theta * theta)
    pos_s32 = pos_s.astype(np.float32)

    acc_s = np.zeros((n, 3), np.float64)
    for g in range(gcount.shape[0]):
        if gcount[g] == 0:
            continue
        members = group_idx[g][group_valid[g]]
        box_lo = pos_s32[members].min(axis=0)
        box_hi = pos_s32[members].max(axis=0)
        near_idx = []
        far_cells = []
        frontier = np.arange(8)  # level-1 cells (children of the root)
        for l in range(1, ld + 1):
            flat = off[l] + frontier
            exists = cnt[flat] > 0
            ddx = cx32[flat] - np.clip(cx32[flat], box_lo[0], box_hi[0])
            ddy = cy32[flat] - np.clip(cy32[flat], box_lo[1], box_hi[1])
            ddz = cz32[flat] - np.clip(cz32[flat], box_lo[2], box_hi[2])
            d2 = (
                ddx.astype(np.float32) ** 2
                + ddy.astype(np.float32) ** 2
                + ddz.astype(np.float32) ** 2
            )
            far = exists & (theta_sq * d2 > bsq[l])
            near = exists & ~far & ((cnt[flat] <= leaf_cap) | (l == ld))
            opened = exists & ~far & ~near
            far_cells.extend(flat[far].tolist())
            for f in flat[near]:
                near_idx.append((start[f], start[f] + cnt[f]))
            frontier = (
                8 * frontier[opened][:, None] + np.arange(8)[None, :]
            ).reshape(-1)
        tgt = pos_s[members]  # (m, 3) f64
        a = np.zeros_like(tgt)
        if far_cells:
            fc = np.asarray(far_cells)
            src = np.stack([cx64[fc], cy64[fc], cz64[fc]], axis=1)
            w = gm64[fc]
            d = src[None, :, :] - tgt[:, None, :]
            r2 = (d * d).sum(-1) + eps2
            a += ((w * r2 ** -1.5)[..., None] * d).sum(1)
        for s0, s1 in near_idx:
            src = pos_s[s0:s1]
            w = gm_s[s0:s1]
            d = src[None, :, :] - tgt[:, None, :]
            r2 = (d * d).sum(-1) + eps2
            a += ((w * r2 ** -1.5)[..., None] * d).sum(1)
        acc_s[members] += a
    acc = np.zeros((n, 3), np.float64)
    acc[np.asarray(perm)] = acc_s
    return acc


def _run_df(pos, mass, **kw):
    acc, stats = barneshut_fused_df(
        jnp.asarray(pos, jnp.float64),
        jnp.asarray(mass, jnp.float64),
        G=G,
        softening_sq=EPS2,
        theta=THETA,
        interpret=True,
        return_stats=True,
        **kw,
    )
    assert int(stats["frontier_overflow"]) == 0
    assert int(stats["trimmed_groups"]) == 0
    return np.asarray(acc)


def test_df_bh_matches_f64_twin_uniform():
    rng = np.random.default_rng(5)
    n = 384
    pos = rng.uniform(-1, 1, (n, 3))
    mass = rng.uniform(0.1, 1.0, n)
    got = _run_df(pos, mass, group_size=128)
    want = twin_bh_f64(pos, mass, group_size=128)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-12, rel


def test_df_bh_matches_f64_twin_clustered():
    """Dense core + outliers: over-full terminal cells ship bodies
    exactly in BOTH the kernel and the twin; df parity must hold
    through the near-field-heavy regime too."""
    rng = np.random.default_rng(11)
    core = rng.normal(0, 1e-4, (280, 3))
    outliers = rng.uniform(-1, 1, (40, 3)) * 30.0
    pos = np.vstack([core, outliers])
    mass = rng.uniform(0.1, 1.0, pos.shape[0])
    got = _run_df(pos, mass, group_size=128)
    want = twin_bh_f64(pos, mass, group_size=128)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-12, rel


def test_df_bh_beats_f32_fused_by_orders():
    """The point: ~6 digits past the f32 fused kernel against the same
    twin (same tree, same MAC — only the arithmetic differs)."""
    from nbody_tpu.ops.bh_fused import barneshut_fused

    rng = np.random.default_rng(3)
    n = 384
    pos = rng.uniform(-1, 1, (n, 3))
    mass = rng.uniform(0.1, 1.0, n)
    want = twin_bh_f64(pos, mass, group_size=128)
    got_df = _run_df(pos, mass, group_size=128)
    got_f32 = np.asarray(
        barneshut_fused(
            jnp.asarray(pos, jnp.float32),
            jnp.asarray(mass, jnp.float32),
            G=G,
            softening_sq=EPS2,
            theta=THETA,
            group_size=128,
            interpret=True,
        )
    )
    scale = np.abs(want).max()
    rel_df = np.abs(got_df - want).max() / scale
    rel_f32 = np.abs(got_f32 - want).max() / scale
    assert rel_df < 1e-12
    assert rel_df < rel_f32 * 1e-4, (rel_df, rel_f32)


def test_df_bh_theta_accuracy_vs_direct():
    """Sanity: df BH still carries the theta approximation error vs
    direct fp64 (the df gain is arithmetic, not MAC, precision)."""
    from tests.oracle import accel_exhaustive_f64

    rng = np.random.default_rng(17)
    n = 320
    pos = rng.uniform(-1, 1, (n, 3))
    mass = rng.uniform(0.1, 1.0, n)
    got = _run_df(pos, mass, group_size=128)
    want = accel_exhaustive_f64(pos, mass, G=G)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, rel


def test_df_bh_robust_hybrid():
    """Robust df: tree + exact df rectangle, vs twin-with-same-box +
    fp64 rectangle."""
    rng = np.random.default_rng(23)
    n_core, n_out = 300, 8
    core = rng.uniform(-1, 1, (n_core, 3))
    escapers = rng.normal(0, 1, (n_out, 3)) * 500.0
    pos = np.vstack([core, escapers])
    mass = rng.uniform(0.1, 1.0, pos.shape[0])

    acc, stats = barneshut_fused_robust_df(
        jnp.asarray(pos, jnp.float64),
        jnp.asarray(mass, jnp.float64),
        G=G,
        softening_sq=EPS2,
        theta=THETA,
        group_size=128,
        interpret=True,
        return_stats=True,
    )
    got = np.asarray(acc)
    assert int(stats["frontier_overflow"]) == 0

    # twin of the hybrid: median-centered trimmed box, zero-massed
    # outliers through the tree, fp64 rectangle for their sources.
    # The box math replicates barneshut_fused_robust_df with the SAME
    # jax ops (bitwise-equal center/border/out_idx — a center off by one
    # f32 ulp could flip a borderline MAC decision and cost 1e-3, not
    # 1e-12).
    n = pos.shape[0]
    ld = min(8, auto_ld(n) + 2)
    k = min(max(128, n // 512), n - 1)
    pos32j = jnp.asarray(pos, jnp.float32)
    center = jnp.median(pos32j, axis=0)
    dchev = jnp.max(jnp.abs(pos32j - center), axis=1)
    vals, idx = jax.lax.top_k(dchev, k + 1)
    out_idx = np.asarray(idx[:k])
    border = 2.0 * vals[k] * 1.0001
    mass_bh = np.asarray(mass, np.float64).copy()
    mass_bh[out_idx] = 0.0
    rel_pos = np.asarray(
        jnp.asarray(pos, jnp.float64) - center.astype(jnp.float64)
    )
    want = twin_bh_f64(
        rel_pos, mass_bh, group_size=128, ld=ld, border=border,
    )
    src = np.asarray(pos, np.float64)[out_idx]
    w = G * np.asarray(mass, np.float64)[out_idx]
    d = src[None, :, :] - np.asarray(pos, np.float64)[:, None, :]
    r2 = (d * d).sum(-1) + EPS2
    want = want + ((w * r2 ** -1.5)[..., None] * d).sum(1)

    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-11, rel
