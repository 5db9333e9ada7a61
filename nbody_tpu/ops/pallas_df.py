"""Compensated-f32x2 ("double-float") all-pairs kernels: fp64-grade
forces and potential energy at Pallas/VPU speed.

The reference computes in `double` end-to-end (serial/exhaustive.c:17-21
`double` Entity fields; cuda/barnes-hut.cu:22-27 `double*` device
arrays), and its best GPU all-pairs number — exh_cuda 8.0e8 pairs/s,
tests_result.txt:13 — is an fp64 number.  TPU v5e has no fp64 ALUs; the
XLA fallback emulates f64 per-op at eager-op granularity, far off the
pairs/s budget.  This module instead re-architects the fp64 contract the
TPU way: every coordinate is carried as an UNEVALUATED SUM of two f32s
(hi + lo, the classic double-float of Dekker 1971 / GPU-gems df64), all
pair arithmetic runs on the VPU in ~47-bit effective precision
(unit roundoff ~3.6e-15), and the result is recombined to f64 outside
the kernel.  Per-pair cost is ~290 VPU flops + 1 rsqrt vs the f32
kernel's ~22 — a priced ~13x, still ~1e10 pairs/s class on v5e, ~12x
the reference's fp64 GPU number.

Layouts mirror ops/pallas_exhaustive.py: the i-side reads (BI, 8)
[xhi xlo yhi ylo zhi zlo 0 0] so per-coordinate columns are (BI, 1)
sublane vectors; the j-side reads (8, BJ) rows
[xhi xlo yhi ylo zhi zlo gmhi gmlo]; the broadcast difference is the
(BI, BJ) pair matrix with zero in-kernel transposes.  G*m rides as a
df pair too — a single-f32 gm would put a 1e-7 relative floor under
every pair force and defeat the representation.

No FMA is exposed through Mosaic, so two_prod uses the Dekker split
(exact for |a| < 2^115, i.e. any physical coordinate).  The rsqrt is
one f32 seed + one df Newton step with a second-order correction term:
relative error a few units of 2^-48.

Self-pairs: dx = 0 exactly and r2 = eps2, so they contribute zero
(eps2 > 0), matching the reference force kernel's self-term-zero
construction (serial/exhaustive.c:163-179).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.core import constants

_SPLITTER = 4097.0  # 2^12 + 1: Dekker split point for f32 (24-bit mantissa)


def _i0(*_):
    """Index-map zero as explicit i32: the df paths run under x64, where
    a bare `0` literal traces as i64 and Mosaic rejects the mixed-type
    index map (`func.return (i32, i64)` legalization failure)."""
    return jnp.int32(0)


# ---------------------------------------------------------------------------
# double-float primitives (all operate on f32 arrays, elementwise)
# ---------------------------------------------------------------------------

def _two_sum(a, b):
    """Exact a + b = s + e (Knuth, 6 flops, no magnitude precondition)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """Exact a + b = s + e, REQUIRES |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Dekker split: a = hi + lo with hi, lo having <= 12 mantissa bits."""
    c = _SPLITTER * a
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """Exact a * b = p + e (Dekker, ~17 flops without FMA)."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def _df_add(ahi, alo, bhi, blo):
    """(a + b) renormalized (~11 flops; error O(eps^2))."""
    s, e = _two_sum(ahi, bhi)
    e = e + (alo + blo)
    return _quick_two_sum(s, e)


def _df_mul(ahi, alo, bhi, blo):
    """(a * b) renormalized (~22 flops without FMA)."""
    p, e = _two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return _quick_two_sum(p, e)


def _df_sqr(ahi, alo):
    """(a * a) renormalized (one split cheaper than _df_mul)."""
    p = ahi * ahi
    hi, lo = _split(ahi)
    e = ((hi * hi - p) + 2.0 * hi * lo) + lo * lo
    e = e + 2.0 * (ahi * alo)
    return _quick_two_sum(p, e)


def _df_rsqrt(ahi, alo):
    """1/sqrt(a) to df precision: f32 seed + one df Newton step.

    y = y0 * (1 + e/2 + 3 e^2 / 8),  e = 1 - a * y0^2 (computed in df —
    the cancellation is the whole point).  |e| ~ 1e-7 so the dropped e^3
    term is ~1e-21; the result is good to a few units of 2^-48."""
    y0 = lax.rsqrt(ahi)
    sq_hi, sq_lo = _two_prod(y0, y0)
    t_hi, t_lo = _df_mul(ahi, alo, sq_hi, sq_lo)
    # e = 1 - t, exactly in df (t ~ 1, classic cancellation)
    e_hi, e_lo = _df_add(1.0, 0.0, -t_hi, -t_lo)
    e = e_hi + e_lo
    corr = y0 * e * (0.5 + 0.375 * e)
    return _quick_two_sum(y0, corr)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _df_lane_reduce(hi, lo):
    """(BI, W) df values -> (BI, 1) df sum via a binary-halving tree of
    df_adds (W a power of two).  A plain f32 sum of the hi parts loses
    the partial-sum roundings — measured 1.4e-7 relative at 300 bodies,
    i.e. the whole df gain — while the tree keeps every combine
    compensated for ~11 flops/pair extra (~+12% kernel cost)."""
    w = hi.shape[1]
    assert w & (w - 1) == 0, "lane reduce needs a power-of-two width"
    while w > 1:
        h = w // 2
        hi, lo = _df_add(hi[:, :h], lo[:, :h], hi[:, h:w], lo[:, h:w])
        w = h
    return hi, lo


def _df_sublane_reduce(hi, lo):
    """(H, 1) df values -> (1, 1) df sum, same tree over sublanes."""
    h = hi.shape[0]
    assert h & (h - 1) == 0
    while h > 1:
        m = h // 2
        hi, lo = _df_add(hi[:m, :], lo[:m, :], hi[m:h, :], lo[m:h, :])
        h = m
    return hi, lo


def _df_cols(ref, k):
    """i-side df coordinate k as ((BI, 1), (BI, 1))."""
    return ref[:, 2 * k : 2 * k + 1], ref[:, 2 * k + 1 : 2 * k + 2]


def _df_rows(ref, k):
    """j-side df coordinate k as ((1, BJ), (1, BJ))."""
    return ref[2 * k : 2 * k + 1, :], ref[2 * k + 1 : 2 * k + 2, :]


def _force_kernel(pi_ref, pj_ref, out_ref, *, eps2_hi: float, eps2_lo: float):
    """df all-pairs gravity tile: out (BI, 8) df accumulator
    [axhi axlo ayhi aylo azhi azlo 0 0] summed over the j grid axis."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = []
    for k in range(3):
        ihi, ilo = _df_cols(pi_ref, k)
        jhi, jlo = _df_rows(pj_ref, k)
        d.append(_df_add(jhi, jlo, -ihi, -ilo))  # (BI, BJ) df
    r2 = _df_sqr(*d[0])
    r2 = _df_add(*r2, *_df_sqr(*d[1]))
    r2 = _df_add(*r2, *_df_sqr(*d[2]))
    r2 = _df_add(*r2, eps2_hi, eps2_lo)

    y = _df_rsqrt(*r2)                     # r^-1
    y3 = _df_mul(*_df_sqr(*y), *y)         # r^-3
    gm = _df_rows(pj_ref, 3)
    w = _df_mul(*gm, *y3)                  # G m_j r^-3

    cols = []
    for k in range(3):
        fhi, flo = _df_mul(*w, *d[k])
        cols.append(_df_lane_reduce(fhi, flo))  # (BI, 1) df
    zero = jnp.zeros_like(cols[0][0])
    tile_hi = jnp.concatenate(
        [cols[0][0], cols[1][0], cols[2][0], zero], axis=1
    )  # (BI, 4) — [x y z 0] his
    tile_lo = jnp.concatenate(
        [cols[0][1], cols[1][1], cols[2][1], zero], axis=1
    )
    # out layout [hi_x hi_y hi_z 0 | lo_x lo_y lo_z 0]: contiguous lane
    # slices (strided lane access is a Mosaic anti-pattern)
    acc_hi = out_ref[:, 0:4]
    acc_lo = out_ref[:, 4:8]
    s, e = _two_sum(acc_hi, tile_hi)
    e = e + (acc_lo + tile_lo)
    hi, lo = _quick_two_sum(s, e)
    out_ref[:] = jnp.concatenate([hi, lo], axis=1)


def _pe_kernel(pi_ref, pj_ref, out_ref):
    """df PE tile: sum of -m_i m_j / r (r == 0 guarded to 0, the
    reference diagonal convention) over a (BI, BJ) block, df-accumulated
    into a (1, 128) VMEM row (lane 0:2 = hi, lo)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    d = []
    for k in range(3):
        ihi, ilo = _df_cols(pi_ref, k)
        jhi, jlo = _df_rows(pj_ref, k)
        d.append(_df_add(jhi, jlo, -ihi, -ilo))
    r2 = _df_sqr(*d[0])
    r2 = _df_add(*r2, *_df_sqr(*d[1]))
    r2 = _df_add(*r2, *_df_sqr(*d[2]))
    nz = r2[0] > 0.0
    safe_hi = jnp.where(nz, r2[0], 1.0)
    y = _df_rsqrt(safe_hi, jnp.where(nz, r2[1], 0.0))  # r^-1
    mi = _df_cols(pi_ref, 3)  # m_i (df) rides the i pad columns
    mj = _df_rows(pj_ref, 3)
    mm = _df_mul(*mi, *mj)
    phi, plo = _df_mul(*mm, *y)
    phi = jnp.where(nz, phi, 0.0)
    plo = jnp.where(nz, plo, 0.0)

    # reduce the (BI, BJ) tile to a scalar df with the compensated tree
    # (lanes, then sublanes), then df-accumulate into lanes 0/1
    rh, rl = _df_lane_reduce(phi, plo)      # (BI, 1)
    sh, sl = _df_sublane_reduce(rh, rl)     # (1, 1)
    acc_hi = out_ref[0, 0]
    acc_lo = out_ref[0, 1]
    s, e = _two_sum(acc_hi, sh[0, 0])
    e = e + (acc_lo + sl[0, 0])
    hi, lo = _quick_two_sum(s, e)
    # place (hi, lo) at lanes 0/1 without a scatter (not lowerable)
    lane = lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] = jnp.where(lane == 0, hi, jnp.where(lane == 1, lo, 0.0))


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _df_split_f64(x):
    """f64 array -> (hi, lo) f32 pair, hi + lo == x to f32x2 precision."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def _interleave(hi, lo):
    """(N,) pairs -> (N, 2) -> caller reshapes; keeps columns adjacent."""
    return jnp.stack([hi, lo], axis=-1)


def _pad_rows(x, n):
    return jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))


@functools.partial(
    jax.jit,
    static_argnames=("G", "softening_sq", "block_i", "block_j", "interpret"),
)
def pallas_rect_accelerations_df(
    pos_i: jax.Array,
    pos_j: jax.Array,
    mass_j: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    block_i: int = 512,
    block_j: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """fp64-grade acc for pos_i (Ni, 3) against sources pos_j/mass_j,
    computed as compensated f32x2 on the VPU.  Inputs any float dtype
    (f64 recommended); returns (Ni, 3) f64 when x64 is enabled, else f32.

    Mirrors pallas_exhaustive.pallas_rect_accelerations (the rectangular
    multi-chip building block)."""
    ni, nj = pos_i.shape[0], pos_j.shape[0]
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pos_i = pos_i.astype(f64)
    pos_j = pos_j.astype(f64)
    gm = jnp.asarray(G, f64) * mass_j.astype(f64)

    bi = min(block_i, max(128, 1 << (ni - 1).bit_length()))
    bj = min(block_j, max(128, 1 << (nj - 1).bit_length()))
    ni_p = ((ni + bi - 1) // bi) * bi
    nj_p = ((nj + bj - 1) // bj) * bj

    ihi, ilo = _df_split_f64(pos_i)  # (Ni, 3) each
    pi = _pad_rows(
        jnp.concatenate(
            [
                _interleave(ihi, ilo).reshape(ni, 6),
                jnp.zeros((ni, 2), jnp.float32),
            ],
            axis=1,
        ),
        ni_p,
    )  # (Ni_p, 8)

    jhi, jlo = _df_split_f64(pos_j)
    gmhi, gmlo = _df_split_f64(gm)
    pj = _pad_rows(
        jnp.concatenate(
            [
                _interleave(jhi, jlo).reshape(nj, 6),
                _interleave(gmhi, gmlo).reshape(nj, 2),
            ],
            axis=1,
        ),
        nj_p,
    ).T.copy()  # (8, Nj_p); padded sources carry gm = 0 -> inert

    import numpy as np

    eps2 = float(softening_sq)
    eps2_hi = float(np.float32(eps2))
    eps2_lo = float(np.float32(eps2 - eps2_hi))

    grid = (ni_p // bi, nj_p // bj)
    out = pl.pallas_call(
        functools.partial(
            _force_kernel, eps2_hi=eps2_hi, eps2_lo=eps2_lo,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bi, 8), lambda i, j: (i, _i0())),
            pl.BlockSpec((8, bj), lambda i, j: (_i0(), j)),
        ],
        out_specs=pl.BlockSpec((bi, 8), lambda i, j: (i, _i0())),
        out_shape=jax.ShapeDtypeStruct((ni_p, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=290 * ni_p * nj_p,
            bytes_accessed=(ni_p * 8 + nj_p * 8 + ni_p * 8) * 4,
            transcendentals=ni_p * nj_p,
        ),
        interpret=interpret,
    )(pi, pj)
    hi = out[:ni, 0:3].astype(f64)
    lo = out[:ni, 4:7].astype(f64)
    return hi + lo


def pallas_accelerations_df(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    block_i: int = 512,
    block_j: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Square fp64-grade all-pairs accelerations (ForceFn signature)."""
    return pallas_rect_accelerations_df(
        pos, pos, mass,
        G=G, softening_sq=softening_sq,
        block_i=block_i, block_j=block_j, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("G", "block", "interpret"))
def pallas_potential_energy_df(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """fp64-grade PE (reference conventions: unsoftened, r == 0 guarded,
    full symmetric sum halved) as compensated f32x2 — the --dtype f64
    large-N energy path (common/get_energy.c:23-46)."""
    n = pos.shape[0]
    f64 = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    b = min(block, max(128, 1 << (n - 1).bit_length()))
    n_p = ((n + b - 1) // b) * b

    phi, plo = _df_split_f64(pos.astype(f64))
    mhi, mlo = _df_split_f64(mass.astype(f64))
    rows = _pad_rows(
        jnp.concatenate(
            [
                _interleave(phi, plo).reshape(n, 6),
                _interleave(mhi, mlo).reshape(n, 2),
            ],
            axis=1,
        ),
        n_p,
    )  # (N_p, 8): [xhi xlo yhi ylo zhi zlo mhi mlo]; pads have m = 0
    cols = rows.T.copy()

    grid = (n_p // b, n_p // b)
    out = pl.pallas_call(
        _pe_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 8), lambda i, j: (i, _i0())),
            pl.BlockSpec((8, b), lambda i, j: (_i0(), j)),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i, j: (_i0(), _i0())),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(rows, cols)
    total = out[0, 0].astype(f64) + out[0, 1].astype(f64)
    return jnp.asarray(-0.5 * G, f64) * total
