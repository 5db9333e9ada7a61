"""Tiled Pallas all-pairs gravity kernel.

TPU re-architecture of the CUDA shared-memory scheme
(cuda/exhaustive.cu:273-338: one thread per i-body, j-bodies streamed
through a block-wide shared-memory tile with __syncthreads barriers).  On
TPU the same dataflow becomes: an i-block of bodies resident in VMEM, a 2-D
grid over (i-blocks, j-tiles), and the (BI, BJ) pair matrix evaluated on the
VPU with the output block accumulated in VMEM across the j dimension of the
grid.  Pallas's pipeline machinery double-buffers the j-tile HBM->VMEM
streams automatically — the hand-rolled equivalent of the CUDA kernel's
tile loop.

Layouts: the i-side reads positions as (N, 4) [x y z Gm] so per-coordinate
columns are (BI, 1) sublane vectors; the j-side reads the transpose (4, N)
so coordinates are (1, BJ) lane vectors; their broadcast difference is the
(BI, BJ) pair matrix with zero in-kernel transposes.

Physics identical to nbody_tpu.ops.exhaustive (and the reference force
kernels): softened inverse-cube weights, self-term zero by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.core import constants


def _pair_weights(pi_ref, pj_ref, eps2, per_body: bool):
    """The (BI, BJ) softened inverse-cube weight matrix and displacements.

    per_body: the softening rides the operands instead of a constant —
    the i-side's otherwise-unused pad column 3 carries eps2_i/2 and the
    j-side a 5th row with eps2_j/2 (both pre-halved at pack time), so
    the symmetric-mean pairwise eps2 of ops/exhaustive._pair_eps2 costs
    ONE extra broadcast add per pair and zero extra memory tiles (the
    4->5 sublane dim was padding to 8 anyway)."""
    xi = pi_ref[:, 0:1]  # (BI, 1)
    yi = pi_ref[:, 1:2]
    zi = pi_ref[:, 2:3]

    xj = pj_ref[0:1, :]  # (1, BJ)
    yj = pj_ref[1:2, :]
    zj = pj_ref[2:3, :]
    gmj = pj_ref[3:4, :]

    dx = xj - xi  # (BI, BJ)
    dy = yj - yi
    dz = zj - zi
    if per_body:
        eps2 = pi_ref[:, 3:4] + pj_ref[4:5, :]  # (BI, BJ) halves sum
    r2 = dx * dx + dy * dy + dz * dz + eps2
    inv_r = lax.rsqrt(r2)
    w = gmj * (inv_r * inv_r * inv_r)  # (BI, BJ)
    return w, dx, dy, dz


def _kernel(pi_ref, pj_ref, out_ref, *, eps2: float, per_body: bool):
    """VPU-only variant: three weighted lane reductions."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w, dx, dy, dz = _pair_weights(pi_ref, pj_ref, eps2, per_body)
    ax = jnp.sum(w * dx, axis=1, keepdims=True)  # (BI, 1)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    acc = jnp.concatenate([ax, ay, az, jnp.zeros_like(ax)], axis=1)  # (BI, 4)
    out_ref[:] += acc


def _kernel_mxu(pi_ref, pj_ref, pjt_ref, out_ref, *, eps2: float,
                per_body: bool):
    """MXU variant: the weighted sums become one (BI,BJ)@(BJ,4) matmul.

    pjt_ref columns are [x, y, z, 1], so
        partial = W @ pjt  =  [sum w x_j, sum w y_j, sum w z_j, sum w]
    and   acc   = partial[:, :3] - p_i * partial[:, 3].
    The displacement/softening arithmetic stays on the VPU in exact form (no
    |r|^2 expansion, so no cancellation); only the final j-contraction rides
    the MXU.  This is the re-association the jnp 'mxu' mode uses
    (nbody_tpu/ops/exhaustive.py), applied after exact r2.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w, _, _, _ = _pair_weights(pi_ref, pj_ref, eps2, per_body)
    partial = jax.lax.dot_general(
        w,
        pjt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (BI, 4)
    # col 3: zero padding, or eps2_i/2 in per_body mode — either way it
    # only pollutes output column 3, which the wrapper drops ([:, :3])
    pos_i = pi_ref[:, :]  # (BI, 4)
    out_ref[:] += partial - pos_i * partial[:, 3:4]


def _pad_to(x, n, axis=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


@functools.partial(
    jax.jit,
    static_argnames=(
        "G", "softening_sq", "block_i", "block_j", "use_mxu", "interpret"
    ),
)
def pallas_rect_accelerations(
    pos_i: jax.Array,
    pos_j: jax.Array,
    mass_j: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    block_i: int = 1024,
    block_j: int = 1024,
    use_mxu: bool = False,
    interpret: bool = False,
    eps2_i: jax.Array | None = None,
    eps2_all: jax.Array | None = None,
) -> jax.Array:
    """acc for each body in pos_i (Ni, 3) against all sources pos_j/mass_j.

    The rectangular form is the multi-chip building block: each chip owns an
    i-shard and streams the (all-gathered) j-side.  Returns (Ni, 3) f32.

    `eps2_i` (Ni,) / `eps2_all` (Nj,) switch on symmetric-mean per-body
    softening (must be given together; see _pair_weights).
    """
    ni, nj = pos_i.shape[0], pos_j.shape[0]
    dtype = jnp.float32
    pos_i = pos_i.astype(dtype)
    if (eps2_i is None) != (eps2_all is None):
        raise ValueError("eps2_i and eps2_all must be given together")
    per_body = eps2_i is not None

    ni_p = max(block_i, ((ni + block_i - 1) // block_i) * block_i)
    nj_p = max(block_j, ((nj + block_j - 1) // block_j) * block_j)

    # i-side (Ni, 4): x y z, then a pad col that keeps sublane tiling
    # happy — or carries eps2_i/2 in per-body mode (kernel docstring)
    icol = (
        0.5 * eps2_i.astype(dtype)[:, None]
        if per_body else jnp.zeros((ni, 1), dtype)
    )
    pi = _pad_to(jnp.concatenate([pos_i, icol], axis=1), ni_p, axis=0)
    # j-side (4|5, Nj): x y z Gm [eps2_j/2] — padded sources have Gm = 0,
    # hence inert (any eps value is harmless on a zero-mass source).
    gm = (jnp.asarray(G, dtype) * mass_j).astype(dtype)
    jrows = [pos_j.astype(dtype).T, gm[None, :]]
    if per_body:
        jrows.append(0.5 * eps2_all.astype(dtype)[None, :])
    pj = _pad_to(jnp.concatenate(jrows, axis=0), nj_p, axis=1)
    jr = pj.shape[0]

    grid = (ni_p // block_i, nj_p // block_j)
    eps2 = float(softening_sq)

    in_specs = [
        pl.BlockSpec((block_i, 4), lambda i, j: (i, 0)),
        pl.BlockSpec((jr, block_j), lambda i, j: (0, j)),
    ]
    operands = [pi, pj]
    if use_mxu:
        # (Nj, 4) with columns [x, y, z, 1] for the in-kernel matmul.
        pjt = _pad_to(
            jnp.concatenate(
                [pos_j.astype(dtype), jnp.ones((nj, 1), dtype)], axis=1
            ),
            nj_p,
            axis=0,
        )
        in_specs.append(pl.BlockSpec((block_j, 4), lambda i, j: (j, 0)))
        operands.append(pjt)
        kernel = functools.partial(_kernel_mxu, eps2=eps2, per_body=per_body)
    else:
        kernel = functools.partial(_kernel, eps2=eps2, per_body=per_body)

    flops_per_pair = 20
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_i, 4), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ni_p, 4), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * ni_p * nj_p,
            bytes_accessed=(ni_p * 4 + nj_p * 4 + ni_p * 4) * 4,
            transcendentals=ni_p * nj_p,
        ),
        interpret=interpret,
    )(*operands)
    return out[:ni, :3]


def pallas_accelerations(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    block_i: int = 1024,
    block_j: int = 1024,
    use_mxu: bool = False,
    interpret: bool = False,
    eps2_per_body: jax.Array | None = None,
) -> jax.Array:
    """Square all-pairs accelerations (ForceFn signature)."""
    return pallas_rect_accelerations(
        pos,
        pos,
        mass,
        G=G,
        softening_sq=softening_sq,
        block_i=block_i,
        block_j=block_j,
        use_mxu=use_mxu,
        interpret=interpret,
        eps2_i=eps2_per_body,
        eps2_all=eps2_per_body,
    )
