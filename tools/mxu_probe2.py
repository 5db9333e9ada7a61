"""Probe: MXU contraction orientations for the all-pairs kernel (round 3).

Round 2 measured the (BI,BJ)@(BJ,4) j-contraction 1.5x SLOWER than the
pure-VPU kernel: N=4 output columns pad to 128 lanes, wasting 32x MXU
slots.  This probe times the candidate round-3 shapes on hardware:

  A. pure-VPU baseline (ops/pallas_exhaustive._kernel)
  B. exact r2 on VPU + TRANSPOSED contraction (4,BJ)@(BJ,BI) -> (4,BI):
     M=4 pads to 8 sublanes (2x waste), N=BI fills all 128 lanes.
  C. B + Gram-trick r2 (tile-shifted, cross term via (4,BJ)^T(4,BI)
     sublane contraction, K=4 -> 8): VPU work drops to ~5 flops/pair.

Run on the TPU:  python tools/mxu_probe2.py [n]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nbody_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS2 = 0.01


def _kernel_v2t(pit_ref, pjt_ref, rhs_ref, out_ref, *, eps2):
    """Exact r2 on VPU; contraction as (4,BJ)@(BJ,BI) on the MXU."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = pit_ref[0:1, :]  # (1, BI)
    yi = pit_ref[1:2, :]
    zi = pit_ref[2:3, :]
    pjb = jnp.transpose(pjt_ref[:])  # (BJ, 4)
    dx = xi - pjb[:, 0:1]  # (BJ, BI)
    dy = yi - pjb[:, 1:2]
    dz = zi - pjb[:, 2:3]
    r2 = dx * dx + dy * dy + dz * dz + eps2
    inv = lax.rsqrt(r2)
    u = inv * inv * inv  # (BJ, BI)
    part = lax.dot_general(
        rhs_ref[:], u,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (4, BI)
    out_ref[:] += part


def _kernel_v3(pit_ref, pjt_ref, rhs_ref, out_ref, *, eps2):
    """Gram r2 (tile-shifted) + transposed contraction; ~5 VPU flops/pair."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # per-tile-pair shift: midpoint of the two tile centroids
    ci = jnp.mean(pit_ref[:], axis=1, keepdims=True)  # (4, 1), row 3 = 0
    cj = jnp.mean(pjt_ref[:], axis=1, keepdims=True)
    c = 0.5 * (ci + cj)
    pit = pit_ref[:] - c  # (4, BI) shifted
    pjt = pjt_ref[:] - c  # (4, BJ) shifted
    qi = jnp.sum(pit * pit, axis=0, keepdims=True) + eps2  # (1, BI)
    qj = jnp.sum(pjt * pjt, axis=0, keepdims=True)  # (1, BJ)
    cross = lax.dot_general(
        pjt, pit,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (BJ, BI)
    r2 = (jnp.transpose(qj) + qi) - 2.0 * cross
    inv = lax.rsqrt(r2)
    u = inv * inv * inv
    part = lax.dot_general(
        rhs_ref[:], u,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    out_ref[:] += part


def build(kernel, n, bi=1024, bj=1024):
    n_p = -(-n // max(bi, bj)) * max(bi, bj)
    kern = functools.partial(kernel, eps2=EPS2)

    @jax.jit
    def f(pit, pjt, rhs):
        out = pl.pallas_call(
            kern,
            grid=(n_p // bi, n_p // bj),
            in_specs=[
                pl.BlockSpec((4, bi), lambda i, j: (0, i)),
                pl.BlockSpec((4, bj), lambda i, j: (0, j)),
                pl.BlockSpec((4, bj), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((4, bi), lambda i, j: (0, i)),
            out_shape=jax.ShapeDtypeStruct((4, n_p), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=20 * n_p * n_p,
                bytes_accessed=(n_p * 16 * 3),
                transcendentals=n_p * n_p,
            ),
        )(pit, pjt, rhs)
        # epilogue: acc = part[:3] - p_i * (sum u gm)
        return out[:3] - pit[:3] * out[3:4]

    return f, n_p


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rng = np.random.default_rng(0)
    pos = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    mass = rng.uniform(0.04, 1.0, n).astype(np.float32)

    # Morton order (tightens Gram-shift tiles; harmless for the others)
    from nbody_tpu.ops.morton import morton_sort

    perm, _, _ = morton_sort(jnp.asarray(pos), 10)
    perm = np.asarray(perm)
    pos, mass = pos[perm], mass[perm]

    for name, kernel in [("v2t", _kernel_v2t), ("v3_gram", _kernel_v3)]:
        f, n_p = build(kernel, n)
        pit = jnp.asarray(
            np.concatenate([pos.T, np.zeros((1, n), np.float32)], 0)
        )
        pit = jnp.pad(pit, ((0, 0), (0, n_p - n)))
        rhs = jnp.asarray(
            np.concatenate([pos.T * mass, mass[None]], 0).astype(np.float32)
        )
        rhs = jnp.pad(rhs, ((0, 0), (0, n_p - n)))
        acc = f(pit, pit, rhs)
        np.asarray(acc[:, :1])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            acc = f(pit, pit, rhs)
            np.asarray(acc[:, :1])
            best = min(best, time.perf_counter() - t0)
        pps = n * n / best
        print(f"{name}: {best*1e3:.1f} ms  {pps:.3e} pairs/s")

        # accuracy vs f64 direct on a sample
        idx = np.arange(0, n, max(1, n // 256))
        p64 = pos.astype(np.float64)
        d = p64[idx, None, :] - p64[None, :, :]
        r2 = (d * d).sum(-1) + EPS2
        w = mass.astype(np.float64)[None, :] * r2 ** -1.5
        ref = -(w[..., None] * d).sum(1)
        got = np.asarray(acc).T[idx]
        scale = np.abs(ref).max()
        err = np.abs(got - ref).max() / scale
        print(f"  max rel force err vs f64: {err:.2e}")

    # baseline
    from nbody_tpu.ops.pallas_exhaustive import pallas_accelerations

    pj = jnp.asarray(pos)
    mj = jnp.asarray(mass)
    a0 = pallas_accelerations(pj, mj)
    np.asarray(a0[:1])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        a0 = pallas_accelerations(pj, mj)
        np.asarray(a0[:1])
        best = min(best, time.perf_counter() - t0)
    print(f"baseline vpu: {best*1e3:.1f} ms  {n*n/best:.3e} pairs/s")


if __name__ == "__main__":
    main()
