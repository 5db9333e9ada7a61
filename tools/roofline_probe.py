#!/usr/bin/env python
"""Roofline probes for the all-pairs kernel redesign (round 3).

VERDICT item 2 asks for a split-precision / MXU all-pairs at >=5e11
pairs/s; before building one, price the candidate formulations at
production shape (a gridded 64k x 64k problem — single fixed-shape
pallas_call invocations are launch-overhead dominated at ~0.04 ms and
tell you nothing).

  a. production VPU 13-op kernel (baseline; bench.py measures 1.74e11)
  b. gram-hybrid: in-kernel (BI,8)@(8,BJ) dot_general supplies xi.xj,
     VPU assembles r2 = ni + nj - 2g and accumulates 4 moments
     (s0, sx, sy, sz) — 10 VPU ops/pair + MXU work that may overlap.
     Tested at HIGHEST (6-pass f32) and DEFAULT (1-pass bf16) gram
     precision.
  c. moment-matmul: VPU computes w only (7 ops), both the gram AND the
     j-contraction ride the MXU ((BI,BJ)@(BJ,4), N=4 lanes useful).

Run: python tools/roofline_probe.py [n]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.core.cache import enable_compilation_cache

EPS2 = 1e-6
BI = 1024
BJ = 1024


def _kernel_vpu(pi_ref, pj_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xi = pi_ref[:, 0:1]
    yi = pi_ref[:, 1:2]
    zi = pi_ref[:, 2:3]
    xj = pj_ref[0:1, :]
    yj = pj_ref[1:2, :]
    zj = pj_ref[2:3, :]
    gm = pj_ref[3:4, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz + EPS2
    inv = lax.rsqrt(r2)
    w = gm * (inv * inv * inv)
    ax = jnp.sum(w * dx, axis=1, keepdims=True)
    ay = jnp.sum(w * dy, axis=1, keepdims=True)
    az = jnp.sum(w * dz, axis=1, keepdims=True)
    out_ref[:] += jnp.concatenate([ax, ay, az, jnp.zeros_like(ax)], axis=1)


def _kernel_gram(pi8_ref, pjt_ref, pj_ref, out_ref, *, precision):
    """pi8 rows: [x y z |x|^2+eps2 0 0 0 0]; pjt: (8, BJ) rows [x y z 0...];
    pj: (5, BJ) rows [x y z Gm |xj|^2]."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g = jax.lax.dot_general(
        pi8_ref[:, :], pjt_ref[:, :], (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )  # (BI, BJ) = xi.xj  (col 3 of pi8 * row 3 of pjt contribute 0)
    xj = pj_ref[0:1, :]
    yj = pj_ref[1:2, :]
    zj = pj_ref[2:3, :]
    gm = pj_ref[3:4, :]
    nj2 = pj_ref[4:5, :]
    r2 = pi8_ref[:, 3:4] + (nj2 - 2.0 * g)
    inv = lax.rsqrt(r2)
    w = gm * (inv * inv * inv)
    s0 = jnp.sum(w, axis=1, keepdims=True)
    sx = jnp.sum(w * xj, axis=1, keepdims=True)
    sy = jnp.sum(w * yj, axis=1, keepdims=True)
    sz = jnp.sum(w * zj, axis=1, keepdims=True)
    out_ref[:] += jnp.concatenate([sx, sy, sz, s0], axis=1)


def _kernel_gram_mm(pi8_ref, pjt_ref, pjm_ref, pj_ref, out_ref, *, precision):
    """Gram for r2 AND matmul j-contraction: VPU does only w (7 ops)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    g = jax.lax.dot_general(
        pi8_ref[:, :], pjt_ref[:, :], (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    gm = pj_ref[3:4, :]
    nj2 = pj_ref[4:5, :]
    r2 = pi8_ref[:, 3:4] + (nj2 - 2.0 * g)
    inv = lax.rsqrt(r2)
    w = gm * (inv * inv * inv)
    out_ref[:] += jax.lax.dot_general(
        w, pjm_ref[:, :], (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )  # (BI, 4): [sx sy sz s0] with pjm cols [x y z 1]


def _finish(out, pi):
    # acc = [sx,sy,sz] - pos_i * s0
    out = np.asarray(out)
    pi = np.asarray(pi)
    return out[:, :3] - pi[:, :3] * out[:, 3:4]


def _time(run, name, pairs):
    out = run()
    np.asarray(out)[:1]
    t0 = time.perf_counter()
    out = run()
    np.asarray(out)[:1]
    dt = time.perf_counter() - t0
    print(f"{name:40s} {dt*1e3:9.2f} ms  {pairs/dt:.3e} pairs/s")


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rng = np.random.default_rng(0)
    pos = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    gm = rng.uniform(0.1, 1, (n,)).astype(np.float32)
    grid = (n // BI, n // BJ)
    pairs = float(n) * n

    pi = jnp.asarray(np.pad(pos, ((0, 0), (0, 1))))
    pj = jnp.asarray(
        np.concatenate(
            [pos.T, gm[None, :], (pos**2).sum(1)[None, :]], axis=0
        )
    )  # (5, N)
    ni2 = (pos**2).sum(1) + EPS2
    pi8 = jnp.asarray(
        np.pad(
            np.concatenate([pos, ni2[:, None]], axis=1), ((0, 0), (0, 4))
        )
    )  # (N, 8)
    pjt = jnp.asarray(np.pad(pos.T, ((0, 5), (0, 0))))  # (8, N)
    pjm = jnp.asarray(
        np.concatenate([pos, np.ones((n, 1), np.float32)], axis=1)
    )  # (N, 4)

    cp = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))

    a = pl.pallas_call(
        _kernel_vpu,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BI, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((5, BJ), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((BI, 4), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        compiler_params=cp,
    )
    run_a = jax.jit(lambda: a(pi, pj))
    _time(run_a, "a. VPU 13-op (production)", pairs)
    ref = _finish(run_a(), pi)

    for prec, tag in (
        (lax.Precision.HIGHEST, "f32"),
        (lax.Precision.DEFAULT, "bf16"),
    ):
        b = pl.pallas_call(
            functools.partial(_kernel_gram, precision=prec),
            grid=grid,
            in_specs=[
                pl.BlockSpec((BI, 8), lambda i, j: (i, 0)),
                pl.BlockSpec((8, BJ), lambda i, j: (0, j)),
                pl.BlockSpec((5, BJ), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((BI, 4), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
            compiler_params=cp,
        )
        run_b = jax.jit(lambda b=b: b(pi8, pjt, pj))
        _time(run_b, f"b. gram-hybrid ({tag})", pairs)
        acc = _finish(run_b(), pi)
        err = np.abs(acc - ref) / (np.abs(ref) + 1e-30)
        print(f"     max rel err vs a: {err.max():.2e}")

    for prec, tag in (
        (lax.Precision.HIGHEST, "f32"),
        (lax.Precision.DEFAULT, "bf16"),
    ):
        c = pl.pallas_call(
            functools.partial(_kernel_gram_mm, precision=prec),
            grid=grid,
            in_specs=[
                pl.BlockSpec((BI, 8), lambda i, j: (i, 0)),
                pl.BlockSpec((8, BJ), lambda i, j: (0, j)),
                pl.BlockSpec((BJ, 4), lambda i, j: (j, 0)),
                pl.BlockSpec((5, BJ), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((BI, 4), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
            compiler_params=cp,
        )
        run_c = jax.jit(lambda c=c: c(pi8, pjt, pjm, pj))
        _time(run_c, f"c. gram + moment-matmul ({tag})", pairs)
        acc = _finish(run_c(), pi)
        err = np.abs(acc - ref) / (np.abs(ref) + 1e-30)
        print(f"     max rel err vs a: {err.max():.2e}")


if __name__ == "__main__":
    main()
