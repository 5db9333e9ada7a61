"""Exhaustive O(N^2) all-pairs gravity — XLA (jnp) implementations.

Physics contract (identical to every reference force kernel, e.g.
serial/exhaustive.c:155-181, cuda/exhaustive.cu:273-338):

    a_i = sum_j  G * m_j * (p_j - p_i) * (|p_j - p_i|^2 + eps2)^(-3/2)

The sum *includes* j == i: the softened self-term is zero by construction
because the displacement vector is zero (serial/exhaustive.c:165-179), so no
masking is needed — which is exactly what makes this formulation
TPU-friendly (no divergent control flow at all).

Three evaluation strategies:

* ``direct``   — full (N, N, 3) broadcast.  The parity oracle; O(N^2)
  memory, use for N up to a few thousand.
* ``chunked``  — i-bodies processed in chunks via lax.map; j runs over all
  bodies per chunk.  O(chunk * N) memory.  This is the structural analog of
  the CUDA shared-memory j-tiling (cuda/exhaustive.cu:303-331): a resident
  i-block streams all j bodies.
* ``mxu``      — same chunking, but |r|^2 is expanded as
  |p_i|^2 + |p_j|^2 - 2 p_i.p_j and the weighted sum is re-associated as
      a_i = W @ P  -  p_i * rowsum(W),        W_ij = G m_j (r2+eps)^{-3/2}
  so both N^2-sized contractions run on the MXU (K=3 matmuls) and the VPU
  only computes ~8 flops per pair.  Slightly less accurate for very close
  pairs (cancellation in the expanded |r|^2), which the softening floor
  masks in practice.

The Pallas kernel in nbody_tpu.ops.pallas_exhaustive is the hand-tiled
production path; these are the oracle and the always-available fallback.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.core import constants


def _inv_r3(r2, dtype):
    """(r2)^(-3/2) with dtype-appropriate evaluation.

    fp32 uses rsqrt (one Newton-refined hardware op) cubed; fp64 parity mode
    uses pow(-1.5) like the reference (serial/exhaustive.c:173)."""
    if dtype == jnp.float64:
        return r2 ** -1.5
    inv_r = lax.rsqrt(r2)
    return inv_r * inv_r * inv_r


def direct_accelerations(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
) -> jax.Array:
    """Full-broadcast all-pairs accelerations — the parity oracle."""
    dtype = pos.dtype
    d = pos[None, :, :] - pos[:, None, :]  # (N, N, 3): p_j - p_i
    r2 = jnp.sum(d * d, axis=-1) + jnp.asarray(softening_sq, dtype)
    w = _inv_r3(r2, dtype) * (jnp.asarray(G, dtype) * mass)[None, :]
    return jnp.einsum("ij,ijk->ik", w, d)


def _chunk_direct(pos_i, pos, gm, softening_sq):
    dtype = pos.dtype
    d = pos[None, :, :] - pos_i[:, None, :]  # (C, N, 3)
    r2 = jnp.sum(d * d, axis=-1) + jnp.asarray(softening_sq, dtype)
    w = _inv_r3(r2, dtype) * gm[None, :]
    return jnp.einsum("cj,cjk->ck", w, d)


def _chunk_mxu(pos_i, pos, gm, pj_sq, softening_sq):
    dtype = pos.dtype
    # r2_ij = |p_i|^2 + |p_j|^2 - 2 p_i . p_j   (MXU for the dot term).
    # precision=HIGHEST: TPU matmuls default to bf16 passes, which injects
    # ~4e-3 relative force error — far beyond the 1e-3 energy-drift budget.
    pi_sq = jnp.sum(pos_i * pos_i, axis=-1)  # (C,)
    dots = jnp.dot(
        pos_i, pos.T, precision=lax.Precision.HIGHEST, preferred_element_type=dtype
    )  # (C, N)
    r2 = pi_sq[:, None] + pj_sq[None, :] - 2.0 * dots + jnp.asarray(
        softening_sq, dtype
    )
    # The true squared distance is >= 0, so r2 + eps2 >= eps2; cancellation
    # in the expanded form can dip below that floor and blow up r^-3 —
    # clamp to the softening floor.
    r2 = jnp.maximum(r2, jnp.asarray(softening_sq, dtype))
    w = _inv_r3(r2, dtype) * gm[None, :]  # (C, N)
    # a_i = sum_j w_ij (p_j - p_i) = W @ P - p_i * rowsum(W)
    acc = jnp.dot(
        w, pos, precision=lax.Precision.HIGHEST, preferred_element_type=dtype
    )
    return acc - pos_i * jnp.sum(w, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("mode", "chunk", "G", "softening_sq"))
def rect_accelerations(
    pos_i: jax.Array,
    pos_all: jax.Array,
    mass_all: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    mode: str = "auto",
    chunk: int = 1024,
) -> jax.Array:
    """Accelerations of pos_i (Ni, 3) targets against all sources — the
    rectangular building block the sharded path evaluates per chip."""
    ni = pos_i.shape[0]
    dtype = pos_i.dtype
    gm = jnp.asarray(G, dtype) * mass_all
    if mode == "auto":
        mode = "direct" if ni * pos_all.shape[0] <= 2048 * 2048 else "mxu"
    if mode == "direct":
        return _chunk_direct(pos_i, pos_all, gm, softening_sq)

    c = min(chunk, max(8, ni))
    ni_p = ((ni + c - 1) // c) * c
    pos_i_p = jnp.pad(pos_i, ((0, ni_p - ni), (0, 0)))
    chunks = pos_i_p.reshape(ni_p // c, c, 3)
    if mode == "mxu":
        pj_sq = jnp.sum(pos_all * pos_all, axis=-1)
        fn = lambda pc: _chunk_mxu(pc, pos_all, gm, pj_sq, softening_sq)
    else:
        fn = lambda pc: _chunk_direct(pc, pos_all, gm, softening_sq)
    return lax.map(fn, chunks).reshape(ni_p, 3)[:ni]


@partial(jax.jit, static_argnames=("mode", "chunk", "G", "softening_sq"))
def exhaustive_accelerations(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    mode: str = "auto",
    chunk: int = 1024,
) -> jax.Array:
    """All-pairs accelerations; picks a strategy by N when mode='auto'."""
    n = pos.shape[0]
    dtype = pos.dtype
    gm = jnp.asarray(G, dtype) * mass

    if mode == "auto":
        mode = "direct" if n <= 2048 else "mxu"
    if mode == "direct" and n <= 4096:
        return direct_accelerations(pos, mass, G=G, softening_sq=softening_sq)

    # Chunked paths: pad N to a multiple of the chunk size with zero-mass
    # bodies (inert — see nbody_tpu.core.types docstring).
    c = min(chunk, max(8, n))
    n_pad = ((n + c - 1) // c) * c
    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    gm_p = jnp.pad(gm, (0, n_pad - n))
    pos_chunks = pos_p.reshape(n_pad // c, c, 3)

    if mode == "mxu":
        pj_sq = jnp.sum(pos_p * pos_p, axis=-1)
        fn = lambda pc: _chunk_mxu(pc, pos_p, gm_p, pj_sq, softening_sq)
    else:
        fn = lambda pc: _chunk_direct(pc, pos_p, gm_p, softening_sq)
    acc = lax.map(fn, pos_chunks)
    return acc.reshape(n_pad, 3)[:n]
