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


def _pair_eps2(softening_sq, e2_i, e2_all, dtype):
    """Pairwise softening addend for one (C, N) chunk.

    Scalar contract (reference parity): the global eps2.  Per-body
    contract (capability beyond the reference): the symmetric mean
    eps2_ij = (eps2_i + eps2_j) / 2 — symmetry keeps the pair force
    antisymmetric, so momentum stays exactly conserved (the standard
    collisionless-code convention, e.g. GADGET's variable softening)."""
    if e2_i is None:
        return jnp.asarray(softening_sq, dtype)
    return 0.5 * (e2_i[:, None] + e2_all[None, :])


def direct_accelerations(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    eps2_per_body: jax.Array | None = None,
) -> jax.Array:
    """Full-broadcast all-pairs accelerations — the parity oracle.

    `eps2_per_body` (N,) replaces the scalar softening with the symmetric
    per-pair mean (see _pair_eps2)."""
    dtype = pos.dtype
    d = pos[None, :, :] - pos[:, None, :]  # (N, N, 3): d[i, j] = p_j - p_i
    e2 = _pair_eps2(softening_sq, eps2_per_body, eps2_per_body, dtype)
    r2 = jnp.sum(d * d, axis=-1) + e2
    w = _inv_r3(r2, dtype) * (jnp.asarray(G, dtype) * mass)[None, :]
    return jnp.einsum("ij,ijk->ik", w, d)


def _chunk_direct(pos_i, pos, gm, softening_sq, e2_i=None, e2_all=None):
    dtype = pos.dtype
    d = pos[None, :, :] - pos_i[:, None, :]  # (C, N, 3), i on axis 0
    r2 = jnp.sum(d * d, axis=-1) + _pair_eps2(softening_sq, e2_i, e2_all, dtype)
    w = _inv_r3(r2, dtype) * gm[None, :]
    return jnp.einsum("cj,cjk->ck", w, d)


def _chunk_mxu(pos_i, pos, gm, pj_sq, softening_sq, e2_i=None, e2_all=None):
    dtype = pos.dtype
    # r2_ij = |p_i|^2 + |p_j|^2 - 2 p_i . p_j   (MXU for the dot term).
    # precision=HIGHEST: TPU matmuls default to bf16 passes, which injects
    # ~4e-3 relative force error — far beyond the 1e-3 energy-drift budget.
    pi_sq = jnp.sum(pos_i * pos_i, axis=-1)  # (C,)
    dots = jnp.dot(
        pos_i, pos.T, precision=lax.Precision.HIGHEST, preferred_element_type=dtype
    )  # (C, N)
    eps2 = _pair_eps2(softening_sq, e2_i, e2_all, dtype)
    r2 = pi_sq[:, None] + pj_sq[None, :] - 2.0 * dots + eps2
    # The true squared distance is >= 0, so r2 + eps2 >= eps2; cancellation
    # in the expanded form can dip below that floor and blow up r^-3 —
    # clamp to the softening floor.
    r2 = jnp.maximum(r2, eps2)
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
    eps2_i: jax.Array | None = None,
    eps2_all: jax.Array | None = None,
) -> jax.Array:
    """Accelerations of pos_i (Ni, 3) targets against all sources — the
    rectangular building block the sharded path evaluates per chip.

    `eps2_i` (Ni,) / `eps2_all` (Nall,) switch on per-body softening
    (must be given together; see _pair_eps2)."""
    ni = pos_i.shape[0]
    dtype = pos_i.dtype
    gm = jnp.asarray(G, dtype) * mass_all
    if (eps2_i is None) != (eps2_all is None):
        raise ValueError("eps2_i and eps2_all must be given together")
    if mode == "auto":
        mode = "direct" if ni * pos_all.shape[0] <= 2048 * 2048 else "mxu"
    if mode == "direct":
        return _chunk_direct(pos_i, pos_all, gm, softening_sq, eps2_i, eps2_all)

    c = min(chunk, max(8, ni))
    ni_p = ((ni + c - 1) // c) * c
    pos_i_p = jnp.pad(pos_i, ((0, ni_p - ni), (0, 0)))
    chunks = pos_i_p.reshape(ni_p // c, c, 3)
    # padded targets: any softening value works (their output is dropped)
    e2_chunks = (
        None if eps2_i is None
        else jnp.pad(eps2_i, (0, ni_p - ni)).reshape(ni_p // c, c)
    )
    if mode == "mxu":
        pj_sq = jnp.sum(pos_all * pos_all, axis=-1)
        fn = lambda pc, ec: _chunk_mxu(
            pc, pos_all, gm, pj_sq, softening_sq, ec, eps2_all
        )
    else:
        fn = lambda pc, ec: _chunk_direct(
            pc, pos_all, gm, softening_sq, ec, eps2_all
        )
    if e2_chunks is None:
        acc = lax.map(lambda pc: fn(pc, None), chunks)
    else:
        acc = lax.map(lambda args: fn(*args), (chunks, e2_chunks))
    return acc.reshape(ni_p, 3)[:ni]


@partial(jax.jit, static_argnames=("mode", "chunk", "G", "softening_sq"))
def exhaustive_accelerations(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    softening_sq: float = constants.SOFTENING_SQ,
    mode: str = "auto",
    chunk: int = 1024,
    eps2_per_body: jax.Array | None = None,
) -> jax.Array:
    """All-pairs accelerations; picks a strategy by N when mode='auto'.

    `eps2_per_body` (N,) switches on symmetric per-body softening — a
    capability beyond the reference's single global eps2 (_pair_eps2)."""
    n = pos.shape[0]
    dtype = pos.dtype
    gm = jnp.asarray(G, dtype) * mass

    if mode == "auto":
        mode = "direct" if n <= 2048 else "mxu"
    if mode == "direct" and n <= 4096:
        return direct_accelerations(
            pos, mass, G=G, softening_sq=softening_sq,
            eps2_per_body=eps2_per_body,
        )

    # Chunked paths: pad N to a multiple of the chunk size with zero-mass
    # bodies (inert — see nbody_tpu.core.types docstring).
    c = min(chunk, max(8, n))
    n_pad = ((n + c - 1) // c) * c
    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    gm_p = jnp.pad(gm, (0, n_pad - n))
    e2_p = (
        None if eps2_per_body is None
        else jnp.pad(eps2_per_body, (0, n_pad - n))
    )
    # G already folded into gm_p; "direct" above this size means chunked
    # direct (rect's "direct" would broadcast the full (N, N) rectangle)
    return rect_accelerations(
        pos_p, pos_p, gm_p, G=1.0, softening_sq=softening_sq,
        mode=("mxu" if mode == "mxu" else "chunked"), chunk=c,
        eps2_i=e2_p, eps2_all=e2_p,
    )[:n]
