"""Energy oracle — port of the reference invariant checker.

Matches common/get_energy.c:7-47 exactly:

* KE = 0.5 * sum_i m_i |v_i|^2                          (:9-21)
* PE = G * sum_{i<=j} -m_i m_j / |p_i - p_j|            (:23-46)
  with the 1/r guarded to 0 at r == 0 (:40) — so the i == j diagonal
  contributes nothing and PE is effectively the strict upper triangle.
  Note PE uses the *unsoftened* distance even though the force kernel
  softens; that asymmetry is part of the reference contract.

Energy drift |E(t) - E(0)| / |E(0)| is the north-star correctness metric
(BASELINE.json: drift within 1e-3 of the serial reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from nbody_tpu.core import constants


def _pe_kernel(pi_ref, pj_ref, out_ref):
    """Pallas PE tile: sum of -m_i m_j / r over a (BI, BJ) block, with the
    1/r guarded to 0 at r == 0 (common/get_energy.c:40).  pi (BI, 4) rows
    [x y z m]; pj (4, BJ) rows [x y z m]."""
    import jax.experimental.pallas as pl

    xi, yi, zi, mi = (pi_ref[:, k:k + 1] for k in range(4))
    xj, yj, zj, mj = (pj_ref[k:k + 1, :] for k in range(4))
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    r2 = dx * dx + dy * dy + dz * dz
    inv_r = jnp.where(r2 > 0, lax.rsqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
    partial_sum = jnp.sum(-(mi * mj) * inv_r)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])

    out_ref[0, 0] += partial_sum


@partial(jax.jit, static_argnames=("G", "block", "interpret"))
def pallas_potential_energy(
    pos: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    block: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """PE over all pairs via a tiled Pallas kernel — the large-N fast path
    for the energy oracle (full pairwise sum halved; diagonal is zero via
    the r == 0 guard, equal to the reference upper-triangle sum).

    f32 accumulation: good to ~1e-4 relative at 1M bodies; use get_energy
    (chunked, input-dtype) when fp64 precision matters."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pos.shape[0]
    dtype = jnp.float32
    n_p = ((n + block - 1) // block) * block
    pad = n_p - n
    pi = jnp.pad(
        jnp.concatenate(
            [pos.astype(dtype), mass.astype(dtype)[:, None]], axis=1
        ),
        ((0, pad), (0, 0)),
    )
    pj = pi.T.copy()
    grid = (n_p // block, n_p // block)
    total = pl.pallas_call(
        _pe_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, 4), lambda i, j: (i, 0)),
            pl.BlockSpec((4, block), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(pi, pj)
    return jnp.asarray(G, dtype) * total[0, 0] * 0.5


@partial(jax.jit, static_argnames=("G", "chunk"))
def get_energy(
    pos: jax.Array,
    vel: jax.Array,
    mass: jax.Array,
    *,
    G: float = constants.BIG_G,
    chunk: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Returns (KE, PE) with the reference's exact conventions."""
    dtype = pos.dtype
    ke = 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=-1))

    n = pos.shape[0]
    c = min(chunk, max(8, n))
    n_pad = ((n + c - 1) // c) * c
    pos_p = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    mass_p = jnp.pad(mass, (0, n_pad - n))

    def pe_chunk(args):
        pos_i, mass_i = args  # (C, 3), (C,)
        d = pos_p[None, :, :] - pos_i[:, None, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        inv_r = jnp.where(r > 0, 1.0 / jnp.where(r > 0, r, 1.0), 0.0)
        return jnp.sum(-mass_i[:, None] * mass_p[None, :] * inv_r)

    # Full symmetric sum; halve it (diagonal is zero via the r==0 guard),
    # equal to the reference's upper-triangle sum.
    pe_full = jnp.sum(
        lax.map(pe_chunk, (pos_p.reshape(-1, c, 3), mass_p.reshape(-1, c)))
    )
    pe = jnp.asarray(G, dtype) * pe_full * 0.5
    return ke, pe


def energy_drift(e_t, e_0) -> float:
    """|E(t) - E(0)| / |E(0)| (guarding E(0) == 0)."""
    e_t, e_0 = float(e_t), float(e_0)
    if e_0 == 0.0:
        return abs(e_t - e_0)
    return abs(e_t - e_0) / abs(e_0)
