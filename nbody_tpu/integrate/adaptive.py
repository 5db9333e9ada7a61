"""Adaptive time stepping — per-step dt from the acceleration scale.

Capability beyond the reference (fixed dt everywhere, e.g.
serial/exhaustive.c:218-249).  The criterion is the standard softened-
gravity one (GADGET's criterion 0):

    dt = sqrt(2 eta eps / |a|_max),   clipped to [dt_min, dt_max]

so close encounters automatically shrink the step while quiet epochs
stride at dt_max.

TPU shape discipline: a variable step count is a dynamic trip count,
which XLA cannot scan.  The design keeps everything statically shaped:

  * dt is a TRACED SCALAR riding in the lax.scan carry — per-step
    adaptivity costs one max-reduction per step, no recompiles;
  * each device dispatch is a fixed K-step scan; the host loops
    dispatches until simulated time reaches t_end (the same chunking
    the fixed-dt path uses for frames/checkpoints);
  * the final step lands EXACTLY on t_end: dt is additionally clamped
    to (t_end - t), and once t == t_end the clamp makes every further
    step a dt = 0 no-op (identity KDK), so a chunk's tail steps after
    arrival are wasted force evals at worst, never wrong physics;
  * per-step (t, dt) pairs stream out of the scan, so callers get the
    true step sizes taken (and frames carry a valid mask).

KDK with a varying dt is no longer strictly symplectic; the criterion
keeps dt changes slow and bounded, the standard practice trade.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nbody_tpu.core.types import Bodies
from nbody_tpu.integrate.leapfrog import ForceFn


def _amax(acc):
    return jnp.sqrt(jnp.max(jnp.sum(acc * acc, axis=-1)))


def adaptive_steps(
    bodies: Bodies,
    k_steps: int,
    t: jax.Array,
    t_end: float,
    force_fn: ForceFn,
    *,
    eta: float,
    eps: float,
    dt_min: float,
    dt_max: float,
    acc0: Optional[jax.Array] = None,
    with_history: bool = False,
):
    """One fixed-K dispatch of adaptive KDK steps starting at time `t`.

    Returns (bodies', acc', t', (ts, dts)) — per-step end times and the
    dt each step took (0 for post-arrival no-ops) — plus the (K, N, 3)
    post-drift history when `with_history`.
    """
    dtype = bodies.pos.dtype
    mass = bodies.mass
    if acc0 is None:
        acc0 = force_fn(bodies.pos, mass)
    two_eta_eps = jnp.asarray(2.0 * eta * eps, dtype)
    t_end = jnp.asarray(t_end, dtype)

    def step(carry, _):
        pos, vel, acc, t = carry
        dt = jnp.sqrt(two_eta_eps / jnp.maximum(_amax(acc), 1e-30))
        dt = jnp.clip(dt, dt_min, dt_max)
        rem = jnp.maximum(t_end - t, 0.0)
        dt = jnp.minimum(dt, rem)
        half = dt * 0.5
        vel = vel + acc * half
        pos = pos + vel * dt
        acc = force_fn(pos, mass)
        vel = vel + acc * half
        # exact landing: SNAP t to t_end when the step consumes the
        # remainder — near arrival f32 rounding can make t + dt == t
        # with dt > 0, spinning the host driver on ghost steps forever
        t = jnp.where(dt >= rem, t_end, t + dt)
        out = (t, dt, pos if with_history else None)
        return (pos, vel, acc, t), out

    (pos, vel, acc, t), (ts, dts, hist) = lax.scan(
        step, (bodies.pos, bodies.vel, acc0, jnp.asarray(t, dtype)),
        None, length=k_steps,
    )
    out = Bodies(pos, vel, mass)
    if with_history:
        return out, acc, t, (ts, dts), hist
    return out, acc, t, (ts, dts)


def simulate_adaptive(
    bodies: Bodies,
    t_start: float,
    t_end: float,
    force_fn: ForceFn,
    *,
    eta: float = 0.025,
    softening_sq: float,
    dt_min: float = 0.0,
    dt_max: float,
    chunk_steps: int = 64,
    frame_writer: Optional[Callable[[np.ndarray], None]] = None,
    max_steps: int = 10_000_000,
):
    """Integrate from t_start to t_end with adaptive dt.

    Returns (bodies, n_steps_taken).  `softening_sq` provides the length
    scale eps = sqrt(softening_sq) of the criterion (it must be > 0 —
    unsoftened point masses have no scale and no dt floor).  Frames
    follow the fixed-dt contract (initial frame first, then post-drift
    chunks), one row per REAL step (no-op tail steps are dropped).
    """
    if softening_sq <= 0:
        raise ValueError("adaptive dt needs softening_sq > 0 (the eps scale)")
    if dt_max <= 0:
        raise ValueError("dt_max must be > 0")
    eps = math.sqrt(softening_sq)

    if frame_writer is not None:
        frame_writer(np.asarray(bodies.pos)[None])

    t = jnp.asarray(t_start, bodies.pos.dtype)
    # compare at the CARRY's resolution: the scan snaps t to the f32
    # image of t_end on arrival, and f32(t_end) < t_end (f64) would
    # otherwise re-enter the loop forever on dt = 0 no-op chunks
    t_end_cmp = float(jnp.asarray(t_end, bodies.pos.dtype))
    acc = None
    taken = 0
    t_prev = float("-inf")
    while float(t) < t_end_cmp and taken < max_steps:
        # stagnation guard: the in-scan landing snap handles normal
        # arrival; this catches dt_max so small that t + dt rounds to t
        if float(t) <= t_prev:
            raise RuntimeError(
                f"adaptive dt stagnated at t = {float(t):g} (< t_end = "
                f"{t_end:g}): dt_max {dt_max:g} is below the f32 time "
                "resolution at this t — raise dt_max or rescale time"
            )
        t_prev = float(t)
        if frame_writer is not None:
            bodies, acc, t, (ts, dts), hist = adaptive_steps(
                bodies, chunk_steps, t, t_end, force_fn,
                eta=eta, eps=eps, dt_min=dt_min, dt_max=dt_max,
                acc0=acc, with_history=True,
            )
            real = np.asarray(dts) > 0
            if real.any():
                frame_writer(np.asarray(hist)[real])
            taken += int(real.sum())
        else:
            bodies, acc, t, (ts, dts) = adaptive_steps(
                bodies, chunk_steps, t, t_end, force_fn,
                eta=eta, eps=eps, dt_min=dt_min, dt_max=dt_max, acc0=acc,
            )
            taken += int((np.asarray(dts) > 0).sum())
    np.asarray(bodies.pos[:1])  # device fence (see leapfrog.simulate)
    return bodies, taken
