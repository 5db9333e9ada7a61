"""KDK leapfrog (velocity-Verlet) integration as a jitted lax.scan.

Step order matches the reference `propagation` exactly
(serial/exhaustive.c:192-255):

    a   = force(x)                  # once, before the loop   (:206)
    repeat n_steps times:           #                          (:218)
        v  += a * dt/2              # first half-kick          (:221-225)
        x  += v * dt                # drift                    (:228-231)
        a   = force(x)              # recompute                (:242)
        v  += a * dt/2              # second half-kick         (:245-249)

The per-step trajectory history the CUDA version keeps on-device
(cuda/exhaustive.cu:116 allocates N*4*(n_steps+1) doubles) is the scan's
stacked `ys` here.  For long runs that don't fit in HBM, `simulate` scans in
chunks and hands each chunk's positions to a writer callback (the idiomatic
equivalent of the reference's per-step fprintf under -DRESULTS).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nbody_tpu.core.types import Bodies

ForceFn = Callable[[jax.Array, jax.Array], jax.Array]  # (pos, mass) -> acc


def _one_step(pos, vel, acc, mass, dt, force_fn):
    half = dt * 0.5
    vel = vel + acc * half
    pos = pos + vel * dt
    acc = force_fn(pos, mass)
    vel = vel + acc * half
    return pos, vel, acc


# Yoshida (1990) 4th-order symplectic coefficients: three KDK sub-steps
# with w1 = 1/(2 - 2^(1/3)), w0 = -2^(1/3) * w1.
_Y4_W1 = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
_Y4_W0 = -(2.0 ** (1.0 / 3.0)) * _Y4_W1


def _one_step_yoshida4(pos, vel, acc, mass, dt, force_fn):
    """One 4th-order Yoshida step = KDK(w1 dt) . KDK(w0 dt) . KDK(w1 dt).

    A capability beyond the reference (which is 2nd-order KDK only,
    serial/exhaustive.c:218-249): same ForceFn, 3 force evaluations per
    step, O(dt^4) energy error.  The incoming `acc` is force(pos) exactly
    as in KDK, so chunked scans stay bit-reproducible."""
    for w in (_Y4_W1, _Y4_W0, _Y4_W1):
        sub = dt * w
        vel = vel + acc * (sub * 0.5)
        pos = pos + vel * sub
        acc = force_fn(pos, mass)
        vel = vel + acc * (sub * 0.5)
    return pos, vel, acc


_STEPPERS = {"leapfrog": _one_step, "yoshida4": _one_step_yoshida4}


@partial(
    jax.jit,
    static_argnames=("n_steps", "force_fn", "with_history", "integrator"),
)
def leapfrog_steps(
    bodies: Bodies,
    n_steps: int,
    dt: float,
    force_fn: ForceFn,
    *,
    acc0: Optional[jax.Array] = None,
    with_history: bool = False,
    integrator: str = "leapfrog",
):
    """Advance `bodies` by `n_steps` KDK steps.

    Returns (bodies', acc') and, if with_history, the (n_steps, N, 3) stack
    of post-drift positions (the rows the reference writes per step,
    serial/exhaustive.c:233-238).  `acc0` carries the force from a previous
    chunk so chunked runs are bit-identical to one long scan; when None it
    is computed fresh (the reference's initial acceleration call, :206).
    """
    dtype = bodies.pos.dtype
    dt = jnp.asarray(dt, dtype)
    mass = bodies.mass
    if acc0 is None:
        acc0 = force_fn(bodies.pos, mass)

    stepper = _STEPPERS[integrator]

    def step(carry, _):
        pos, vel, acc = carry
        pos, vel, acc = stepper(pos, vel, acc, mass, dt, force_fn)
        return (pos, vel, acc), (pos if with_history else None)

    (pos, vel, acc), hist = lax.scan(
        step, (bodies.pos, bodies.vel, acc0), None, length=n_steps
    )
    out = Bodies(pos, vel, mass)
    if with_history:
        return out, acc, hist
    return out, acc


def simulate(
    bodies: Bodies,
    n_steps: int,
    dt: float,
    force_fn: ForceFn,
    *,
    frame_writer: Optional[Callable[[np.ndarray], None]] = None,
    chunk_steps: int = 64,
    checkpoint_every: int = 0,
    checkpoint_fn: Optional[Callable[[Bodies, int], None]] = None,
    integrator: str = "leapfrog",
    progress_every: int = 0,
    progress_fn: Optional[Callable[[int], None]] = None,
    merge_radius: float = 0.0,
    merge_every: int = 1,
    merge_report: Optional[Callable[[int], None]] = None,
    mass_update: Optional[Callable[[np.ndarray], None]] = None,
) -> Bodies:
    """Run a full simulation, optionally streaming trajectory frames.

    When `frame_writer` is given it first receives the initial frame (the
    reference writes the initial state before the loop,
    serial/exhaustive.c:208-216) and then one (T, N, 3) chunk of post-drift
    positions per scan chunk.  `checkpoint_fn(bodies, step)` fires every
    `checkpoint_every` steps (chunk boundaries are split to land exactly).
    `progress_fn(done)` fires every `progress_every` steps, after a device
    fence, so callers can report wall-clock heartbeats (the PRINT_LOOP
    analog, cuda/barnes-hut.cu:1037-1039).

    `merge_radius > 0` switches on inelastic merging every `merge_every`
    steps (ops/collisions.py; leapfrog only); `merge_report` receives
    the total number of absorbed bodies at the end.  `mass_update`
    (if given) receives the running mass array whenever a chunk merged
    bodies — with frames on, chunks are capped to merge boundaries so
    the trajectory's mass column tracks merges exactly.
    """
    merging = merge_radius > 0
    if merging and integrator != "leapfrog":
        raise ValueError("merging supports the leapfrog integrator only")
    if frame_writer is not None:
        frame_writer(np.asarray(bodies.pos)[None])

    acc = None
    done = 0
    merged_total = 0
    chunked = (
        frame_writer is not None or checkpoint_every > 0 or progress_every > 0
    )
    while done < n_steps:
        t = min(chunk_steps, n_steps - done) if chunked else n_steps - done
        if checkpoint_every > 0:
            next_ckpt = ((done // checkpoint_every) + 1) * checkpoint_every
            t = min(t, next_ckpt - done)
        if progress_every > 0:
            next_prog = ((done // progress_every) + 1) * progress_every
            t = min(t, next_prog - done)
        if merging:
            from nbody_tpu.ops.collisions import simulate_merging

            if frame_writer is not None:
                # land chunks on merge boundaries: each chunk's frames
                # then share one mass column (merges apply at chunk end)
                next_m = ((done // merge_every) + 1) * merge_every
                t = min(t, next_m - done)
            out = simulate_merging(
                bodies, t, dt, force_fn, radius=merge_radius,
                merge_every=merge_every, acc0=acc, k0=done,
                with_history=frame_writer is not None,
            )
            if frame_writer is not None:
                bodies, acc, merged, hist = out
                frame_writer(np.asarray(hist))
            else:
                bodies, acc, merged = out
            merged = int(merged)
            merged_total += merged
            if merged and mass_update is not None:
                mass_update(np.asarray(bodies.mass))
        elif frame_writer is not None:
            bodies, acc, hist = leapfrog_steps(
                bodies, t, dt, force_fn, acc0=acc, with_history=True,
                integrator=integrator,
            )
            frame_writer(np.asarray(hist))
        else:
            bodies, acc = leapfrog_steps(
                bodies, t, dt, force_fn, acc0=acc, integrator=integrator
            )
        done += t
        if (
            checkpoint_every > 0
            and checkpoint_fn is not None
            and done % checkpoint_every == 0
        ):
            checkpoint_fn(bodies, done)
        if (
            progress_every > 0
            and progress_fn is not None
            and done % progress_every == 0
        ):
            np.asarray(bodies.pos[:1])  # fence so the heartbeat wall time is real
            progress_fn(done)
    # Device fence via a tiny D2H copy: block_until_ready is not a reliable
    # fence on every PJRT plugin (the axon tunnel returns immediately), and
    # callers time around this function.
    np.asarray(bodies.pos[:1])
    if merging and merge_report is not None:
        merge_report(merged_total)
    return bodies
