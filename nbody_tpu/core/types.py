"""Core state types.

The reference stores bodies AoS on CPU (`Entity{pos, vel, mass}`,
serial/exhaustive.c:17-21) and SoA on the GPU (flat `double*` arrays,
cuda/barnes-hut.cu:22-27).  The TPU-native representation is SoA throughout —
a `Bodies` pytree of `(N, 3)` position/velocity arrays and an `(N,)` mass
array — because XLA wants large, statically-shaped, contiguously-tiled
arrays, not structs.

Padding: TPU kernels want N to be a multiple of the tile size.  `Bodies.pad`
appends zero-mass bodies; a zero-mass body exerts exactly zero force on every
other body (the force term is `G * m_j * r * (|r|^2+eps)^(-3/2)`,
serial/exhaustive.c:174-179, which scales linearly in `m_j`), so padded
bodies are physically inert and are simply dropped on the way out.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.core import constants


class Bodies(NamedTuple):
    """SoA body state: positions (N,3), velocities (N,3), masses (N,)."""

    pos: jax.Array
    vel: jax.Array
    mass: jax.Array

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def dtype(self):
        return self.pos.dtype

    @classmethod
    def from_numpy(cls, arr: np.ndarray, dtype=jnp.float32) -> "Bodies":
        """Build from an (N, 7) array in the reference CSV column order
        x, y, z, vx, vy, vz, mass (serial/exhaustive.c:130-132)."""
        arr = np.asarray(arr)
        if arr.ndim != 2 or arr.shape[1] != 7:
            raise ValueError(f"expected (N, 7) body array, got {arr.shape}")
        return cls(
            pos=jnp.asarray(arr[:, 0:3], dtype=dtype),
            vel=jnp.asarray(arr[:, 3:6], dtype=dtype),
            mass=jnp.asarray(arr[:, 6], dtype=dtype),
        )

    def to_numpy(self) -> np.ndarray:
        """Back to the (N, 7) reference column order."""
        return np.concatenate(
            [
                np.asarray(self.pos),
                np.asarray(self.vel),
                np.asarray(self.mass)[:, None],
            ],
            axis=1,
        )

    def astype(self, dtype) -> "Bodies":
        return Bodies(
            self.pos.astype(dtype), self.vel.astype(dtype), self.mass.astype(dtype)
        )

    def pad(self, multiple: int) -> "Bodies":
        """Pad N up to a multiple of `multiple` with inert zero-mass bodies."""
        n = self.n
        target = ((n + multiple - 1) // multiple) * multiple
        if target == n:
            return self
        extra = target - n
        zeros3 = jnp.zeros((extra, 3), dtype=self.pos.dtype)
        return Bodies(
            pos=jnp.concatenate([self.pos, zeros3]),
            vel=jnp.concatenate([self.vel, zeros3]),
            mass=jnp.concatenate([self.mass, jnp.zeros((extra,), self.mass.dtype)]),
        )

    def unpad(self, n: int) -> "Bodies":
        return Bodies(self.pos[:n], self.vel[:n], self.mass[:n])


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Simulation configuration.

    The reference fixes these at compile time (BIG_G serial/exhaustive.c:24,
    THETA serial/barnes-hut.c:40, softening serial/exhaustive.c:172) and takes
    the time window positionally on the CLI (`input start end dt output`,
    serial/exhaustive.c:33-38).  Here everything is an explicit config.
    """

    G: float = constants.BIG_G
    softening_sq: float = constants.SOFTENING_SQ
    theta: float = constants.THETA
    dt: float = 1.0

    @staticmethod
    def n_steps(start: float, end: float, dt: float) -> int:
        """Step count exactly as the reference computes it: C float
        arithmetic `(end - start) / dt` truncated to int
        (serial/exhaustive.c:52)."""
        return int(
            (np.float32(end) - np.float32(start)) / np.float32(dt)
        )

    @staticmethod
    def c_float(x: float) -> float:
        """The reference parses dt with strtof into a C float
        (serial/exhaustive.c:50); round-trip through float32 so fp64 parity
        runs integrate with the bit-identical dt value."""
        return float(np.float32(x))
