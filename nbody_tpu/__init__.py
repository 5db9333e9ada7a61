"""nbody_tpu — a TPU-native gravitational N-body simulation framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of the
reference C/OpenMP/CUDA simulator (Metgraph/N-Body-simulation):

* exhaustive O(N^2) all-pairs gravity (reference: serial/exhaustive.c,
  openmp/exhaustive.c, cuda/exhaustive.cu) as a tiled Pallas pairwise kernel
  streaming j-body tiles through VMEM,
* Barnes-Hut O(N log N) gravity (reference: serial/barnes-hut.c,
  openmp/barnes-hut.c, cuda/barnes-hut.cu) re-architected as a Morton-sorted
  level-array octree with vectorized group-based theta-gated traversal,
* a jitted KDK leapfrog integrator (lax.scan over steps),
* energy-conservation and trajectory-diff parity oracles (reference:
  common/get_energy.c, utils/check_error.py),
* multi-chip scaling over a `jax.sharding.Mesh` (i-bodies sharded,
  per-step all_gather of positions over ICI) — the layer the reference
  lacks entirely (it is single-process OpenMP / single-GPU CUDA).

CLI contract preserved from the reference
(`input start_time end_time delta_time output`, README.md:40-68).
"""

from nbody_tpu.core.types import Bodies, SimConfig
from nbody_tpu.core import constants
from nbody_tpu.io.csv import read_bodies, write_frames
from nbody_tpu.ops.exhaustive import exhaustive_accelerations
from nbody_tpu.integrate.leapfrog import leapfrog_steps, simulate
from nbody_tpu.diag.energy import get_energy

__version__ = "0.1.0"


def barneshut_accelerations(*args, **kw):
    """Lazy re-export of nbody_tpu.ops.barneshut.barneshut_accelerations."""
    from nbody_tpu.ops.barneshut import barneshut_accelerations as fn

    return fn(*args, **kw)


def pallas_accelerations(*args, **kw):
    """Lazy re-export of the Pallas all-pairs kernel."""
    from nbody_tpu.ops.pallas_exhaustive import pallas_accelerations as fn

    return fn(*args, **kw)


def barneshut_fused(*args, **kw):
    """Lazy re-export of the fused Pallas traverse+evaluate kernel."""
    from nbody_tpu.ops.bh_fused import barneshut_fused as fn

    return fn(*args, **kw)


def simulate_persistent(*args, **kw):
    """Lazy re-export of the persistent-Morton-order simulation loop."""
    from nbody_tpu.ops.bh_persistent import simulate_persistent as fn

    return fn(*args, **kw)


__all__ = [
    "Bodies",
    "SimConfig",
    "constants",
    "read_bodies",
    "write_frames",
    "exhaustive_accelerations",
    "barneshut_accelerations",
    "barneshut_fused",
    "pallas_accelerations",
    "leapfrog_steps",
    "simulate",
    "simulate_persistent",
    "get_energy",
]
