"""Morton (Z-order) encoding of body positions.

The reference builds its octree by per-body pointer descent
(serial/barnes-hut.c:169-270 serial; omp per-child locks
openmp/barnes-hut.c:183-298; CUDA atomicCAS inserts
cuda/barnes-hut.cu:206-298).  None of that vectorizes on a TPU.  Instead we
use the standard GPU/TPU re-architecture: quantize positions onto a
2^depth^3 grid over the same root cube the reference uses (centered at the
origin with border = 2*max|coord|, serial/barnes-hut.c:326-344), interleave
the bits into a Morton key, and sort.  A node of the reference octree at
depth d is exactly the set of bodies sharing a 3d-bit Morton prefix, so the
whole tree falls out of segment operations over the sorted keys
(nbody_tpu.ops.bh_tree).

depth <= 10 keeps keys in int32 (30 bits).  The reference splits leaves to
unbounded depth; we terminate at `depth` and treat a terminal cell as one
leaf — at depth 10 a cell is border/1024 across, far below the softening
length sqrt(0.01) = 0.1 for the reference's unit-cube fixtures, so the
force difference is negligible (and tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bounding_border(pos: jax.Array) -> jax.Array:
    """Root cube border: 2 * max|coordinate| (serial/barnes-hut.c:326-344).
    The cube is centered at the origin."""
    return 2.0 * jnp.max(jnp.abs(pos))


def _spread3(v: jax.Array) -> jax.Array:
    """Spread 10 bits so there are two zero bits between each (uint32)."""
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_encode(pos: jax.Array, border: jax.Array, depth: int) -> jax.Array:
    """int32 Morton keys of the depth-level cells containing each body.

    Bit layout matches the reference's octant convention z*4 + y*2 + x
    (serial/barnes-hut.c:114-133): z in the high bit of each 3-bit group.
    """
    if not 1 <= depth <= 10:
        raise ValueError(f"depth must be in [1, 10] for int32 keys, got {depth}")
    n_cells = jnp.float32(2**depth)
    # x in [-border/2, border/2] -> cell in [0, 2^depth)
    scaled = (pos.astype(jnp.float32) / border + 0.5) * n_cells
    cell = jnp.clip(scaled.astype(jnp.int32), 0, 2**depth - 1).astype(jnp.uint32)
    key = (
        _spread3(cell[:, 0])
        | (_spread3(cell[:, 1]) << 1)
        | (_spread3(cell[:, 2]) << 2)
    )
    return key.astype(jnp.int32)  # < 2^30, sign bit clear


def morton_sort(pos: jax.Array, depth: int, border: jax.Array | None = None):
    """(perm, keys, border): permutation sorting bodies by Morton key.

    The CUDA analog is sort_ents (cuda/barnes-hut.cu:459-488), which ranks
    bodies by in-order tree position each step for traversal locality; a
    Morton sort is the same ordering computed without the tree.

    `border` overrides the bounding cube (outlier-robust mode,
    ops/bh_fused.barneshut_fused_robust): morton_encode clips
    out-of-cube positions into edge cells, so a smaller border simply
    coarse-bins the outliers.
    """
    if border is None:
        border = bounding_border(pos)
    keys = morton_encode(pos, border, depth)
    perm = jnp.argsort(keys)
    return perm, keys, border
