"""Device mesh discovery and reporting.

The reference's device layer is `common/get_devices.cu:4-31` (SM count,
shared-memory size, warp size per GPU) plus the occupancy heuristic
`get_opt_grid` (cuda/barnes-hut.cu:633-652).  The TPU equivalents are
`jax.devices()` / `jax.sharding.Mesh` and XLA's own scheduler; what remains
useful is a human-readable probe of what the process can see.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

BODY_AXIS = "bodies"
J_AXIS = "jbodies"


def make_mesh(devices: Sequence | None = None, axis_name: str = BODY_AXIS):
    """A 1-D mesh over all (or the given) devices; i-bodies shard over it."""
    import jax

    if devices is None:
        devices = jax.devices()
    return jax.sharding.Mesh(np.asarray(devices), (axis_name,))


def parse_mesh_shape(spec: str, n_dev: int) -> tuple[int, int]:
    """'PIxPJ' -> (pi, pj); 'auto' -> the most-square factorization with
    pi >= pj (the i-axis carries the larger per-chip row block)."""
    if spec == "auto":
        pj = int(np.sqrt(n_dev))
        while n_dev % pj:
            pj -= 1
        return n_dev // pj, pj
    try:
        pi_s, pj_s = spec.lower().split("x")
        pi, pj = int(pi_s), int(pj_s)
    except ValueError:
        raise ValueError(f"mesh shape {spec!r} is not 'PIxPJ'") from None
    if pi < 1 or pj < 1 or pi * pj != n_dev:
        raise ValueError(
            f"mesh shape {spec!r} = {pi}*{pj} devices, have {n_dev}"
        )
    return pi, pj


def make_mesh2d(
    shape: tuple[int, int] | str = "auto",
    devices: Sequence | None = None,
):
    """A (BODY_AXIS, J_AXIS) 2-D mesh for the torus force decomposition
    (sharding.shard_force_fn2d).  On real hardware the axis order follows
    jax.devices() row-major, which the runtime lays out along the ICI
    torus; each collective then rides one torus dimension."""
    import jax

    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if isinstance(shape, str):
        shape = parse_mesh_shape(shape, n_dev)
    pi, pj = shape
    if pi * pj != n_dev:
        raise ValueError(f"mesh shape {pi}x{pj} needs {pi * pj} devices")
    return jax.sharding.Mesh(
        np.asarray(devices).reshape(pi, pj), (BODY_AXIS, J_AXIS)
    )


def device_report() -> str:
    """TPU-native analog of common/get_devices.cu: one line per device."""
    import jax

    lines = [f"backend: {jax.default_backend()}, devices: {jax.device_count()}"]
    for d in jax.devices():
        mem = getattr(d, "memory_stats", lambda: None)()
        hbm = ""
        if mem and "bytes_limit" in mem:
            hbm = f", hbm: {mem['bytes_limit'] / 2**30:.1f} GiB"
        lines.append(
            f"  [{d.id}] {d.device_kind} (platform={d.platform}, "
            f"process={d.process_index}{hbm})"
        )
    return "\n".join(lines)
