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


def make_mesh(devices: Sequence | None = None, axis_name: str = BODY_AXIS):
    """A 1-D mesh over all (or the given) devices; i-bodies shard over it."""
    import jax

    if devices is None:
        devices = jax.devices()
    return jax.sharding.Mesh(np.asarray(devices), (axis_name,))


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
