from nbody_tpu.parallel.mesh import make_mesh, device_report
from nbody_tpu.parallel.sharding import (
    shard_bodies,
    shard_force_fn,
    sharded_energy,
)

__all__ = [
    "make_mesh",
    "device_report",
    "shard_bodies",
    "shard_force_fn",
    "sharded_energy",
]
