from nbody_tpu.core import constants
from nbody_tpu.core.types import Bodies, SimConfig

__all__ = ["constants", "Bodies", "SimConfig"]
