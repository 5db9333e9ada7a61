from nbody_tpu.ops.exhaustive import exhaustive_accelerations

__all__ = ["exhaustive_accelerations"]
