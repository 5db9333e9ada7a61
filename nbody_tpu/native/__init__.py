from nbody_tpu.native import loader

__all__ = ["loader"]
