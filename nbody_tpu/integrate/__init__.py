from nbody_tpu.integrate.leapfrog import leapfrog_steps, simulate

__all__ = ["leapfrog_steps", "simulate"]
