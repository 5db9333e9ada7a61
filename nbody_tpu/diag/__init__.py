from nbody_tpu.diag.energy import get_energy, energy_drift
from nbody_tpu.diag.compare import trajectory_diff, error_growth_slope

__all__ = ["get_energy", "energy_drift", "trajectory_diff", "error_growth_slope"]
