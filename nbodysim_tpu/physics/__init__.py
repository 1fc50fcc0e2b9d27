from nbodysim_tpu.physics.forces import compute_accelerations, direct_accelerations
from nbodysim_tpu.physics.integrators import make_step

__all__ = ["compute_accelerations", "direct_accelerations", "make_step"]
