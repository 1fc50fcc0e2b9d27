from nbodysim_tpu.kernels.allpairs import allpairs_accelerations

__all__ = ["allpairs_accelerations"]
