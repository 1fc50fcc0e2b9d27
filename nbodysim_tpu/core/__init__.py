from nbodysim_tpu.core.state import ParticleState

__all__ = ["ParticleState"]
