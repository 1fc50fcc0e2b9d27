"""nbodysim_tpu — a TPU-native gravitational N-body framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the C++ reference
simulator 7IBBE77S/nbodysim (softened Newtonian gravity, fixed-dt symplectic
integration, collision pipeline, procedural scenes, live diagnostics, renderer),
built TPU-first:

- particle state is a struct-of-arrays pytree (the reference's abandoned SoA
  experiments, Body.hpp:109-279 / Node.hpp:55-149, done properly);
- the hot O(N^2) force accumulation is a tiled all-pairs Pallas kernel blocked
  for the VPU/MXU (kernels/allpairs.py), with an XLA fallback;
- the whole step (forces -> kick -> boundary -> drift -> collisions) is fused
  under one `jax.jit`, multi-step rollouts use `lax.scan`;
- multi-chip runs shard the particle axis over a `jax.sharding.Mesh` and reduce
  forces with ring `ppermute` / `psum` over ICI (parallel/);
- diagnostics (energy, momentum, angular momentum) are computed on-device.

Public API:
    SimConfig, ParticleState, init_scene, make_step, simulate, diagnostics
"""

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState
from nbodysim_tpu.physics.forces import compute_accelerations
from nbodysim_tpu.physics.integrators import make_step
from nbodysim_tpu.diagnostics.metrics import diagnostics, system_metrics
from nbodysim_tpu.scenes import init_scene
from nbodysim_tpu.api import Simulation, simulate

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "ParticleState",
    "compute_accelerations",
    "make_step",
    "diagnostics",
    "system_metrics",
    "init_scene",
    "Simulation",
    "simulate",
]
