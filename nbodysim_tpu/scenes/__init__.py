"""Procedural initial-condition scenes.

The reference ships one generator, `uniform_disc` (Simulation.hpp:347-603):
a Lorenz-attractor-shaped disc around a 1e9-mass central body, with a
3-bucket mass distribution and circular-orbit velocity rescaling. We provide
that scene (corrected per SURVEY.md bug #1) plus the BASELINE.json configs
(2-body Kepler, Plummer sphere, galaxy merger) and two extension scenes: a
logarithmic-spiral galaxy and a Kuzmin disc (closed-form rotation curve).

All scenes are deterministic in `config.seed` via jax.random (the reference
used a fixed `mt19937 rng(0)`, Simulation.hpp:349).
"""

from __future__ import annotations

from typing import Callable, Dict

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState
from nbodysim_tpu.scenes.disc import uniform_disc
from nbodysim_tpu.scenes.kepler import kepler_orbit, kepler_system
from nbodysim_tpu.scenes.plummer import plummer_sphere
from nbodysim_tpu.scenes.galaxy import galaxy_merger
from nbodysim_tpu.scenes.spiral import spiral_galaxy
from nbodysim_tpu.scenes.kuzmin import kuzmin_disc

SCENES: Dict[str, Callable[..., ParticleState]] = {
    "uniform_disc": uniform_disc,
    "kepler": kepler_orbit,
    "kepler_system": kepler_system,
    "plummer": plummer_sphere,
    "galaxy_merger": galaxy_merger,
    "spiral": spiral_galaxy,
    "kuzmin": kuzmin_disc,
}


def init_scene(name: str, config: SimConfig, **kwargs) -> ParticleState:
    """Instantiate a named scene for the given config."""
    if name not in SCENES:
        raise KeyError(f"unknown scene {name!r}; available: {sorted(SCENES)}")
    return SCENES[name](config, **kwargs)


__all__ = [
    "SCENES",
    "init_scene",
    "uniform_disc",
    "kepler_orbit",
    "kepler_system",
    "plummer_sphere",
    "galaxy_merger",
    "spiral_galaxy",
    "kuzmin_disc",
]
