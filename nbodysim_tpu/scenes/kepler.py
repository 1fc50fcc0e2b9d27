"""Kepler orbit scenes — the analytic parity gates (BASELINE.json config 1).

A 2-body orbit has a closed-form solution, so these scenes anchor the
physics tests: period, energy, and angular momentum are all checkable
against theory. The force law includes Plummer softening, so tests use
orbital radii >> softening (eps=1 vs a=1000 by default) where the softened
dynamics match Kepler to high accuracy.
"""

from __future__ import annotations

import jax.numpy as jnp

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState


def kepler_orbit(
    config: SimConfig,
    central_mass: float = 1.0e6,
    satellite_mass: float = 1.0,
    semi_major: float = 1000.0,
    eccentricity: float = 0.0,
) -> ParticleState:
    """Two-body orbit (central + satellite), started at apoapsis.

    With G=1: vis-viva v^2 = mu (2/r - 1/a), mu = G (M + m). Both bodies are
    given velocities about the barycenter so total momentum is zero.
    """
    dtype = config.dtype
    mu = config.g_const * (central_mass + satellite_mass)
    r_apo = semi_major * (1.0 + eccentricity)
    v_apo = float(jnp.sqrt(mu * (2.0 / r_apo - 1.0 / semi_major)))

    # Positions/velocities about the barycenter.
    f_sat = central_mass / (central_mass + satellite_mass)
    f_cen = satellite_mass / (central_mass + satellite_mass)

    if config.dim == 2:
        pos = jnp.array(
            [[-r_apo * f_cen, 0.0], [r_apo * f_sat, 0.0]], dtype)
        vel = jnp.array(
            [[0.0, -v_apo * f_cen], [0.0, v_apo * f_sat]], dtype)
    else:
        pos = jnp.array(
            [[-r_apo * f_cen, 0.0, 0.0], [r_apo * f_sat, 0.0, 0.0]], dtype)
        vel = jnp.array(
            [[0.0, -v_apo * f_cen, 0.0], [0.0, v_apo * f_sat, 0.0]], dtype)

    mass = jnp.array([central_mass, satellite_mass], dtype)
    radius = jnp.cbrt(mass)
    return ParticleState.create(pos, vel, mass, radius, dtype=dtype)


def kepler_period(config: SimConfig, central_mass: float, satellite_mass: float,
                  semi_major: float) -> float:
    """T = 2 pi sqrt(a^3 / mu)."""
    mu = config.g_const * (central_mass + satellite_mass)
    return float(2.0 * jnp.pi * jnp.sqrt(semi_major ** 3 / mu))


def kepler_system(
    config: SimConfig,
    n: int | None = None,
    central_mass: float = 1.0e6,
    r_min: float = 500.0,
    r_max: float = 5000.0,
) -> ParticleState:
    """Central body + (n-1) light test bodies on circular orbits.

    Deterministic ring of circular orbits — a many-body analytic gate
    (each satellite should hold its radius when satellite masses are tiny).
    """
    import jax

    if n is None:
        n = config.n
    dtype = config.dtype
    key = jax.random.PRNGKey(config.seed)
    k_r, k_phi = jax.random.split(key)

    m = n - 1
    r = jnp.linspace(r_min, r_max, m, dtype=dtype)
    phi = jax.random.uniform(k_phi, (m,), dtype, 0.0, 2.0 * jnp.pi)
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    v = jnp.sqrt(config.g_const * central_mass / r)
    vx = -v * jnp.sin(phi)
    vy = v * jnp.cos(phi)

    if config.dim == 2:
        pos_sat = jnp.stack([x, y], axis=-1)
        vel_sat = jnp.stack([vx, vy], axis=-1)
    else:
        zeros = jnp.zeros_like(x)
        pos_sat = jnp.stack([x, y, zeros], axis=-1)
        vel_sat = jnp.stack([vx, vy, zeros], axis=-1)

    pos = jnp.concatenate([jnp.zeros((1, config.dim), dtype), pos_sat])
    vel = jnp.concatenate([jnp.zeros((1, config.dim), dtype), vel_sat])
    mass = jnp.concatenate(
        [jnp.full((1,), central_mass, dtype), jnp.full((m,), 1e-3, dtype)]
    )
    return ParticleState.create(pos, vel, mass, dtype=dtype)
