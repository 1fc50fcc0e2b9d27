"""Kuzmin disc scene (razor-thin disc with a closed-form potential).

An extension scene (the reference ships only `uniform_disc`,
Simulation.hpp:347-603). The Kuzmin (1956) disc has surface density
Sigma(r) = a M / (2 pi (r^2 + a^2)^{3/2}) and the exact midplane potential
Phi(r) = -G M / sqrt(r^2 + a^2), so both the radius sampling (inverse-CDF of
the enclosed mass M(<r) = M (1 - a / sqrt(r^2 + a^2))) and the circular
speed v_c^2 = G M r^2 / (r^2 + a^2)^{3/2} are analytic — which makes it a
good rotation-curve regression scene: the measured orbital speeds of the
sampled particles must track the closed form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState


def kuzmin_disc(
    config: SimConfig,
    n: int | None = None,
    total_mass: float = 1.0e4,
    scale_radius: float | None = None,
    r_max_scales: float = 20.0,
    velocity_dispersion: float = 0.0,
) -> ParticleState:
    """Equal-mass Kuzmin disc on circular orbits in its own potential.

    `velocity_dispersion` adds isotropic in-plane Gaussian noise as a
    fraction of the local circular speed (0 = perfectly cold disc).
    Deterministic in config.seed.

    The default mass scale matches the Plummer scene's (1e4 total): per-
    particle masses stay O(10), so close encounters are resolvable at the
    default softening/dt. (A cold razor-thin disc is still Toomre-unstable
    and will clump — that is the physics, not a bug.)
    """
    if n is None:
        n = config.n
    dtype = config.dtype
    dim = config.dim
    if scale_radius is None:
        scale_radius = float(jnp.sqrt(n) * 30.0)
    a = scale_radius

    key = jax.random.PRNGKey(config.seed)
    k_u, k_phi, k_v = jax.random.split(key, 3)

    # Inverse CDF of M(<r)/M = 1 - a / sqrt(r^2 + a^2), truncated at
    # r_max = r_max_scales * a (u capped at the truncation CDF value).
    u_max = 1.0 - 1.0 / jnp.sqrt(1.0 + r_max_scales**2)
    u = jax.random.uniform(k_u, (n,), dtype, 1e-6, float(u_max))
    r = a * jnp.sqrt(1.0 / (1.0 - u) ** 2 - 1.0)
    phi = jax.random.uniform(k_phi, (n,), dtype, 0.0, 2.0 * jnp.pi)
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)

    # Exact circular speed in the Kuzmin potential.
    v_c = jnp.sqrt(config.g_const * total_mass) * r / (r * r + a * a) ** 0.75
    vx = -v_c * jnp.sin(phi)
    vy = v_c * jnp.cos(phi)
    if velocity_dispersion > 0.0:
        noise = jax.random.normal(k_v, (n, 2), dtype)
        vx = vx + velocity_dispersion * v_c * noise[:, 0]
        vy = vy + velocity_dispersion * v_c * noise[:, 1]

    if dim == 2:
        pos = jnp.stack([x, y], -1)
        vel = jnp.stack([vx, vy], -1)
    else:
        zeros = jnp.zeros_like(x)
        pos = jnp.stack([x, y, zeros], -1)
        vel = jnp.stack([vx, vy, zeros], -1)

    mass = jnp.full((n,), total_mass / n, dtype)
    # The flagship radius convention (cbrt(mass), Simulation.hpp:579) is
    # calibrated for O(1) satellite masses; equal-mass tracers of a 1e9-mass
    # disc would get radius ~100 and instantly shred the disc via collision
    # impulses. Size them at a small fraction of the mean interparticle
    # spacing instead, so collisions stay rare as intended.
    radius = jnp.full((n,), 0.1 * a / jnp.sqrt(dtype(n)), dtype)
    return ParticleState.create(pos, vel, mass, radius, dtype=dtype)
