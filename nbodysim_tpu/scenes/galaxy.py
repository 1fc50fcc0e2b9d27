"""Galaxy-merger scene (BASELINE config 5): two rotating discs on a collision
course, each a central massive body + satellites on circular orbits."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState


def _single_disc(
    key, n: int, central_mass: float, disc_radius: float, dtype, dim: int,
    g_const: float,
):
    """Exponential disc of satellites around one central mass (2D plane)."""
    k_r, k_phi, k_m = jax.random.split(key, 3)
    m = n - 1
    # Exponential surface density with scale length R/4, truncated at R.
    u = jax.random.uniform(k_r, (m,), dtype, 1e-4, 1.0 - 1e-4)
    scale_len = disc_radius / 4.0
    r = -scale_len * jnp.log1p(-u * (1.0 - jnp.exp(-disc_radius / scale_len)))
    r = jnp.clip(r, disc_radius * 0.02, disc_radius)
    phi = jax.random.uniform(k_phi, (m,), dtype, 0.0, 2.0 * jnp.pi)
    x, y = r * jnp.cos(phi), r * jnp.sin(phi)

    sat_mass = jax.random.uniform(k_m, (m,), dtype, 0.1, 2.0)
    # Circular speed about central mass + enclosed satellites (approximate by
    # central mass only; satellites are light).
    v = jnp.sqrt(g_const * central_mass / r)
    vx, vy = -v * jnp.sin(phi), v * jnp.cos(phi)

    if dim == 2:
        pos = jnp.concatenate(
            [jnp.zeros((1, 2), dtype), jnp.stack([x, y], -1)])
        vel = jnp.concatenate(
            [jnp.zeros((1, 2), dtype), jnp.stack([vx, vy], -1)])
    else:
        zeros = jnp.zeros_like(x)
        pos = jnp.concatenate(
            [jnp.zeros((1, 3), dtype), jnp.stack([x, y, zeros], -1)])
        vel = jnp.concatenate(
            [jnp.zeros((1, 3), dtype), jnp.stack([vx, vy, zeros], -1)])
    mass = jnp.concatenate([jnp.full((1,), central_mass, dtype), sat_mass])
    return pos, vel, mass


def galaxy_merger(
    config: SimConfig,
    n: int | None = None,
    central_mass: float = 5.0e8,
    disc_radius: float | None = None,
    separation: float | None = None,
    impact_parameter: float | None = None,
    approach_speed: float | None = None,
) -> ParticleState:
    """Two discs of n/2 bodies each, approaching with an impact parameter."""
    if n is None:
        n = config.n
    dtype = config.dtype
    dim = config.dim
    if disc_radius is None:
        disc_radius = float(jnp.sqrt(n / 2) * 150.0)
    if separation is None:
        separation = 3.0 * disc_radius
    if impact_parameter is None:
        impact_parameter = 0.5 * disc_radius
    if approach_speed is None:
        # A fraction of the mutual orbital speed at this separation.
        approach_speed = float(
            0.5 * jnp.sqrt(config.g_const * 2 * central_mass / separation))

    key = jax.random.PRNGKey(config.seed)
    k1, k2 = jax.random.split(key)
    n1 = n // 2
    n2 = n - n1
    p1, v1, m1 = _single_disc(
        k1, n1, central_mass, disc_radius, dtype, dim, config.g_const)
    p2, v2, m2 = _single_disc(
        k2, n2, central_mass, disc_radius, dtype, dim, config.g_const)

    shift1 = jnp.zeros((dim,), dtype).at[0].set(-separation / 2)
    shift1 = shift1.at[1].set(-impact_parameter / 2)
    shift2 = jnp.zeros((dim,), dtype).at[0].set(separation / 2)
    shift2 = shift2.at[1].set(impact_parameter / 2)
    boost1 = jnp.zeros((dim,), dtype).at[0].set(approach_speed / 2)
    boost2 = jnp.zeros((dim,), dtype).at[0].set(-approach_speed / 2)

    pos = jnp.concatenate([p1 + shift1, p2 + shift2])
    vel = jnp.concatenate([v1 + boost1, v2 + boost2])
    mass = jnp.concatenate([m1, m2])
    return ParticleState.create(pos, vel, mass, dtype=dtype)
