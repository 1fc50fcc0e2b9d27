"""Spiral-arm galaxy scene.

An extension scene (the reference ships only `uniform_disc`,
Simulation.hpp:347-603, whose ~25 alternative spawn curves — hearts, roses,
lissajous — live in comments at Simulation.hpp:408-556; logarithmic spiral
arms are the astrophysically standard member of that family). Satellites are
scattered along m logarithmic spiral arms r = r_min * exp(b * theta) around
a dominant central body, then given circular-orbit speeds from the enclosed
mass, exactly like the flagship disc (Simulation.hpp:591-600).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState

CENTRAL_MASS = 1.0e9     # match the flagship disc (Simulation.hpp:358)
CENTRAL_RADIUS = 200.0   # Simulation.hpp:359


def spiral_galaxy(
    config: SimConfig,
    n: int | None = None,
    n_arms: int = 2,
    pitch: float = 0.28,
    central_mass: float = CENTRAL_MASS,
    outer_radius: float | None = None,
    arm_scatter: float = 0.12,
    thickness: float = 0.02,
) -> ParticleState:
    """Logarithmic-spiral galaxy: central body + satellites on n_arms arms.

    pitch is the spiral's growth rate b (r = r_min e^{b theta}); arm_scatter
    is the Gaussian azimuthal/radial scatter as a fraction of local radius;
    thickness is the vertical Gaussian sigma as a fraction of outer_radius
    (dim=3 only). Deterministic in config.seed.
    """
    if n is None:
        n = config.n
    dtype = config.dtype
    dim = config.dim
    m = n - 1
    if outer_radius is None:
        # Same footprint scaling as the flagship disc (Simulation.hpp:353).
        outer_radius = float(jnp.sqrt(n) * 300.7)
    r_min = 0.02 * outer_radius

    key = jax.random.PRNGKey(config.seed)
    k_t, k_a, k_s, k_r, k_m, k_z = jax.random.split(key, 6)

    # Sample arc position uniformly in enclosed area (r^2 uniform) so the
    # surface density falls off ~1/r like a real disc, then solve for the
    # arm angle theta = log(r / r_min) / b.
    u = jax.random.uniform(k_t, (m,), dtype, 1e-6, 1.0)
    r = r_min + (outer_radius - r_min) * jnp.sqrt(u)
    theta = jnp.log(r / r_min) / pitch

    arm = jax.random.randint(k_a, (m,), 0, n_arms)
    phi = (theta
           + arm.astype(dtype) * (2.0 * jnp.pi / n_arms)
           + arm_scatter * jax.random.normal(k_s, (m,), dtype))
    r = r * (1.0 + arm_scatter * jax.random.normal(k_r, (m,), dtype))
    r = jnp.clip(r, r_min, None)

    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)

    # 3-bucket satellite masses like the flagship disc (Simulation.hpp:373-377).
    from nbodysim_tpu.scenes.disc import sample_bucket_masses

    sat_mass = sample_bucket_masses(k_m, m, dtype)

    # Circular speed from enclosed mass: sort by radius, cumulative sum
    # (Simulation.hpp:584-600, with the corrected normalize — SURVEY bug #1).
    order = jnp.argsort(r)
    r_s = r[order]
    m_enc = central_mass + jnp.cumsum(sat_mass[order]) - sat_mass[order]
    v_s = jnp.sqrt(config.g_const * m_enc / r_s)
    v = jnp.zeros_like(r).at[order].set(v_s)
    vx = -v * jnp.sin(phi)
    vy = v * jnp.cos(phi)

    if dim == 2:
        pos = jnp.concatenate(
            [jnp.zeros((1, 2), dtype), jnp.stack([x, y], -1)])
        vel = jnp.concatenate(
            [jnp.zeros((1, 2), dtype), jnp.stack([vx, vy], -1)])
    else:
        z = thickness * outer_radius * jax.random.normal(k_z, (m,), dtype)
        pos = jnp.concatenate(
            [jnp.zeros((1, 3), dtype), jnp.stack([x, y, z], -1)])
        vel = jnp.concatenate(
            [jnp.zeros((1, 3), dtype),
             jnp.stack([vx, vy, jnp.zeros_like(vx)], -1)])

    mass = jnp.concatenate([jnp.full((1,), central_mass, dtype), sat_mass])
    radius = jnp.concatenate(
        [jnp.full((1,), CENTRAL_RADIUS, dtype), jnp.cbrt(sat_mass)])
    return ParticleState.create(pos, vel, mass, radius=radius, dtype=dtype)
