"""The reference's flagship scene: Lorenz-attractor disc.

Reference: Simulation.hpp:347-603 `uniform_disc(n)`:
  - central body: mass 1e9, radius 200, at the origin (hpp:358-359)
  - outer_radius = sqrt(n) * 300.7 (hpp:353)
  - remaining n-1 bodies placed by integrating a Lorenz attractor
    (sigma=10, rho=28, beta=8/3; x0=0.1, dt=0.01; hpp:398-405, 523-535),
    position = (x, y) * outer_radius/10
  - tangential unit velocity (-y, x)/|pos| (hpp:537-538; the reference's
    `normalize()` has a bug that divides x twice, Vec2.hpp:229-234 — we
    implement the intended unit vector, reproducible via `ref_normalize_bug`)
  - masses from 3 buckets {82.5%: [5e-5, 0.8], 12.5%: [1.2, 2.5],
    2.5%: [5, 50]} (hpp:373-377); radius = cbrt(mass) (hpp:579)
  - bodies sorted by distance from center, velocities rescaled to circular
    orbit speed v = sqrt(M_enclosed / r) (hpp:584-600).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState

CENTRAL_MASS = 1.0e9
CENTRAL_RADIUS = 200.0
OUTER_RADIUS_COEF = 300.7

LORENZ_SIGMA = 10.0
LORENZ_RHO = 28.0
LORENZ_BETA = 8.0 / 3.0
LORENZ_DT = 0.01

MASS_BUCKETS = (
    # (min_mass, max_mass, probability) — Simulation.hpp:373-377
    (0.00005, 0.8, 0.825),
    (1.2, 2.5, 0.125),
    (5.0, 50.0, 0.025),
)


def _lorenz_positions(n: int, dtype) -> jax.Array:
    """Integrate the Lorenz attractor n steps; return (x, y) track. [n, 2]."""

    def step(carry, _):
        x, y, z = carry
        dx = LORENZ_SIGMA * (y - x)
        dy = x * (LORENZ_RHO - z) - y
        dz = x * y - LORENZ_BETA * z
        new = (x + dx * LORENZ_DT, y + dy * LORENZ_DT, z + dz * LORENZ_DT)
        return new, jnp.stack([new[0], new[1]])

    init = (dtype(0.1), dtype(0.0), dtype(0.0))
    _, track = lax.scan(step, init, None, length=n)
    return track


def sample_bucket_masses(key: jax.Array, n: int, dtype) -> jax.Array:
    """3-bucket mass distribution (Simulation.hpp:373-377, 565-577)."""
    k_bucket, k_mass = jax.random.split(key)
    probs = jnp.array([b[2] for b in MASS_BUCKETS], dtype)
    probs = probs / probs.sum()
    idx = jax.random.choice(k_bucket, len(MASS_BUCKETS), shape=(n,), p=probs)
    lo = jnp.array([b[0] for b in MASS_BUCKETS], dtype)[idx]
    hi = jnp.array([b[1] for b in MASS_BUCKETS], dtype)[idx]
    u = jax.random.uniform(k_mass, (n,), dtype)
    return lo + u * (hi - lo)


def uniform_disc(
    config: SimConfig,
    n: int | None = None,
    ref_normalize_bug: bool = False,
) -> ParticleState:
    """Lorenz-attractor disc with a central massive body.

    `ref_normalize_bug=True` reproduces the reference's broken
    `Vec2::normalize()` (x divided by |v| twice, Vec2.hpp:229-234) for
    behavioural comparison; default is the intended unit tangent.
    """
    if n is None:
        n = config.n
    dtype = config.dtype
    if config.dim != 2:
        raise ValueError("uniform_disc is a 2D scene (reference is 2D)")

    key = jax.random.PRNGKey(config.seed)
    outer_radius = jnp.sqrt(dtype(n)) * OUTER_RADIUS_COEF

    # Satellite positions from the Lorenz track (hpp:523-535).
    track = _lorenz_positions(n - 1, dtype)                # [n-1, 2]
    scale = outer_radius / 10.0
    pos_sat = track * scale

    # Tangential unit velocities (hpp:537-538).
    tangent = jnp.stack([-pos_sat[:, 1], pos_sat[:, 0]], axis=-1)
    norm = jnp.linalg.norm(tangent, axis=-1, keepdims=True)
    safe = jnp.where(norm > 0, norm, 1.0)
    if ref_normalize_bug:
        # normalize() divides x twice: (x/m/m, y/m)
        vel_sat = jnp.stack(
            [tangent[:, 0] / safe[:, 0] ** 2, tangent[:, 1] / safe[:, 0]],
            axis=-1,
        )
    else:
        vel_sat = tangent / safe

    mass_sat = sample_bucket_masses(key, n - 1, dtype)

    # Prepend the central body (hpp:358-359).
    pos = jnp.concatenate([jnp.zeros((1, 2), dtype), pos_sat])
    vel = jnp.concatenate([jnp.zeros((1, 2), dtype), vel_sat])
    mass = jnp.concatenate([jnp.full((1,), CENTRAL_MASS, dtype), mass_sat])
    radius = jnp.concatenate(
        [jnp.full((1,), CENTRAL_RADIUS, dtype), jnp.cbrt(mass_sat)]
    )

    # Sort by distance from center (hpp:584-589). Central body has r=0 so it
    # stays first.
    r_sq = jnp.sum(pos * pos, axis=-1)
    order = jnp.argsort(r_sq)
    pos, vel, mass, radius = pos[order], vel[order], mass[order], radius[order]

    # Circular-orbit speed from enclosed mass: v = sqrt(M_enc / r)
    # (hpp:591-600; M_enc includes own mass per the reference's loop order).
    m_enc = jnp.cumsum(mass)
    r = jnp.sqrt(jnp.sum(pos * pos, axis=-1))
    v_circ = jnp.sqrt(m_enc / jnp.where(r > 0, r, 1.0))
    vel = vel * jnp.where(r > 0, v_circ, 0.0)[:, None]

    return ParticleState.create(pos, vel, mass, radius, dtype=dtype)
