"""Plummer sphere — equilibrium self-gravitating cluster (BASELINE config 2).

Standard Aarseth-Henon-Wielen sampling: density rho(r) ~ (1 + r^2/a^2)^(-5/2),
enclosed mass M(r) = M r^3 / (r^2 + a^2)^(3/2), velocities drawn from the
isotropic distribution f(q) ~ q^2 (1 - q^2)^(7/2) by rejection, all done with
fixed shapes under jit. In virial equilibrium the cluster should hold its
shape, making it the standard energy-drift gate for collisionless codes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState


def plummer_sphere(
    config: SimConfig,
    n: int | None = None,
    total_mass: float = 1.0e4,
    scale_radius: float = 1000.0,
    virialize: bool = True,
) -> ParticleState:
    """Sample a Plummer model; with `virialize`, rescale speeds so 2K = -U
    against the *actual* softened potential of the realized particle set —
    exact equilibrium for any dim/softening (the analytic f(q) assumes 3D
    unsoftened gravity; in this framework's 2D default the same radial
    profile binds tighter, so the raw sample is slightly sub-virial)."""
    if n is None:
        n = config.n
    dtype = config.dtype
    dim = config.dim
    key = jax.random.PRNGKey(config.seed)
    k_r, k_dir, k_q, k_vdir = jax.random.split(key, 4)

    g = config.g_const
    a = scale_radius

    # Radius from inverse-CDF of the enclosed-mass fraction.
    u = jax.random.uniform(k_r, (n,), dtype, 1e-6, 1.0 - 1e-6)
    r = a / jnp.sqrt(u ** (-2.0 / 3.0) - 1.0)

    # Isotropic direction.
    dir_pos = jax.random.normal(k_dir, (n, dim), dtype)
    dir_pos = dir_pos / jnp.linalg.norm(dir_pos, axis=-1, keepdims=True)
    pos = r[:, None] * dir_pos

    # Speed: q = v/v_esc with f(q) ~ q^2 (1-q^2)^{7/2}; fixed-shape rejection
    # (draw a batch of candidates per particle; first acceptance wins —
    # 16 candidates gives acceptance failure probability < 1e-4 per particle).
    n_cand = 16
    kq1, kq2 = jax.random.split(k_q)
    qs = jax.random.uniform(kq1, (n, n_cand), dtype)
    ys = jax.random.uniform(kq2, (n, n_cand), dtype, 0.0, 0.1)
    accept = ys < qs ** 2 * (1.0 - qs ** 2) ** 3.5
    first = jnp.argmax(accept, axis=1)
    any_ok = jnp.any(accept, axis=1)
    q = jnp.where(any_ok, qs[jnp.arange(n), first], 0.5)

    v_esc = jnp.sqrt(2.0 * g * total_mass) * (r * r + a * a) ** (-0.25)
    speed = q * v_esc

    dir_vel = jax.random.normal(k_vdir, (n, dim), dtype)
    dir_vel = dir_vel / jnp.linalg.norm(dir_vel, axis=-1, keepdims=True)
    vel = speed[:, None] * dir_vel

    mass = jnp.full((n,), total_mass / n, dtype)

    # Zero out net momentum and recentre (standard practice).
    vel = vel - jnp.mean(vel * mass[:, None], axis=0) / jnp.mean(mass)
    pos = pos - jnp.mean(pos * mass[:, None], axis=0) / jnp.mean(mass)

    if virialize:
        from nbodysim_tpu.physics.forces import potential_energy

        u = potential_energy(pos, mass, config.eps_sq, g)
        k = 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=-1))
        vel = vel * jnp.sqrt(jnp.maximum(-0.5 * u, 0.0) / jnp.maximum(k, 1e-30))

    return ParticleState.create(pos, vel, mass, dtype=dtype)
