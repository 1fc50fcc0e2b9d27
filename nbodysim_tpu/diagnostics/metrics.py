"""On-device diagnostics.

Two layers:

* `diagnostics(state, config)` — the physically meaningful conserved
  quantities: kinetic/potential/total energy, momentum, angular momentum
  (L_z in 2D), center of mass and its drift. These power the energy-drift
  gate (|dE/E| <= 1e-4 over 10k steps, BASELINE.md). Pure jax, jit-safe.

* `system_metrics(state, config)` — parity with the reference's HUD panel
  (`calculateMetrics`, main.cpp:91-194): central-body selection, stable-body
  filter against an escape-velocity threshold, KE/PE about the central body,
  Kepler period, net force, average speed. The reference has two bugs here
  (SURVEY.md #1/#2: totalMass never accumulated -> COM is inf; dt-smoothed
  rescaling) — we compute the *intended* quantities: totalMass is summed, and
  the dt rescaling is reproduced only when `dt_scaled=True` since it is a
  display choice, not physics.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState
from nbodysim_tpu.physics.forces import potential_energy


class Diagnostics(NamedTuple):
    kinetic: jax.Array          # sum 1/2 m v^2
    potential: jax.Array        # softened pairwise potential
    total_energy: jax.Array
    momentum: jax.Array         # [D]
    angular_momentum: jax.Array # scalar L_z (2D) or [3] (3D)
    center_of_mass: jax.Array   # [D]
    total_mass: jax.Array
    max_speed: jax.Array


def kinetic_energy(state: ParticleState) -> jax.Array:
    v_sq = jnp.sum(state.vel * state.vel, axis=-1)
    return 0.5 * jnp.sum(state.mass * v_sq)


def angular_momentum(state: ParticleState) -> jax.Array:
    """L about the origin: scalar in 2D, vector in 3D."""
    if state.dim == 2:
        lz = state.mass * (
            state.pos[:, 0] * state.vel[:, 1] - state.pos[:, 1] * state.vel[:, 0]
        )
        return jnp.sum(lz)
    return jnp.sum(
        state.mass[:, None] * jnp.cross(state.pos, state.vel), axis=0
    )


def diagnostics(state: ParticleState, config: SimConfig) -> Diagnostics:
    """Conserved-quantity panel; all on-device, one fused computation."""
    ke = kinetic_energy(state)
    pe = potential_energy(
        state.pos, state.mass, config.eps_sq, config.g_const
    )
    total_mass = jnp.sum(state.mass)
    mom = jnp.sum(state.mass[:, None] * state.vel, axis=0)
    com = jnp.sum(state.mass[:, None] * state.pos, axis=0) / total_mass
    max_speed = jnp.sqrt(jnp.max(jnp.sum(state.vel * state.vel, axis=-1)))
    return Diagnostics(
        kinetic=ke,
        potential=pe,
        total_energy=ke + pe,
        momentum=mom,
        angular_momentum=angular_momentum(state),
        center_of_mass=com,
        total_mass=total_mass,
        max_speed=max_speed,
    )


def system_metrics(
    state: ParticleState,
    config: SimConfig,
    dt_scaled: bool = False,
    smoothed_dt: float | None = None,
) -> Dict[str, jax.Array]:
    """Reference HUD metrics (`calculateMetrics`, main.cpp:91-194), corrected.

    Central body = the body with mass > 10% of total mass nearest the center
    of mass (main.cpp:121-136, with SURVEY bug #2 fixed: totalMass is actually
    accumulated). "Stable" bodies are those within 2x the system radius whose
    speed relative to the central body is below the scaled escape velocity
    (main.cpp:144-164). KE/PE/period/net-force/avg-speed accumulate over
    stable bodies only. With `dt_scaled=True`, reproduces the reference's
    final dt-smoothed rescaling (main.cpp:187-191).
    """
    pos, vel, mass = state.pos, state.vel, state.mass
    n = pos.shape[0]
    dt = config.dt if smoothed_dt is None else smoothed_dt

    # System bounding radius (main.cpp:97-110).
    min_b = jnp.min(pos, axis=0)
    max_b = jnp.max(pos, axis=0)
    system_radius = 0.5 * jnp.linalg.norm(max_b - min_b)
    base_orbital_radius = jnp.maximum(1000.0, system_radius)

    total_mass = jnp.sum(mass)
    com = jnp.sum(mass[:, None] * pos, axis=0) / total_mass

    # Central body: mass > 10% total, nearest COM (main.cpp:121-136).
    heavy = mass > 0.1 * total_mass
    dist_sq_com = jnp.sum((pos - com) ** 2, axis=-1)
    score = jnp.where(heavy, dist_sq_com, jnp.inf)
    c = jnp.argmin(score)
    has_central = jnp.any(heavy)

    c_pos, c_vel, c_mass = pos[c], vel[c], mass[c]

    r = pos - c_pos
    dist = jnp.linalg.norm(r, axis=-1)
    rel_vel = vel - c_vel
    speed_sq = jnp.sum(rel_vel * rel_vel, axis=-1)

    # Escape-velocity stability filter (main.cpp:144-164).
    escape_threshold = 2.0 * (1.0 + jnp.log10(dt + 1.0))
    safe_dist = jnp.where(dist > 0, dist, 1.0)
    escape_speed_sq = 2.0 * c_mass / safe_dist
    is_self = jnp.arange(n) == c
    stable = (
        ~is_self
        & (dist <= base_orbital_radius * 2.0)
        & (speed_sq < escape_speed_sq * escape_threshold)
    )
    n_stable = jnp.sum(stable)
    safe_n = jnp.maximum(n_stable, 1)

    ke = jnp.sum(jnp.where(stable, 0.5 * mass * speed_sq, 0.0))
    pe = jnp.sum(jnp.where(stable, -mass * c_mass / safe_dist, 0.0))
    period = jnp.sum(
        jnp.where(
            stable,
            2.0 * jnp.pi * jnp.sqrt(safe_dist ** 3 / c_mass),
            0.0,
        )
    ) / safe_n
    net_force = jnp.sum(
        jnp.where(stable, mass * c_mass / (safe_dist * safe_dist), 0.0)
    )
    avg_speed = jnp.sum(jnp.where(stable, jnp.sqrt(speed_sq), 0.0)) / safe_n

    if dt_scaled:
        # main.cpp:187-191 display scaling.
        ke = ke * dt
        pe = pe * dt
        net_force = net_force * dt
        avg_speed = avg_speed * jnp.sqrt(dt)
        period = period * dt

    zero = jnp.zeros((), pos.dtype)
    return {
        "central_mass": jnp.where(has_central, c_mass, zero),
        "total_mass": total_mass,
        "kinetic_energy": jnp.where(has_central, ke, zero),
        "potential_energy": jnp.where(has_central, pe, zero),
        "total_energy": jnp.where(has_central, ke + pe, zero),
        "avg_orbital_period": jnp.where(has_central, period, zero),
        "net_force": jnp.where(has_central, net_force, zero),
        "avg_speed": jnp.where(has_central, avg_speed, zero),
        "stable_bodies": jnp.where(has_central, n_stable, 0),
    }


class EnergyTracker:
    """Host-side drift tracker: records E(t) and reports |dE/E| vs E(t0)."""

    def __init__(self, config: SimConfig):
        self.config = config
        self._e0 = None
        self.history: list[float] = []

    def update(self, state: ParticleState) -> float:
        d = diagnostics(state, self.config)
        e = float(d.total_energy)
        if self._e0 is None:
            self._e0 = e
        self.history.append(e)
        denom = abs(self._e0) if self._e0 != 0 else 1.0
        return abs(e - self._e0) / denom

    @property
    def max_drift(self) -> float:
        if self._e0 is None or not self.history:
            return 0.0
        denom = abs(self._e0) if self._e0 != 0 else 1.0
        return max(abs(e - self._e0) / denom for e in self.history)
