"""Time integration.

The reference step (Simulation.hpp:67-75) is:
    attract()  -> acc from gravity
    kick       -> vel += acc*dt, clamp |v| <= MAX_VELOCITY     (hpp:129-138)
    boundary   -> soft exponential inward force + damping       (hpp:140-155)
    drift      -> pos += vel*dt                                 (hpp:160-163)
    collide()  -> collision resolution                          (hpp:216-346)

i.e. semi-implicit (symplectic) Euler with one force evaluation per step.
We provide that exactly (`euler_symplectic`, the parity integrator) plus
kick-drift-kick leapfrog (`leapfrog_kdk`), which reuses the closing
half-kick's acceleration as the next step's opening half-kick — also one
force evaluation per step, but time-reversible and second order, and the
default for energy-drift-gated runs.

Everything here is pure and jit-friendly; `make_step` returns a step function
`state -> state` (dt closed over or passed in), and `make_rollout` wraps it in
`lax.scan` for on-device multi-step rollouts.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState
from nbodysim_tpu.physics.forces import compute_accelerations

AccFn = Callable[[jax.Array, jax.Array], jax.Array]  # (pos, mass) -> acc


def clamp_velocity(vel: jax.Array, max_velocity: float) -> jax.Array:
    """|v| <= max_velocity, preserving direction (Simulation.hpp:133-138)."""
    v_sq = jnp.sum(vel * vel, axis=-1, keepdims=True)
    scale = jnp.where(
        v_sq > max_velocity * max_velocity,
        max_velocity * lax.rsqrt(jnp.maximum(v_sq, 1e-30)),
        1.0,
    )
    return vel * scale


def apply_soft_boundary(
    pos: jax.Array, vel: jax.Array, dt, config: SimConfig
) -> jax.Array:
    """Soft exponential boundary (Simulation.hpp:140-155).

    Outside r > 0.8 * boundary_radius: inward force of magnitude
    BOUNDARY_FORCE * exp(r/soft - 1) applied for dt, then velocity damping.
    """
    soft = config.soft_boundary
    dist_sq = jnp.sum(pos * pos, axis=-1, keepdims=True)
    outside = dist_sq > soft * soft
    inv_dist = lax.rsqrt(jnp.maximum(dist_sq, 1e-30))
    dist = dist_sq * inv_dist
    force = config.boundary_force * jnp.exp(dist / soft - 1.0)
    inward = -pos * inv_dist  # unit vector toward origin
    vel_out = (vel + inward * (force * dt)) * config.boundary_damping
    return jnp.where(outside, vel_out, vel)


def _euler_symplectic(
    state: ParticleState, dt, acc_fn: AccFn, config: SimConfig
) -> ParticleState:
    """Reference step: kick with a(t), clamp, boundary, drift."""
    acc = acc_fn(state.pos, state.mass)
    vel = state.vel + acc * dt
    if config.enable_velocity_clamp:
        vel = clamp_velocity(vel, config.max_velocity)
    if config.enable_boundary:
        vel = apply_soft_boundary(state.pos, vel, dt, config)
    pos = state.pos + vel * dt
    return state.replace(pos=pos, vel=vel, acc=acc, frame=state.frame + 1)


def _leapfrog_kdk(
    state: ParticleState, dt, acc_fn: AccFn, config: SimConfig
) -> ParticleState:
    """Kick-drift-kick leapfrog; `state.acc` carries a(t) between steps.

    v(t+dt/2) = v(t) + a(t) dt/2
    x(t+dt)   = x(t) + v(t+dt/2) dt
    v(t+dt)   = v(t+dt/2) + a(t+dt) dt/2

    One force evaluation per step (a(t) is reused from the previous step's
    closing evaluation). The very first step should be preceded by
    `prime_accelerations` so state.acc holds a(t0).
    """
    half = 0.5 * dt
    vel_h = state.vel + state.acc * half
    pos = state.pos + vel_h * dt
    acc = acc_fn(pos, state.mass)
    vel = vel_h + acc * half
    if config.enable_velocity_clamp:
        vel = clamp_velocity(vel, config.max_velocity)
    if config.enable_boundary:
        vel = apply_soft_boundary(pos, vel, dt, config)
    return state.replace(pos=pos, vel=vel, acc=acc, frame=state.frame + 1)


def prime_accelerations(
    state: ParticleState, config: SimConfig, acc_fn: Optional[AccFn] = None
) -> ParticleState:
    """Fill state.acc with a(t0); required before the first leapfrog step."""
    if acc_fn is None:
        acc_fn = lambda p, m: compute_accelerations(p, m, config)
    return state.replace(acc=acc_fn(state.pos, state.mass))


def make_step(
    config: SimConfig,
    acc_fn: Optional[AccFn] = None,
    collide_fn: Optional[Callable[[ParticleState, SimConfig], ParticleState]] = None,
    jit: bool = True,
) -> Callable[[ParticleState], ParticleState]:
    """Build the full fused step: gravity + integration + collisions.

    The returned function is `state -> state` with everything (force kernel,
    integrator arithmetic, collision pass) fused under a single jit, so
    intermediate [N, D] arrays never round-trip through the host and XLA can
    fuse the elementwise chains into the force kernel's epilogue.
    """
    if acc_fn is None:
        acc_fn = lambda p, m: compute_accelerations(p, m, config)
    if collide_fn is None and config.enable_collisions:
        from nbodysim_tpu.physics.collisions import resolve_collisions

        collide_fn = resolve_collisions

    integ = _euler_symplectic if config.integrator == "euler_symplectic" else _leapfrog_kdk
    dt = config.dtype(config.dt) if callable(config.dtype) else config.dt

    def step(state: ParticleState, dt=dt) -> ParticleState:
        state = integ(state, dt, acc_fn, config)
        if collide_fn is not None:
            state = collide_fn(state, config)
        return state

    return jax.jit(step) if jit else step


def make_rollout(
    config: SimConfig,
    num_steps: int,
    acc_fn: Optional[AccFn] = None,
    jit: bool = True,
) -> Callable[[ParticleState], ParticleState]:
    """On-device multi-step rollout via lax.scan (no per-step host dispatch)."""
    step = make_step(config, acc_fn=acc_fn, jit=False)

    def rollout(state: ParticleState) -> ParticleState:
        def body(s, _):
            return step(s), None

        out, _ = lax.scan(body, state, None, length=num_steps)
        return out

    return jax.jit(rollout) if jit else rollout
