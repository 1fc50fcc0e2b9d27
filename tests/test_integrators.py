"""Integrator tests: Kepler closed forms, energy conservation, reference
step semantics (clamp / boundary)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState
from nbodysim_tpu.diagnostics.metrics import diagnostics
from nbodysim_tpu.physics.integrators import (
    apply_soft_boundary,
    clamp_velocity,
    make_rollout,
    make_step,
    prime_accelerations,
)
from nbodysim_tpu.scenes.kepler import kepler_orbit, kepler_period


def _kepler_config(**kw):
    base = dict(
        n=2,
        dt=0.05,
        softening=0.0,
        enable_collisions=False,
        enable_boundary=False,
        enable_velocity_clamp=False,
        force_backend="xla",
    )
    base.update(kw)
    return SimConfig(**base)


def test_kepler_circular_orbit_radius():
    """Circular 2-body orbit holds its radius over one period."""
    config = _kepler_config(integrator="leapfrog_kdk")
    state = kepler_orbit(config, central_mass=1e6, semi_major=1000.0)
    state = prime_accelerations(state, config)
    period = kepler_period(config, 1e6, 1.0, 1000.0)
    steps = int(period / config.dt)

    out = make_rollout(config, steps)(state)
    sep0 = float(jnp.linalg.norm(state.pos[1] - state.pos[0]))
    sep1 = float(jnp.linalg.norm(out.pos[1] - out.pos[0]))
    assert abs(sep1 - sep0) / sep0 < 1e-3


def test_kepler_period():
    """After one analytic period the satellite returns to its start."""
    config = _kepler_config(integrator="leapfrog_kdk", dt=0.02)
    state = kepler_orbit(config, central_mass=1e6, semi_major=1000.0)
    state = prime_accelerations(state, config)
    period = kepler_period(config, 1e6, 1.0, 1000.0)
    steps = int(round(period / config.dt))

    out = make_rollout(config, steps)(state)
    # Phase error after one orbit: distance from the start point, relative
    # to the orbit circumference.
    err = float(jnp.linalg.norm(out.pos[1] - state.pos[1]))
    circumference = 2 * np.pi * 1000.0
    assert err / circumference < 0.01


@pytest.mark.parametrize("integrator", ["euler_symplectic", "leapfrog_kdk"])
def test_energy_conservation_kepler(integrator):
    """|dE/E| stays small over several orbits for symplectic integrators."""
    config = _kepler_config(integrator=integrator, dt=0.02)
    state = kepler_orbit(config, central_mass=1e6, semi_major=1000.0,
                         eccentricity=0.3)
    state = prime_accelerations(state, config)
    e0 = float(diagnostics(state, config).total_energy)

    rollout = make_rollout(config, 500)
    drift = 0.0
    for _ in range(10):  # 5000 steps total
        state = rollout(state)
        e = float(diagnostics(state, config).total_energy)
        drift = max(drift, abs(e - e0) / abs(e0))
    tol = 2e-3 if integrator == "euler_symplectic" else 5e-4
    assert drift < tol, f"energy drift {drift} over 5000 steps"


def test_momentum_conservation():
    """Total momentum is conserved without boundary/clamp."""
    config = SimConfig(
        n=128, dt=0.01, enable_collisions=False, enable_boundary=False,
        enable_velocity_clamp=False, force_backend="xla",
        integrator="leapfrog_kdk",
    )
    from nbodysim_tpu.scenes.plummer import plummer_sphere

    state = plummer_sphere(config, n=128)
    state = prime_accelerations(state, config)
    p0 = np.asarray(diagnostics(state, config).momentum)

    out = make_rollout(config, 200)(state)
    p1 = np.asarray(diagnostics(out, config).momentum)
    scale = float(jnp.sum(state.mass * jnp.linalg.norm(state.vel, axis=-1)))
    np.testing.assert_allclose(p1, p0, atol=scale * 1e-5)


def test_velocity_clamp():
    """Reference semantics: |v| <= MAX_VELOCITY, direction preserved."""
    vel = jnp.array([[3000.0, 4000.0], [3.0, 4.0]])
    out = clamp_velocity(vel, 1000.0)
    np.testing.assert_allclose(
        np.asarray(out[0]), [600.0, 800.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), [3.0, 4.0], rtol=1e-6)


def test_soft_boundary():
    """Outside 0.8*R the boundary pushes inward and damps; inside, no-op."""
    config = SimConfig(force_backend="xla")
    pos = jnp.array([[90000.0, 0.0], [100.0, 0.0]])
    vel = jnp.array([[10.0, 0.0], [10.0, 0.0]])
    out = apply_soft_boundary(pos, vel, 0.01, config)
    # Outside body: velocity reduced in +x (inward force is -x) and damped.
    assert float(out[0, 0]) < 10.0
    # Inside body: untouched.
    np.testing.assert_array_equal(np.asarray(out[1]), [10.0, 0.0])


def test_reference_step_order():
    """euler_symplectic = kick with a(t) then drift with v(t+dt)
    (Simulation.hpp:129-163)."""
    config = SimConfig(
        n=2, dt=0.1, enable_collisions=False, enable_boundary=False,
        enable_velocity_clamp=False, force_backend="xla", softening=1.0,
    )
    pos = jnp.array([[0.0, 0.0], [10.0, 0.0]])
    vel = jnp.array([[0.0, 1.0], [0.0, -1.0]])
    mass = jnp.array([100.0, 100.0])
    state = ParticleState.create(pos, vel, mass)

    from nbodysim_tpu.physics.forces import direct_accelerations

    acc = direct_accelerations(pos, mass, 1.0)
    expected_vel = vel + acc * 0.1
    expected_pos = pos + expected_vel * 0.1

    out = make_step(config)(state)
    np.testing.assert_allclose(
        np.asarray(out.vel), np.asarray(expected_vel), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(expected_pos), rtol=1e-6)
    assert int(out.frame) == 1


def test_scan_rollout_matches_python_loop():
    config = _kepler_config(dt=0.01)
    state = kepler_orbit(config)
    step = make_step(config)
    s_loop = state
    for _ in range(10):
        s_loop = step(s_loop)
    s_scan = make_rollout(config, 10)(state)
    np.testing.assert_allclose(
        np.asarray(s_loop.pos), np.asarray(s_scan.pos), rtol=1e-6)
    assert int(s_scan.frame) == 10
