"""Parity gate: JAX physics vs the native C++ oracle (SURVEY.md §7 step 5)."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nbodysim_tpu as nb
from nbodysim_tpu.physics.forces import direct_accelerations, potential_energy
from nbodysim_tpu.physics.integrators import make_step

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no g++ toolchain"
)


def _system(n, dim=2, seed=0, span=1000.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pos = jax.random.uniform(k1, (n, dim), jnp.float32, -span, span)
    mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)
    return pos, mass


def test_oracle_builds():
    from nbodysim_tpu.oracle import build_oracle

    assert build_oracle().endswith("liboracle.so")


@pytest.mark.parametrize("dim", [2, 3])
def test_forces_match_oracle(dim):
    from nbodysim_tpu.oracle import oracle_accelerations

    pos, mass = _system(256, dim=dim)
    ours = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    ref = oracle_accelerations(pos, mass, eps_sq=1.0)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=scale * 1e-5)


def test_potential_matches_oracle():
    from nbodysim_tpu.oracle import oracle_potential_energy

    pos, mass = _system(256)
    ours = float(potential_energy(pos, mass, 1.0))
    ref = oracle_potential_energy(pos, mass, 1.0)
    assert abs(ours - ref) / abs(ref) < 1e-5


def test_kepler_trajectory_matches_oracle():
    """N=2 Kepler, 200 steps of the full reference step (no collisions
    triggered, boundary/clamp inactive at these scales): trajectories must
    track the oracle step-for-step."""
    from nbodysim_tpu.oracle import oracle_step

    config = nb.SimConfig(
        n=2, dt=0.02, softening=0.0, force_backend="xla",
        enable_collisions=False,
    )
    state = nb.init_scene("kepler", config, central_mass=1e6,
                          semi_major=1000.0, eccentricity=0.2)
    step = make_step(config)

    o_state = state
    for i in range(200):
        state = step(state)
        o_pos, o_vel = oracle_step(o_state, config)
        o_state = o_state.replace(pos=jnp.asarray(o_pos),
                                  vel=jnp.asarray(o_vel))
    np.testing.assert_allclose(
        np.asarray(state.pos), np.asarray(o_state.pos),
        atol=np.abs(np.asarray(o_state.pos)).max() * 1e-4,
    )


def test_full_step_matches_oracle_small_disc():
    """Full step (gravity + clamp + boundary + collisions) on a dense random
    blob vs the oracle. Collisions resolve in different orders (Jacobi vs
    sequential), so use a configuration with isolated pair overlaps only."""
    from nbodysim_tpu.oracle import oracle_step

    # Well-separated pairs that each overlap: deterministic small case.
    pos = jnp.array([
        [0.0, 0.0], [1.5, 0.0],        # overlapping pair 1 (radii 1)
        [100.0, 0.0], [101.2, 0.5],    # overlapping pair 2
        [200.0, 200.0],                # loner
    ])
    vel = jnp.array([
        [1.0, 0.0], [-1.0, 0.0],
        [0.5, 0.2], [-0.3, -0.1],
        [0.0, 0.0],
    ])
    mass = jnp.array([1.0, 2.0, 1.5, 0.5, 3.0])
    radius = jnp.array([1.0, 1.0, 0.8, 0.9, 1.0])
    from nbodysim_tpu.core.state import ParticleState

    state = ParticleState.create(pos, vel, mass, radius)
    config = nb.SimConfig(n=5, dt=0.01, force_backend="xla")

    ours = make_step(config)(state)
    o_pos, o_vel = oracle_step(state, config)
    np.testing.assert_allclose(np.asarray(ours.pos), o_pos, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.vel), o_vel, atol=1e-4)


def test_collision_pair_matches_oracle():
    from nbodysim_tpu.oracle import oracle_resolve_pair
    from nbodysim_tpu.core.state import ParticleState
    from nbodysim_tpu.physics.collisions import _dense_pass

    p1, p2 = [0.0, 0.0], [1.0, 0.5]
    v1, v2 = [2.0, 0.3], [-1.0, -0.2]
    m1, m2, r1, r2 = 2.0, 5.0, 1.0, 0.8
    op1, op2, ov1, ov2, hit = oracle_resolve_pair(
        p1, p2, v1, v2, m1, m2, r1, r2)
    assert hit

    state = ParticleState.create(
        jnp.array([p1, p2]), jnp.array([v1, v2]),
        jnp.array([m1, m2]), jnp.array([r1, r2]))
    out = _dense_pass(state, nb.SimConfig(force_backend="xla"))
    np.testing.assert_allclose(np.asarray(out.pos[0]), op1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.pos[1]), op2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel[0]), ov1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel[1]), ov2, atol=1e-5)
