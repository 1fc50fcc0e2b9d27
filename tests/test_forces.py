"""Force-law unit and property tests (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.physics.forces import (
    direct_accelerations,
    potential_energy,
)


def _rand_system(n, dim=2, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    pos = jax.random.uniform(k1, (n, dim), jnp.float32, -100.0, 100.0)
    mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)
    return pos, mass


def test_two_body_closed_form():
    """a_i = m_j * d / (d^2 + eps^2)^{3/2} exactly, for a single pair."""
    eps_sq = 1.0
    pos = jnp.array([[0.0, 0.0], [3.0, 4.0]])  # distance 5
    mass = jnp.array([2.0, 8.0])
    acc = direct_accelerations(pos, mass, eps_sq)
    d_sq = 25.0
    inv = (d_sq + eps_sq) ** -1.5
    expected_0 = np.array([3.0, 4.0]) * 8.0 * inv
    expected_1 = np.array([-3.0, -4.0]) * 2.0 * inv
    np.testing.assert_allclose(np.asarray(acc[0]), expected_0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc[1]), expected_1, rtol=1e-6)


def test_newton_third_law():
    """Momentum change rate sum_i m_i a_i == 0 (F_ij = -F_ji)."""
    pos, mass = _rand_system(257)
    acc = direct_accelerations(pos, mass, eps_sq=1.0)
    net = jnp.sum(mass[:, None] * acc, axis=0)
    total = jnp.sum(jnp.abs(mass[:, None] * acc))
    np.testing.assert_allclose(np.asarray(net), 0.0, atol=float(total) * 1e-6)


def test_self_interaction_excluded():
    """A lone particle feels no force; coincident particles don't blow up."""
    acc = direct_accelerations(
        jnp.array([[1.0, 2.0]]), jnp.array([5.0]), eps_sq=1.0
    )
    np.testing.assert_array_equal(np.asarray(acc), 0.0)

    # Two coincident particles: d=0 pairs contribute nothing.
    acc = direct_accelerations(
        jnp.array([[1.0, 2.0], [1.0, 2.0]]), jnp.array([5.0, 3.0]), eps_sq=1.0
    )
    assert np.all(np.isfinite(np.asarray(acc)))
    np.testing.assert_array_equal(np.asarray(acc), 0.0)


def test_blocked_matches_unblocked():
    """Row-blocked evaluation must equal the single-block result."""
    pos, mass = _rand_system(1000)
    full = direct_accelerations(pos, mass, eps_sq=1.0, block_size=2048)
    blocked = direct_accelerations(pos, mass, eps_sq=1.0, block_size=128)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(blocked), rtol=2e-5, atol=1e-6
    )


def test_3d_forces():
    pos, mass = _rand_system(64, dim=3)
    acc = direct_accelerations(pos, mass, eps_sq=1.0)
    assert acc.shape == (64, 3)
    net = jnp.sum(mass[:, None] * acc, axis=0)
    np.testing.assert_allclose(np.asarray(net), 0.0, atol=1e-2)


def test_potential_is_force_potential():
    """Force must equal -grad(U): autodiff the potential and compare."""
    pos, mass = _rand_system(32)
    eps_sq = 1.0

    grad_u = jax.grad(lambda p: potential_energy(p, mass, eps_sq))(pos)
    acc = direct_accelerations(pos, mass, eps_sq)
    force = mass[:, None] * acc
    np.testing.assert_allclose(
        np.asarray(force), -np.asarray(grad_u), rtol=1e-4, atol=1e-4
    )


def test_potential_blocked_matches():
    pos, mass = _rand_system(300)
    u1 = potential_energy(pos, mass, 1.0, block_size=2048)
    u2 = potential_energy(pos, mass, 1.0, block_size=64)
    np.testing.assert_allclose(float(u1), float(u2), rtol=1e-5)


def test_potential_energy_large_matches():
    from nbodysim_tpu.physics.forces import potential_energy_large

    pos, mass = _rand_system(500)
    exact = float(potential_energy(pos, mass, 1.0))
    chunked = potential_energy_large(
        pos, mass, 1.0, pairs_per_call=30000.0)  # forces many host chunks
    np.testing.assert_allclose(chunked, exact, rtol=1e-5)
