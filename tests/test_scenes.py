"""Scene-generator tests (IC statistics vs intended distributions)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.scenes import SCENES, init_scene
from nbodysim_tpu.scenes.disc import (
    CENTRAL_MASS,
    CENTRAL_RADIUS,
    OUTER_RADIUS_COEF,
    uniform_disc,
)


def test_uniform_disc_structure():
    config = SimConfig(n=2048, force_backend="xla")
    state = uniform_disc(config)
    assert state.n == 2048
    # Central body: first after sort (r=0), mass 1e9, radius 200
    # (Simulation.hpp:358-359, 584-589).
    assert float(state.mass[0]) == CENTRAL_MASS
    assert float(state.radius[0]) == CENTRAL_RADIUS
    np.testing.assert_array_equal(np.asarray(state.pos[0]), 0.0)
    # Sorted by distance from center.
    r = np.asarray(jnp.linalg.norm(state.pos, axis=-1))
    assert np.all(np.diff(r) >= 0)
    # Satellites fit in a few outer radii (Lorenz attractor x,y ~ [-20, 27]
    # times outer_radius/10).
    outer = np.sqrt(2048) * OUTER_RADIUS_COEF
    assert r[-1] < outer * 5


def test_uniform_disc_mass_buckets():
    config = SimConfig(n=20000, force_backend="xla")
    state = uniform_disc(config)
    m = np.asarray(state.mass[1:])
    # Bucket fractions approx {82.5%, 12.5%, 2.5%} (Simulation.hpp:373-377).
    frac_low = np.mean(m <= 0.8)
    frac_mid = np.mean((m >= 1.2) & (m <= 2.5))
    frac_high = np.mean(m >= 5.0)
    assert abs(frac_low - 0.825) < 0.02
    assert abs(frac_mid - 0.125) < 0.02
    assert abs(frac_high - 0.025) < 0.01
    # radius = cbrt(mass) (hpp:579)
    np.testing.assert_allclose(
        np.asarray(state.radius[1:]), np.cbrt(m), rtol=1e-5)


def test_uniform_disc_tangential_velocity():
    """v is perpendicular to r with speed sqrt(M_enc/r) (hpp:591-600)."""
    config = SimConfig(n=512, force_backend="xla")
    state = uniform_disc(config)
    pos = np.asarray(state.pos[1:])
    vel = np.asarray(state.vel[1:])
    mass = np.asarray(state.mass)
    r = np.linalg.norm(pos, axis=-1)
    # Perpendicular: pos . vel ~ 0
    dots = np.abs(np.sum(pos * vel, axis=-1))
    assert np.all(dots < 1e-2 * r * np.linalg.norm(vel, axis=-1) + 1e-5)
    # Speed = sqrt(M_enclosed / r)
    m_enc = np.cumsum(mass)[1:]
    expected = np.sqrt(m_enc / r)
    np.testing.assert_allclose(
        np.linalg.norm(vel, axis=-1), expected, rtol=1e-3)


def test_disc_determinism():
    config = SimConfig(n=256, seed=7, force_backend="xla")
    a = uniform_disc(config)
    b = uniform_disc(config)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    c = uniform_disc(config.replace(seed=8))
    assert not np.array_equal(np.asarray(a.mass), np.asarray(c.mass))


def test_plummer_virial():
    """Plummer sphere should be near virial equilibrium: 2K + U ~ 0."""
    from nbodysim_tpu.diagnostics.metrics import diagnostics

    config = SimConfig(n=4096, softening=10.0, force_backend="xla")
    state = init_scene("plummer", config, total_mass=1e4, scale_radius=1000.0)
    d = diagnostics(state, config)
    virial = float(2 * d.kinetic + d.potential) / abs(float(d.potential))
    assert abs(virial) < 0.15, f"virial ratio off: {virial}"


def test_kepler_zero_momentum():
    config = SimConfig(n=2, force_backend="xla")
    state = init_scene("kepler", config, eccentricity=0.5)
    p = np.asarray(
        jnp.sum(state.mass[:, None] * state.vel, axis=0))
    np.testing.assert_allclose(p, 0.0, atol=1e-3)


def test_galaxy_merger_shapes():
    config = SimConfig(n=1000, force_backend="xla")
    state = init_scene("galaxy_merger", config)
    assert state.n == 1000
    assert np.all(np.isfinite(np.asarray(state.pos)))
    assert np.all(np.isfinite(np.asarray(state.vel)))
    # Two massive centers.
    m = np.asarray(state.mass)
    assert (m >= 1e8).sum() == 2


def test_all_scenes_run():
    config = SimConfig(n=64, force_backend="xla")
    for name in SCENES:
        state = init_scene(name, config)
        assert state.n >= 2
        assert np.all(np.isfinite(np.asarray(state.pos)))
