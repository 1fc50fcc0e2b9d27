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


def test_spiral_structure():
    config = SimConfig(n=4096, force_backend="xla")
    # Small scatter so the arm-concentration check is sharp (the radial
    # scatter also shifts the implied arm phase by ~scatter/pitch).
    state = init_scene("spiral", config, arm_scatter=0.03)
    assert state.n == 4096
    # Central body first, mass 1e9, radius 200 (flagship-disc convention).
    assert float(state.mass[0]) == 1.0e9
    assert float(state.radius[0]) == 200.0
    pos = np.asarray(state.pos[1:])
    vel = np.asarray(state.vel[1:])
    r = np.linalg.norm(pos, axis=-1)
    # Arm structure: satellite angles cluster around the log-spiral phase.
    # theta(r) = log(r/r_min)/pitch; residual (phi - theta) mod (2pi/m)
    # should concentrate near 0 (scatter 0.12 rad), not be uniform.
    outer = np.sqrt(4096) * 300.7
    theta = np.log(r / (0.02 * outer)) / 0.28
    phi = np.arctan2(pos[:, 1], pos[:, 0])
    resid = (phi - theta) % (2 * np.pi / 2)
    resid = np.minimum(resid, 2 * np.pi / 2 - resid)  # distance to arm
    # Combined azimuthal + radial-scatter-induced spread ~ 0.03*(1+1/0.28)
    # ~ 0.14 rad; a uniform azimuth distribution would give median ~ 0.79.
    assert np.median(resid) < 0.3, "satellites not concentrated on arms"
    # Velocities tangential: pos.vel ~ 0.
    dots = np.abs(np.sum(pos * vel, axis=-1))
    speeds = np.linalg.norm(vel, axis=-1)
    assert np.all(dots < 1e-2 * r * speeds + 1e-5)


def test_kuzmin_rotation_curve_and_profile():
    config = SimConfig(n=8192, force_backend="xla", seed=3)
    total_mass, a = 1.0e9, 500.0
    state = init_scene("kuzmin", config, total_mass=total_mass,
                       scale_radius=a)
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    r = np.linalg.norm(pos, axis=-1)
    # Rotation curve matches the closed form v_c^2 = G M r^2/(r^2+a^2)^1.5.
    v_expected = np.sqrt(1.0 * total_mass) * r / (r**2 + a**2) ** 0.75
    np.testing.assert_allclose(
        np.linalg.norm(vel, axis=-1), v_expected, rtol=1e-4)
    # Enclosed-mass profile: median radius of the sample should sit at the
    # (truncation-adjusted) analytic half-mass radius.
    u_max = 1.0 - 1.0 / np.sqrt(1.0 + 20.0**2)
    u_med = 0.5 * u_max
    r_med_expected = a * np.sqrt(1.0 / (1.0 - u_med) ** 2 - 1.0)
    assert abs(np.median(r) - r_med_expected) < 0.05 * r_med_expected


def test_extension_scenes_3d():
    config = SimConfig(n=256, dim=3, force_backend="xla")
    for name in ("spiral", "kuzmin"):
        state = init_scene(name, config)
        assert state.pos.shape == (256, 3)
        assert np.all(np.isfinite(np.asarray(state.pos)))
        assert np.all(np.isfinite(np.asarray(state.vel)))
