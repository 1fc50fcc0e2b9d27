"""Coverage for auxiliary behaviors: nan-debugging hook, dtype policy,
3D end-to-end, the functional simulate() API, kepler_system scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nbodysim_tpu as nb
from nbodysim_tpu.physics.integrators import make_step, prime_accelerations


def test_debug_nans_clean_step():
    """SURVEY §5 race-detection row: the step must be NaN-free under
    jax_debug_nans (the functional analogue of running sanitizers)."""
    jax.config.update("jax_debug_nans", True)
    try:
        cfg = nb.SimConfig(n=64, force_backend="xla")
        state = nb.init_scene("uniform_disc", cfg)
        out = make_step(cfg)(state)
        assert np.all(np.isfinite(np.asarray(out.pos)))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_float64_parity_path():
    """dtype policy: f64 on CPU as a high-precision oracle mode."""
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = nb.SimConfig(n=32, dtype=jnp.float64, force_backend="xla",
                           enable_collisions=False)
        state = nb.init_scene("plummer", cfg)
        assert state.pos.dtype == jnp.float64
        out = make_step(cfg)(state)
        assert out.pos.dtype == jnp.float64
        assert np.all(np.isfinite(np.asarray(out.pos)))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_3d_full_step_with_collisions():
    cfg = nb.SimConfig(n=128, dim=3, force_backend="xla")
    state = nb.init_scene("plummer", cfg)
    out = make_step(cfg)(state)
    assert out.pos.shape == (128, 3)
    assert np.all(np.isfinite(np.asarray(out.pos)))


def test_simulate_functional_api():
    cfg = nb.SimConfig(n=64, integrator="leapfrog_kdk", force_backend="xla",
                       enable_collisions=False)
    state = nb.init_scene("plummer", cfg)
    out = nb.simulate(state, cfg, num_steps=25)
    assert int(out.frame) == 25


def test_kepler_system_orbits_hold():
    """Light satellites on circular orbits around a dominant mass keep
    their radii over a few hundred steps."""
    cfg = nb.SimConfig(
        n=33, dt=0.05, softening=0.0, force_backend="xla",
        integrator="leapfrog_kdk", enable_collisions=False,
        enable_boundary=False, enable_velocity_clamp=False,
    )
    state = nb.init_scene("kepler_system", cfg, central_mass=1e6)
    state = prime_accelerations(state, cfg)
    r0 = np.asarray(jnp.linalg.norm(state.pos[1:], axis=-1))
    out = nb.simulate(state, cfg, num_steps=400)
    r1 = np.asarray(jnp.linalg.norm(out.pos[1:] - out.pos[0], axis=-1))
    np.testing.assert_allclose(r1, r0, rtol=5e-3)


def test_set_dt_rebuilds_step():
    sim = nb.Simulation(nb.SimConfig(n=32, force_backend="xla"),
                        scene="plummer")
    sim.step()
    sim.set_dt(0.005)
    assert sim.dt == 0.005
    sim.step()
    assert sim.frame == 2
