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


def test_resolve_backend_crossover():
    """'auto' switches exact -> tree at the measured crossover (quadtree
    in 2D, octree in 3D — each with its own threshold)."""
    from nbodysim_tpu.physics.forces import (
        BH3_AUTO_THRESHOLD, BH_AUTO_THRESHOLD, resolve_backend)

    cfg = nb.SimConfig()
    assert resolve_backend(cfg, 25_000, 2) in ("pallas", "xla")
    assert resolve_backend(cfg, BH_AUTO_THRESHOLD, 2) == "bh"
    assert resolve_backend(cfg, BH3_AUTO_THRESHOLD - 1, 3) != "bh"
    assert resolve_backend(cfg, BH3_AUTO_THRESHOLD, 3) == "bh"
    assert resolve_backend(cfg.replace(force_backend="xla"),
                           1_000_000, 2) == "xla"


def test_bh_default_radius_leans_accurate():
    """VERDICT item 4: the derived acceptance radius is floored at R=3
    (~2e-3 field error); an explicit bh_accept_radius still wins."""
    from nbodysim_tpu.physics.barneshut import _resolve_radius

    assert _resolve_radius(nb.SimConfig()) == 3               # theta=1
    assert _resolve_radius(nb.SimConfig(theta=0.25)) == 5
    assert _resolve_radius(nb.SimConfig(bh_accept_radius=2)) == 2


def test_checkpoint_schema_drift(tmp_path):
    """Unknown config keys in an old checkpoint are dropped instead of
    crashing SimConfig(**cfg) (ADVICE round 1)."""
    import json

    import numpy as onp

    from nbodysim_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    cfg = nb.SimConfig(n=16, force_backend="xla")
    state = nb.init_scene("plummer", cfg)
    path = save_checkpoint(str(tmp_path / "ck"), state, cfg)

    # Inject a bogus (removed/renamed) field into the stored config.
    with onp.load(path) as z:
        payload = {k: z[k] for k in z.files}
    stored = json.loads(bytes(payload["config_json"]).decode())
    stored["some_removed_field"] = 42
    payload["config_json"] = onp.frombuffer(
        json.dumps(stored).encode(), dtype=onp.uint8)
    onp.savez(path, **payload)

    state2, cfg2 = load_checkpoint(path)
    assert cfg2 is not None and cfg2.n == 16
    np.testing.assert_array_equal(np.asarray(state2.pos),
                                  np.asarray(state.pos))


def test_control_file_parsing(tmp_path):
    from nbodysim_tpu.cli import read_control_file

    f = tmp_path / "ctl"
    assert read_control_file(str(f)) == {}
    f.write_text("# retune\n dt = 0.005 \npause=0\nstop=1\njunk\nx=1\n")
    d = read_control_file(str(f))
    assert d == {"dt": 0.005, "pause": False, "stop": True}


def test_control_stop_in_cli_run(tmp_path, capsys):
    """The run loop honors a pre-existing stop directive."""
    from nbodysim_tpu.cli import main

    ctl = tmp_path / "ctl"
    ctl.write_text("stop=1\n")
    main(["run", "--scene", "plummer", "--n", "32", "--steps", "500",
          "--log-every", "10", "--backend", "xla",
          "--control", str(ctl)])
    outp = capsys.readouterr().out
    assert "control: stop" in outp


def test_control_dt_change_applies(tmp_path, capsys):
    from nbodysim_tpu.cli import main

    ctl = tmp_path / "ctl"
    ctl.write_text("dt=0.002\n")
    main(["run", "--scene", "plummer", "--n", "32", "--steps", "20",
          "--log-every", "10", "--backend", "xla",
          "--control", str(ctl)])
    outp = capsys.readouterr().out
    assert "control: dt -> 0.002" in outp


def test_control_dt_clamped_to_reference_range(tmp_path, capsys):
    """--control dt outside the reference slider range [0.001, 0.1]
    (main.cpp:865-893) is clamped and the clamp surfaced."""
    from nbodysim_tpu.cli import main

    ctl = tmp_path / "ctl"
    ctl.write_text("dt=5.0\n")
    main(["run", "--scene", "plummer", "--n", "32", "--steps", "20",
          "--log-every", "10", "--backend", "xla",
          "--control", str(ctl)])
    outp = capsys.readouterr().out
    assert "outside the reference slider range" in outp
    assert "control: dt -> 0.1" in outp


def test_re_resolve_auto_enables_deep_midrun(monkeypatch):
    """VERDICT r3 #6: a merger migrates mass, so a scene that was uniform
    at init can overflow the bucket caps mid-run. The capacity recheck +
    re_resolve_auto escalate the auto config (deep chain ON) from the
    CURRENT distribution; escalation is monotonic and idempotent."""
    import jax

    import nbodysim_tpu.physics.forces as forces
    from nbodysim_tpu.api import Simulation
    from nbodysim_tpu.core.state import ParticleState

    monkeypatch.setattr(forces, "BH_AUTO_THRESHOLD", 1024)
    n = 1 << 15
    cfg = nb.SimConfig(n=n, force_backend="auto", bh_levels=6,
                       enable_collisions=False,
                       integrator="euler_symplectic")
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pos = jax.random.uniform(k1, (n, 2), minval=-1000.0, maxval=1000.0)
    mass = jax.random.uniform(k2, (n,), minval=0.1, maxval=10.0)
    sim = Simulation(cfg, state=ParticleState.create(
        pos=pos, vel=jax.numpy.zeros_like(pos), mass=mass))
    assert sim.config.force_backend == "bh"
    assert sim.config.bh_deep_levels == 0
    assert not sim.re_resolve_auto()           # uniform: nothing to adapt

    # Collapse 3/4 of the particles into a nucleus (mid-run migration).
    blob = sim.state.pos.at[: (3 * n) // 4].multiply(0.002)
    sim.state = sim.state.replace(pos=blob)
    with pytest.warns(RuntimeWarning):
        assert sim.check_capacity(when="after migration")
    with pytest.warns(RuntimeWarning):
        assert sim.re_resolve_auto(when="after migration")
    assert sim.config.bh_deep_levels == -1
    assert not sim.re_resolve_auto()           # idempotent once escalated


def test_re_resolve_auto_switches_collision_phase_midrun():
    """Collision analogue: the auto bucket broad phase overflows after
    mid-run clustering and re_resolve_auto adopts the radius-scaled
    sorted hash — full collision coverage at any clustering."""
    import jax

    from nbodysim_tpu.api import Simulation
    from nbodysim_tpu.core.state import ParticleState
    from nbodysim_tpu.physics.collisions import DENSE_THRESHOLD

    n = DENSE_THRESHOLD * 2
    cfg = nb.SimConfig(n=n, force_backend="xla",
                       integrator="euler_symplectic",
                       enable_collisions=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    pos = jax.random.uniform(k1, (n, 2), minval=-50000.0, maxval=50000.0)
    mass = jax.random.uniform(k2, (n,), minval=0.1, maxval=10.0)
    sim = Simulation(cfg, state=ParticleState.create(
        pos=pos, vel=jax.numpy.zeros_like(pos), mass=mass))
    assert sim.config.collision_broad_phase == "auto"

    blob = sim.state.pos.at[: (3 * n) // 4].multiply(0.0002)
    sim.state = sim.state.replace(pos=blob)
    with pytest.warns(RuntimeWarning):
        assert sim.check_capacity(when="after migration")
    with pytest.warns(RuntimeWarning):
        assert sim.re_resolve_auto(when="after migration")
    assert sim.config.collision_broad_phase == "block"
    assert sim.config.collision_cell_size == 0.0
    assert not sim.re_resolve_auto()
