"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nbodysim_tpu as nb
from nbodysim_tpu.parallel import make_mesh, shard_state, make_sharded_step
from nbodysim_tpu.parallel.sharded import make_sharded_rollout
from nbodysim_tpu.physics.integrators import make_step, prime_accelerations


def _cfg(**kw):
    base = dict(n=256, force_backend="xla")
    base.update(kw)
    return nb.SimConfig(**base)


def test_sharded_matches_single_chip(eight_devices):
    cfg = _cfg()
    state = nb.init_scene("uniform_disc", cfg)
    mesh = make_mesh(8)
    out_s = make_sharded_step(cfg, mesh)(shard_state(state, mesh))
    out_1 = make_step(cfg)(state)
    scale = float(jnp.abs(out_1.pos).max())
    np.testing.assert_allclose(
        np.asarray(out_s.pos), np.asarray(out_1.pos), atol=scale * 1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_s.vel), np.asarray(out_1.vel), atol=1e-3
    )


def test_sharded_leapfrog_matches(eight_devices):
    cfg = _cfg(integrator="leapfrog_kdk", enable_collisions=False)
    state = prime_accelerations(nb.init_scene("plummer", cfg), cfg)
    mesh = make_mesh(8)
    out_s = make_sharded_step(cfg, mesh)(shard_state(state, mesh))
    out_1 = make_step(cfg)(state)
    scale = float(jnp.abs(out_1.pos).max())
    np.testing.assert_allclose(
        np.asarray(out_s.pos), np.asarray(out_1.pos), atol=scale * 1e-6
    )


def test_sharded_rollout(eight_devices):
    cfg = _cfg(enable_collisions=False)
    state = nb.init_scene("uniform_disc", cfg)
    mesh = make_mesh(8)
    out = make_sharded_rollout(cfg, mesh, 10)(shard_state(state, mesh))
    assert int(out.frame) == 10
    assert np.all(np.isfinite(np.asarray(out.pos)))


def test_shard_state_validates_divisibility(eight_devices):
    cfg = _cfg(n=257)
    state = nb.init_scene("uniform_disc", cfg)
    with pytest.raises(ValueError, match="divide"):
        shard_state(state, make_mesh(8))


def test_mesh_subset(eight_devices):
    """Sharded step works on a 2-device submesh too."""
    cfg = _cfg(n=64)
    state = nb.init_scene("uniform_disc", cfg)
    mesh = make_mesh(2)
    out = make_sharded_step(cfg, mesh)(shard_state(state, mesh))
    ref = make_step(cfg)(state)
    scale = float(jnp.abs(ref.pos).max())
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), atol=scale * 1e-6
    )


def test_graft_entry(eight_devices):
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out.pos)))

    ge.dryrun_multichip(8)


def test_sharded_bh_backend(eight_devices):
    """force_backend='bh' under the sharded step (replicated tree)."""
    cfg = _cfg(n=512, force_backend="bh", enable_collisions=False,
               integrator="leapfrog_kdk")
    state = nb.init_scene("uniform_disc", cfg)
    mesh = make_mesh(8)
    from nbodysim_tpu.parallel import prime_accelerations_sharded

    ss = prime_accelerations_sharded(shard_state(state, mesh), cfg, mesh)
    out_s = make_sharded_step(cfg, mesh)(ss)
    out_1 = make_step(cfg)(prime_accelerations(state, cfg))
    scale = float(jnp.abs(out_1.pos).max())
    np.testing.assert_allclose(
        np.asarray(out_s.pos), np.asarray(out_1.pos), atol=scale * 1e-6)


def test_sharded_checkpoint_resume_bitwise(eight_devices, tmp_path):
    """Multi-chip checkpoint/resume (VERDICT r3 #8): save a SHARDED state
    (the np.asarray in save_checkpoint gathers across the mesh), restore,
    re-shard over the same 8-device mesh, and resume — the resumed
    trajectory must be BITWISE identical to the uninterrupted sharded run
    (the single-host guarantee, held across the mesh)."""
    from nbodysim_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from nbodysim_tpu.parallel import prime_accelerations_sharded

    cfg = nb.SimConfig(n=256, force_backend="xla",
                       integrator="leapfrog_kdk")
    mesh = make_mesh(8)
    state = nb.init_scene("uniform_disc", cfg)
    ss = prime_accelerations_sharded(shard_state(state, mesh), cfg, mesh)
    step = make_sharded_step(cfg, mesh)
    for _ in range(3):
        ss = step(ss)

    path = save_checkpoint(str(tmp_path / "ck"), ss, cfg)

    # Uninterrupted continuation.
    ref = ss
    for _ in range(3):
        ref = step(ref)

    # Restore -> reshard -> resume with a freshly built step (the
    # one-call io.load_checkpoint_sharded covers load + placement).
    from nbodysim_tpu.io import load_checkpoint_sharded

    rs, cfg2 = load_checkpoint_sharded(path, mesh)
    assert cfg2 is not None and cfg2.n == cfg.n
    step2 = make_sharded_step(cfg2, mesh)
    out = rs
    for _ in range(3):
        out = step2(out)

    assert int(out.frame) == int(ref.frame)
    for f in ("pos", "vel", "acc", "mass", "radius"):
        a, b = np.asarray(getattr(out, f)), np.asarray(getattr(ref, f))
        assert np.array_equal(a, b), f"{f} not bitwise equal after resume"


def test_sharded_checkpoint_reshard_other_mesh(eight_devices, tmp_path):
    """A checkpoint written under one mesh restores onto a DIFFERENT mesh
    size: the state itself is mesh-independent; only collective summation
    order differs, so the resumed physics matches to roundoff."""
    from nbodysim_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from nbodysim_tpu.parallel import prime_accelerations_sharded

    cfg = nb.SimConfig(n=256, force_backend="xla",
                       integrator="leapfrog_kdk")
    mesh8 = make_mesh(8)
    state = nb.init_scene("uniform_disc", cfg)
    ss = prime_accelerations_sharded(shard_state(state, mesh8), cfg, mesh8)
    ss = make_sharded_step(cfg, mesh8)(ss)
    path = save_checkpoint(str(tmp_path / "ck8"), ss, cfg)

    ref = make_sharded_step(cfg, mesh8)(ss)

    loaded, cfg2 = load_checkpoint(path)
    mesh2 = make_mesh(2)
    out = make_sharded_step(cfg2, mesh2)(shard_state(loaded, mesh2))

    assert int(out.frame) == int(ref.frame)
    scale = np.abs(np.asarray(ref.pos)).max()
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=2e-6 * scale)
    vscale = max(np.abs(np.asarray(ref.vel)).max(), 1e-12)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               atol=2e-5 * vscale)
