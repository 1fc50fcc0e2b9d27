"""3D octree FMM tests (physics/barneshut3d.py) — accuracy vs direct sum.

The reference tree is 2D-only (Quadtree.hpp); the octree is the framework's
own extension, so it must meet the framework's own bars: field error at the
2D tree's level, heavy-hitter exactness, overflow-residual repair, and
near-exact momentum balance.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nbodysim_tpu as nb
from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.physics.barneshut import bh_accelerations
from nbodysim_tpu.physics.barneshut3d import (
    _build_pyramid3,
    bh3_accelerations,
    bh3_near_overflow,
)
from nbodysim_tpu.physics.forces import direct_accelerations


def _system3(n, span=1000.0, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pos = jax.random.uniform(k1, (n, 3), jnp.float32, -span, span)
    mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)
    return pos, mass


def test_pyramid3_mass_conservation():
    pos, mass = _system3(1000)
    grids, corner, size, ci, flat = _build_pyramid3(pos, mass, 4)
    total = float(jnp.sum(mass))
    for l in range(5):
        np.testing.assert_allclose(
            float(jnp.sum(grids[l][0])), total, rtol=1e-5)
    # COM of root cell = global COM (grids are per-channel tuples).
    g0 = grids[0]
    m0 = float(g0[0][0, 0, 0])
    com = np.array([float(g0[1 + a][0, 0, 0]) / m0 for a in range(3)])
    expected = np.asarray(
        jnp.sum(mass[:, None] * pos, axis=0) / jnp.sum(mass))
    np.testing.assert_allclose(com, expected, rtol=1e-4)


@pytest.mark.parametrize("radius,tol_median", [(2, 0.015), (3, 0.003)])
def test_bh3_accuracy_uniform(radius, tol_median):
    """Measured on this scene: median 4.3e-3 (R=2), 8.4e-4 (R=3)."""
    pos, mass = _system3(4096)
    cfg = SimConfig(n=4096, dim=3, bh_levels=4, bh_accept_radius=radius,
                    force_backend="bh")
    a_bh = np.asarray(bh3_accelerations(pos, mass, cfg))
    a_dir = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    err = np.linalg.norm(a_bh - a_dir, axis=1) / (
        np.linalg.norm(a_dir, axis=1) + 1e-12)
    assert np.median(err) < tol_median, np.median(err)


def test_bh3_plummer_concentrated():
    """Concentrated 3D scene with far outliers: outlier extraction must
    keep the octree on the bulk (measured median 7.1e-4)."""
    cfg_s = SimConfig(n=4096, dim=3, force_backend="xla", softening=10.0)
    state = nb.init_scene("plummer", cfg_s, total_mass=1e4,
                          scale_radius=1000.0)
    a_dir = np.asarray(
        direct_accelerations(state.pos, state.mass, eps_sq=100.0))
    cfg = SimConfig(n=4096, dim=3, force_backend="bh", softening=10.0)
    a_bh = np.asarray(bh_accelerations(state.pos, state.mass, cfg))
    err = np.linalg.norm(a_bh - a_dir, axis=1) / (
        np.linalg.norm(a_dir, axis=1) + 1e-12)
    assert np.median(err) < 0.005, np.median(err)
    assert np.percentile(err, 90) < 0.05, np.percentile(err, 90)


def test_bh3_heavy_hitter_exact():
    """A dominant point mass is extracted and coupled exactly (measured
    median 5.6e-6)."""
    pos, mass = _system3(2048, seed=1)
    mass = mass.at[0].set(1e9)
    a_dir = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    cfg = SimConfig(n=2048, dim=3, force_backend="bh", bh_levels=4)
    a_bh = np.asarray(bh3_accelerations(pos, mass, cfg))
    err = np.linalg.norm(a_bh - a_dir, axis=1) / (
        np.linalg.norm(a_dir, axis=1) + 1e-12)
    assert np.median(err) < 1e-4, np.median(err)


def test_bh3_clustered_overflow_residual():
    """A dense clump (1900 bodies in one cell's worth of space) inside a
    wide field: the clump cell overflows the 16-slot bucket cap and the
    exact residual must repair the near field. (A merely compact scene
    does NOT overflow — the outlier extraction + adaptive bounding cube
    absorb it — so the clump must be small relative to the bulk span.)"""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    clump = jax.random.uniform(k1, (1900, 3), jnp.float32, -1.0, 1.0)
    field = jax.random.uniform(k2, (148, 3), jnp.float32, -1000.0, 1000.0)
    pos = jnp.concatenate([clump, field])
    mass = jnp.ones((2048,), jnp.float32)
    cfg = SimConfig(n=2048, dim=3, force_backend="bh", bh_levels=3)
    assert bh3_near_overflow(pos, mass, cfg) > 0  # residual really fires
    a_dir = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    a_bh = np.asarray(bh3_accelerations(pos, mass, cfg))
    err = np.linalg.norm(a_bh - a_dir, axis=1) / (
        np.linalg.norm(a_dir, axis=1) + 1e-12)
    assert np.median(err) < 0.005, np.median(err)


def test_bh3_mild_overflow_small_tier():
    """Overflow below _OVERFLOW_SMALL takes the cheap residual tier and
    still repairs the near field exactly."""
    from nbodysim_tpu.physics.barneshut import _OVERFLOW_SMALL

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    clump = jax.random.uniform(k1, (700, 3), jnp.float32, -1.0, 1.0)
    field = jax.random.uniform(k2, (324, 3), jnp.float32, -1000.0, 1000.0)
    pos = jnp.concatenate([clump, field])
    mass = jnp.ones((1024,), jnp.float32)
    cfg = SimConfig(n=1024, dim=3, force_backend="bh", bh_levels=3)
    over = bh3_near_overflow(pos, mass, cfg)
    assert 0 < over <= _OVERFLOW_SMALL, over
    a_dir = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    a_bh = np.asarray(bh3_accelerations(pos, mass, cfg))
    err = np.linalg.norm(a_bh - a_dir, axis=1) / (
        np.linalg.norm(a_dir, axis=1) + 1e-12)
    assert np.median(err) < 0.005, np.median(err)


def test_auto_backend_enables_deep_chain_on_clustered_scene(monkeypatch):
    """resolve_config_for_state: a 3D scene whose near-field overflow
    exceeds the residual capacity stays on the tree WITH the deep-overflow
    chain + tile refinement (r3 — round 2 fell back to the exact kernels
    because the 256^3 deep grid alone was too coarse; the tile refinement
    fixed the accuracy, measured clustered-blob p99 8.5 -> 0.098)."""
    import warnings

    from nbodysim_tpu.physics import barneshut as bh_mod
    from nbodysim_tpu.physics import forces as forces_mod
    from nbodysim_tpu.physics.forces import resolve_config_for_state

    monkeypatch.setattr(forces_mod, "BH3_AUTO_THRESHOLD", 256)
    monkeypatch.setattr(bh_mod, "_OVERFLOW_CAP", 64)

    # Dense clump in a wide field: the clump lands in one cell (the field
    # keeps the adaptive bounding cube wide) -> massive overflow.
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    clump = jax.random.uniform(k1, (448, 3), jnp.float32, -1.0, 1.0)
    field = jax.random.uniform(k2, (64, 3), jnp.float32, -1000.0, 1000.0)
    pos = jnp.concatenate([clump, field])
    mass = jnp.ones((512,), jnp.float32)
    cfg = SimConfig(n=512, dim=3, force_backend="auto", bh_levels=3)
    with warnings.catch_warnings():
        warnings.simplefilter("always")
        out = resolve_config_for_state(pos, mass, cfg)
        assert out.force_backend == "bh"
        assert out.bh_deep_levels == -1

    # An explicit user tile-off survives the auto escalation.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        out_nt = resolve_config_for_state(
            pos, mass, cfg.replace(bh_tile_levels=0))
    assert out_nt.bh_tile_levels == 0

    # A well-spread scene keeps the plain tree (no deep chain).
    pos_u = jax.random.uniform(jax.random.PRNGKey(1), (512, 3),
                               jnp.float32, -1000.0, 1000.0)
    out_u = resolve_config_for_state(pos_u, mass, cfg)
    assert out_u.force_backend == "bh"
    assert out_u.bh_deep_levels == 0


def test_bh3_pallas_nearfield_matches_xla():
    """The 3D Pallas sorted-slab near-field kernel (interpret mode on CPU)
    reproduces the XLA bucket stencil through the full octree eval."""
    pos, mass = _system3(4096, seed=11)
    cfg_x = SimConfig(n=4096, dim=3, force_backend="bh", bh_levels=4)
    cfg_p = SimConfig(n=4096, dim=3, force_backend="bh", bh_levels=4,
                      pallas_interpret=True)
    a_x = np.asarray(bh3_accelerations(pos, mass, cfg_x))
    a_p = np.asarray(bh3_accelerations(pos, mass, cfg_p))
    scale = np.abs(a_x).max()
    np.testing.assert_allclose(a_p, a_x, atol=scale * 1e-6)


def test_bh3_momentum_balance():
    pos, mass = _system3(2048, seed=2)
    cfg = SimConfig(n=2048, dim=3, force_backend="bh", bh_levels=4)
    acc = np.asarray(bh3_accelerations(pos, mass, cfg))
    net = np.abs((np.asarray(mass)[:, None] * acc).sum(0))
    gross = np.abs(np.asarray(mass)[:, None] * acc).sum()
    assert (net / gross < 5e-3).all()


def test_bh3_through_step_and_capacity():
    """dim=3 + force_backend='bh' flows through the fused step, and the
    Simulation capacity check runs the 3D occupancy diagnostic."""
    from nbodysim_tpu.physics.integrators import make_step

    cfg = SimConfig(n=512, dim=3, force_backend="bh", bh_levels=3,
                    enable_collisions=False)
    state = nb.init_scene("plummer", cfg)
    out = make_step(cfg)(state)
    assert np.all(np.isfinite(np.asarray(out.pos)))
    assert int(out.frame) == 1

    sim = nb.Simulation(cfg, scene="plummer")   # runs check_capacity (3D)
    sim.run(2)
    assert sim.frame == 2


def test_bh3_sharded_replicated(eight_devices):
    """Sharded step with the 3D tree (replicated build) matches the
    single-chip evaluation to roundoff."""
    from nbodysim_tpu.parallel import (
        make_mesh, make_sharded_step, prime_accelerations_sharded,
        shard_state)
    from nbodysim_tpu.physics.integrators import make_step, prime_accelerations

    cfg = SimConfig(n=512, dim=3, force_backend="bh", bh_levels=3,
                    integrator="leapfrog_kdk", enable_collisions=False)
    state = nb.init_scene("plummer", cfg)

    ref = make_step(cfg)(prime_accelerations(state, cfg))

    mesh = make_mesh(8)
    sharded = shard_state(state, mesh)
    sharded = prime_accelerations_sharded(sharded, cfg, mesh)
    out = make_sharded_step(cfg, mesh)(sharded)
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(ref.pos), rtol=2e-5, atol=1e-4)


def test_nf_sparse_matches_dense():
    """r5 sparse near-field: identical physics to the dense bucket pass
    for bucket-tier targets (same cell window, same softening; summation
    order differs by roundoff), deep rows untouched."""
    from nbodysim_tpu.physics import barneshut3d as b3

    n = 4096
    k = jax.random.split(jax.random.PRNGKey(5), 4)
    blob = 30.0 * jax.random.normal(k[0], (n // 2, 3)) + jnp.array(
        [500.0, -300.0, 200.0])
    bg = jax.random.uniform(k[2], (n // 2, 3), jnp.float32,
                            -2000.0, 2000.0)
    pos = jnp.concatenate([blob, bg]).astype(jnp.float32)
    mass = jax.random.uniform(k[3], (n,), jnp.float32, 0.1, 10.0)
    kw = dict(levels=4, eps_sq=1.0, g_const=1.0, near_cap=16, radius=2,
              deep_levels=6, tile_levels=2, tile_size=4, tile_count=8)
    a_dense = np.asarray(b3._bh3_accelerations(pos, mass,
                                               nf_sparse=False, **kw))
    a_sparse = np.asarray(b3._bh3_accelerations(pos, mass,
                                                nf_sparse=True, **kw))
    assert np.isfinite(a_sparse).all()
    assert np.allclose(a_dense, a_sparse, rtol=1e-4, atol=1e-6), (
        np.abs(a_dense - a_sparse).max())


def test_nf_sparse_source_compaction(monkeypatch):
    """r5: the sparse near field streams only non-hot-cell sources (a
    ~b_par target's window cannot contain a hot cell); compacted and
    full-source passes must match to roundoff, and a tiny source cap
    must fall back to the full pass bitwise."""
    from nbodysim_tpu.physics import barneshut3d as b3

    n = 4096
    k = jax.random.split(jax.random.PRNGKey(5), 4)
    blob = 30.0 * jax.random.normal(k[0], (n // 2, 3)) + jnp.array(
        [500.0, -300.0, 200.0])
    bg = jax.random.uniform(k[2], (n // 2, 3), jnp.float32,
                            -2000.0, 2000.0)
    pos = jnp.concatenate([blob, bg]).astype(jnp.float32)
    mass = jax.random.uniform(k[3], (n,), jnp.float32, 0.1, 10.0)
    kw = dict(levels=4, eps_sq=1.0, g_const=1.0, near_cap=16, radius=2,
              deep_levels=6, tile_levels=2, tile_size=4, tile_count=8,
              nf_sparse=True)
    a_full = np.asarray(b3._bh3_accelerations(pos, mass, **kw))

    monkeypatch.setattr(b3, "_nf_sparse_src_cap",
                        lambda n: (9 * n) // 10)
    jax.clear_caches()
    a_cs = np.asarray(b3._bh3_accelerations(pos, mass, **kw))
    assert np.allclose(a_full, a_cs, rtol=1e-5, atol=1e-7)

    monkeypatch.setattr(b3, "_nf_sparse_src_cap", lambda n: 16)
    jax.clear_caches()
    a_fb = np.asarray(b3._bh3_accelerations(pos, mass, **kw))
    assert np.array_equal(a_full, a_fb)
    jax.clear_caches()


def test_nf_sparse_promotion_beyond_cap(monkeypatch):
    """Bucket-tier targets beyond the sparse capacity PROMOTE to the
    deep path: bounded smoothed physics, never dropped forces."""
    from nbodysim_tpu.physics import barneshut3d as b3
    from nbodysim_tpu.physics.forces import direct_accelerations

    n = 2048
    k = jax.random.split(jax.random.PRNGKey(6), 4)
    blob = 30.0 * jax.random.normal(k[0], (n // 2, 3))
    bg = jax.random.uniform(k[2], (n // 2, 3), jnp.float32,
                            -2000.0, 2000.0)
    pos = jnp.concatenate([blob, bg]).astype(jnp.float32)
    mass = jax.random.uniform(k[3], (n,), jnp.float32, 0.1, 10.0)
    monkeypatch.setattr(b3, "_nf_sparse_cap", lambda n: 64)
    jax.clear_caches()
    a = np.asarray(b3._bh3_accelerations(
        pos, mass, levels=4, eps_sq=1.0, g_const=1.0, near_cap=16,
        radius=2, deep_levels=6, nf_sparse=True))
    a_d = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0,
                                          g_const=1.0))
    assert np.isfinite(a).all()
    # promoted rows carry PM-smoothed forces — bounded, not dropped
    assert np.linalg.norm(a, axis=1).max() < 10.0 * np.linalg.norm(
        a_d, axis=1).max()
    rel = (np.linalg.norm(a - a_d, axis=1)
           / (np.linalg.norm(a_d, axis=1) + 1e-12))
    assert np.median(rel) < 0.15, np.median(rel)
    jax.clear_caches()


def test_nf_sparse_auto_resolution():
    """resolve_config_for_state pins bh_nf_sparse from the distribution:
    ON for a deep-chain clustered 3D scene with few bucket-tier targets,
    OFF when the deep chain stays off (uniform scene)."""
    from nbodysim_tpu.physics.forces import _resolve_nf_sparse
    from nbodysim_tpu.config import SimConfig

    n = 4096
    k = jax.random.split(jax.random.PRNGKey(8), 3)
    # nearly everything in one tight blob -> deep on, few bucket-tier
    # (the config pins the tree + deep chain the way the auto probe
    # does at flagship N; the backend-size threshold is tested in
    # test_forces)
    blob = 10.0 * jax.random.normal(k[0], (n, 3)).astype(jnp.float32)
    mass = jax.random.uniform(k[1], (n,), jnp.float32, 0.1, 10.0)
    cfg = SimConfig(n=n, dim=3, force_backend="bh", bh_deep_levels=-1)
    r = _resolve_nf_sparse(blob, mass, cfg)
    assert r.bh_nf_sparse == 1, r.bh_nf_sparse

    # uniform: the deep chain resolves but nearly every target is
    # bucket-tier -> sparse stays off... n=4096 fits the 8192-target
    # half-capacity, so spread the scene to exceed it instead.
    big = jax.random.uniform(k[2], (32768, 3), jnp.float32,
                             -2000.0, 2000.0)
    bigm = jnp.ones((32768,), jnp.float32)
    r2 = _resolve_nf_sparse(
        big, bigm, SimConfig(n=32768, dim=3, force_backend="bh",
                             bh_deep_levels=-1))
    assert r2.bh_nf_sparse == 0, r2.bh_nf_sparse

    # deep chain off -> sparse pinned off regardless of distribution
    r3 = _resolve_nf_sparse(blob, mass,
                            SimConfig(n=n, dim=3, force_backend="bh"))
    assert r3.bh_nf_sparse == 0
