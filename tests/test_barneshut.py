"""Multilevel-grid Barnes-Hut backend tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nbodysim_tpu as nb
from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.physics.barneshut import bh_accelerations, _build_pyramid
from nbodysim_tpu.physics.forces import direct_accelerations


def _system(n, span=1000.0, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pos = jax.random.uniform(k1, (n, 2), jnp.float32, -span, span)
    mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)
    return pos, mass


def test_pyramid_mass_conservation():
    pos, mass = _system(1000)
    grids, corner, size, ci, flat = _build_pyramid(pos, mass, 5)
    total = float(jnp.sum(mass))
    for l in range(6):
        np.testing.assert_allclose(
            float(jnp.sum(grids[l][0])), total, rtol=1e-5)
    # COM of root cell = global COM
    m, wx, wy = grids[0][:3]
    com = np.array([float(wx[0, 0] / m[0, 0]), float(wy[0, 0] / m[0, 0])])
    expected = np.asarray(
        jnp.sum(mass[:, None] * pos, axis=0) / jnp.sum(mass))
    np.testing.assert_allclose(com, expected, rtol=1e-4)


@pytest.mark.parametrize("radius,tol_median", [(2, 0.03), (3, 0.01)])
def test_bh_accuracy_uniform(radius, tol_median):
    pos, mass = _system(4096)
    cfg = SimConfig(n=4096, bh_levels=6, bh_accept_radius=radius,
                    force_backend="bh")
    a_bh = np.asarray(bh_accelerations(pos, mass, cfg))
    a_dir = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    err = np.linalg.norm(a_bh - a_dir, axis=1) / (
        np.linalg.norm(a_dir, axis=1) + 1e-12)
    assert np.median(err) < tol_median, np.median(err)


def test_bh_accuracy_clustered_disc():
    """Clustered scene (central body dominates): BH must stay accurate."""
    cfg_scene = SimConfig(n=2048, force_backend="xla")
    state = nb.init_scene("uniform_disc", cfg_scene)
    cfg = SimConfig(n=2048, force_backend="bh")
    a_bh = np.asarray(bh_accelerations(state.pos, state.mass, cfg))
    a_dir = np.asarray(
        direct_accelerations(state.pos, state.mass, eps_sq=1.0))
    err = np.linalg.norm(a_bh - a_dir, axis=1) / (
        np.linalg.norm(a_dir, axis=1) + 1e-12)
    assert np.median(err) < 1e-3


def test_bh_newton_third_law_approx():
    """Momentum conservation holds approximately (cell asymmetries break
    exact antisymmetry, but the residual must be small)."""
    pos, mass = _system(2048)
    cfg = SimConfig(n=2048, force_backend="bh")
    acc = np.asarray(bh_accelerations(pos, mass, cfg))
    net = np.abs((np.asarray(mass)[:, None] * acc).sum(0))
    gross = np.abs(np.asarray(mass)[:, None] * acc).sum()
    assert (net / gross < 5e-3).all()


def test_bh_backend_dispatch():
    """force_backend='bh' must flow through compute_accelerations and
    the integrator."""
    from nbodysim_tpu.physics.integrators import make_step

    cfg = SimConfig(n=256, force_backend="bh", enable_collisions=False)
    state = nb.init_scene("uniform_disc", cfg)
    out = make_step(cfg)(state)
    assert np.all(np.isfinite(np.asarray(out.pos)))
    assert int(out.frame) == 1


def test_bh_3d_dispatches_to_octree():
    """dim=3 flows to the octree FMM (barneshut3d.py) instead of raising
    (round-1 behavior); accuracy is covered in test_barneshut3d.py."""
    cfg = SimConfig(n=128, dim=3, force_backend="bh", bh_levels=3)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pos = jax.random.uniform(k1, (128, 3), jnp.float32, -100.0, 100.0)
    mass = jax.random.uniform(k2, (128,), jnp.float32, 0.1, 10.0)
    acc = bh_accelerations(pos, mass, cfg)
    assert acc.shape == (128, 3)
    assert bool(jnp.all(jnp.isfinite(acc)))


def test_bh_plummer_concentrated_accuracy():
    """Regression (code-review finding): centrally concentrated scenes
    (Plummer's sampled radii reach ~1000 scale lengths) must not silently
    lose near-field forces to bucket overflow — the outlier extraction
    keeps the grid on the bulk."""
    cfg_s = SimConfig(n=4096, force_backend="xla", softening=10.0)
    state = nb.init_scene("plummer", cfg_s, total_mass=1e4,
                          scale_radius=1000.0)
    a_dir = np.asarray(
        direct_accelerations(state.pos, state.mass, eps_sq=100.0))
    cfg = SimConfig(n=4096, force_backend="bh", softening=10.0)
    a_bh = np.asarray(bh_accelerations(state.pos, state.mass, cfg))
    err = np.linalg.norm(a_bh - a_dir, axis=1) / (
        np.linalg.norm(a_dir, axis=1) + 1e-12)
    assert np.median(err) < 0.05, np.median(err)
    assert np.percentile(err, 90) < 0.15, np.percentile(err, 90)


def test_nearfield_pallas_matches_xla_stencil():
    """kernels/nearfield.py (interpret mode) vs the XLA bucket stencil on
    a random bucket grid with partially filled slots."""
    from nbodysim_tpu.kernels.nearfield import bucket_stencil_pallas
    from nbodysim_tpu.physics.barneshut import _bucket_stencil

    key = jax.random.PRNGKey(2)
    kx, ky, km, ko = jax.random.split(key, 4)
    rows, res, cap, rr = 12, 32, 8, 2
    rows_w = rows + 2 * rr
    bx = jax.random.uniform(kx, (rows_w, res, cap), jnp.float32, -5.0, 5.0)
    by = jax.random.uniform(ky, (rows_w, res, cap), jnp.float32, -5.0, 5.0)
    bm = jax.random.uniform(km, (rows_w, res, cap), jnp.float32, 0.0, 2.0)
    occupied = jax.random.bernoulli(ko, 0.4, (rows_w, res, cap))
    bm = jnp.where(occupied, bm, 0.0)

    ax_ref, ay_ref = _bucket_stencil(bx, by, bm, rr, 1.0, rows)
    ax_p, ay_p = bucket_stencil_pallas(
        bx, by, bm, rr=rr, eps_sq=1.0, center_rows=rows, interpret=True)
    scale = float(jnp.abs(ax_ref).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(ax_p), np.asarray(ax_ref),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(ay_p), np.asarray(ay_ref),
                               atol=1e-5 * scale)


def test_bh_with_pallas_nearfield_matches():
    """Full tree-code eval with the Pallas near field (interpret) vs the
    XLA near field on the clustered disc scene."""
    cfg_scene = SimConfig(n=2048, force_backend="xla")
    state = nb.init_scene("uniform_disc", cfg_scene)
    cfg_x = SimConfig(n=2048, force_backend="bh")
    cfg_p = SimConfig(n=2048, force_backend="bh", pallas_interpret=True)
    a_x = np.asarray(bh_accelerations(state.pos, state.mass, cfg_x))
    a_p = np.asarray(bh_accelerations(state.pos, state.mass, cfg_p))
    scale = np.abs(a_x).max()
    np.testing.assert_allclose(a_p, a_x, atol=1e-5 * scale)
