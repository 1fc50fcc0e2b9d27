"""Pallas all-pairs kernel vs the XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbodysim_tpu.kernels.allpairs import allpairs_accelerations
from nbodysim_tpu.physics.forces import direct_accelerations


def _system(n, dim=2, span=1000.0, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pos = jax.random.uniform(k1, (n, dim), jnp.float32, -span, span)
    mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)
    return pos, mass


@pytest.mark.parametrize("n", [4, 100])
def test_kernel_matches_oracle(n):
    pos, mass = _system(n)
    ref = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    pal = np.asarray(
        allpairs_accelerations(pos, mass, eps_sq=1.0, interpret=True)
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(pal, ref, atol=scale * 1e-5)


def test_kernel_multi_tile():
    """Exercise target + source tiling (grid > 1x1) with small blocks."""
    pos, mass = _system(300)
    ref = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    pal = np.asarray(
        allpairs_accelerations(
            pos, mass, eps_sq=1.0,
            block_targets=64, block_sources=128, interpret=True,
        )
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(pal, ref, atol=scale * 1e-5)


def test_kernel_3d():
    pos, mass = _system(64, dim=3)
    ref = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    pal = np.asarray(
        allpairs_accelerations(pos, mass, eps_sq=1.0, interpret=True)
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(pal, ref, atol=scale * 1e-5)


def test_kernel_far_from_origin():
    """Near-field accuracy must survive large absolute coordinates (the
    norm-expansion formulation would fail this; the broadcast-subtract
    formulation must not)."""
    base = jnp.array([50000.0, -70000.0])
    pos = jnp.stack([base, base + jnp.array([3.0, 4.0])])  # 5 apart
    mass = jnp.array([2.0, 8.0])
    ref = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    pal = np.asarray(
        allpairs_accelerations(pos, mass, eps_sq=1.0, interpret=True)
    )
    np.testing.assert_allclose(pal, ref, rtol=1e-5)


def test_kernel_zero_mass_sources_ignored():
    pos = jnp.array([[0.0, 0.0], [10.0, 0.0], [0.0, 5.0]])
    mass = jnp.array([1.0, 0.0, 2.0])
    pal = np.asarray(
        allpairs_accelerations(pos, mass, eps_sq=1.0, interpret=True)
    )
    ref = np.asarray(direct_accelerations(pos, mass, eps_sq=1.0))
    np.testing.assert_allclose(pal, ref, atol=1e-7)


@pytest.mark.parametrize("dim", [2, 3])
def test_wide_kernel_matches_oracle(dim):
    """Transposed-IO rectangular kernel (many targets x few sources) vs
    the XLA oracle — the bulk<-outlier coupling shape (r5 OOM fix)."""
    from nbodysim_tpu.kernels.allpairs import allpairs_accelerations_wide

    tgt, _ = _system(500, dim=dim, seed=3)
    src, src_m = _system(40, dim=dim, seed=4)
    ref = np.asarray(direct_accelerations(
        tgt, None, 1.0, 2.5, src_pos=src, src_mass=src_m))
    pal = np.asarray(allpairs_accelerations_wide(
        tgt, src, src_m, eps_sq=1.0, g_const=2.5, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(pal, ref, atol=scale * 1e-5)


def test_wide_kernel_multi_tile_and_self_pair():
    """Blocked path (several target/source tiles) + a source coinciding
    with a target under eps=0 must contribute zero, not NaN."""
    from nbodysim_tpu.kernels.allpairs import allpairs_accelerations_wide

    tgt, _ = _system(300, seed=5)
    src, src_m = _system(20, seed=6)
    src = src.at[0].set(tgt[7])          # exact overlap
    ref = np.asarray(direct_accelerations(
        tgt, None, 0.0, 1.0, src_pos=src, src_mass=src_m))
    pal = np.asarray(allpairs_accelerations_wide(
        tgt, src, src_m, eps_sq=0.0, block_targets=128,
        block_sources=8, interpret=True))
    assert np.all(np.isfinite(pal))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(pal, ref, atol=scale * 1e-5)
