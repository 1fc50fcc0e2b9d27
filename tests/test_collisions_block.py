"""Lex-sorted block broad phase (physics/collisions._block_pass).

The flagship-scale collision path (r4): the hash pass's per-candidate
gather scan measured 38.6 s/pass at N=4M on a v5e; the block pass keeps
the same physics (reference narrow phase Simulation.hpp:216-346, big-body
extraction, capped symmetric residual) on dense masked [T, W] VPU blocks
over contiguous lex-sorted neighbor windows. These tests gate it against
the dense oracle and its conservation invariants at test scale.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState
from nbodysim_tpu.physics import collisions as C
from nbodysim_tpu.physics.collisions import (
    _block_pass,
    _dense_pass,
    collision_block_overflow,
    resolve_collisions,
)


def _random_state(n, dim, seed, span=50.0, big=True):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    pos = jax.random.uniform(k[0], (n, dim), jnp.float32, -span, span)
    vel = jax.random.uniform(k[1], (n, dim), jnp.float32, -5.0, 5.0)
    mass = jax.random.uniform(k[2], (n,), jnp.float32, 0.5, 2.0)
    radius = jax.random.uniform(k[3], (n,), jnp.float32, 0.5, 1.5)
    if big:
        radius = radius.at[0].set(span / 2)   # reaches across many cells
        mass = mass.at[0].set(100.0)
    return ParticleState.create(pos, vel, mass, radius)


def _cfg(n, dim=2, **kw):
    kw.setdefault("collision_cell_size", 0.0)
    return SimConfig(n=n, dim=dim, collision_broad_phase="block", **kw)


@pytest.mark.parametrize("dim", [2, 3])
def test_block_pass_matches_dense(dim):
    n = 4096
    st = _random_state(n, dim, seed=7)
    cfg = _cfg(n, dim)
    out_b = _block_pass(st, cfg)
    out_d = _dense_pass(st, cfg)
    scale = float(jnp.abs(out_d.vel).max())
    np.testing.assert_allclose(np.asarray(out_b.pos), np.asarray(out_d.pos),
                               atol=1e-5 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(out_b.vel), np.asarray(out_d.vel),
                               atol=1e-5 * max(scale, 1.0))


def test_block_pass_clustered_blob_matches_dense():
    """Merger-nuclei geometry: a dense blob far from sparse outliers. The
    radius-scaled cells keep occupancy bounded; every pair the dense
    oracle resolves must come out identical."""
    k = jax.random.split(jax.random.PRNGKey(11), 4)
    n = 2048
    pos = 40.0 * jax.random.normal(k[0], (n, 2)).astype(jnp.float32)
    pos = pos.at[:64].multiply(0.02)          # ultra-dense core
    pos = pos.at[0].set(jnp.array([5e5, 0.0]))  # far outlier stretches span
    vel = jax.random.uniform(k[1], (n, 2), jnp.float32, -20.0, 20.0)
    mass = jax.random.uniform(k[2], (n,), jnp.float32, 0.5, 2.0)
    radius = jax.random.uniform(k[3], (n,), jnp.float32, 1.0, 2.0)
    st = ParticleState.create(pos, vel, mass, radius)
    cfg = _cfg(n)
    out_b = _block_pass(st, cfg)
    out_d = _dense_pass(st, cfg)
    np.testing.assert_allclose(np.asarray(out_b.pos), np.asarray(out_d.pos),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_b.vel), np.asarray(out_d.vel),
                               atol=1e-3)
    # Real work happened.
    assert float(jnp.abs(out_b.vel - st.vel).max()) > 0.1


def test_block_pass_momentum_conserved():
    n = 4096
    st = _random_state(n, 2, seed=3)
    cfg = _cfg(n)
    out = _block_pass(st, cfg)
    p0 = np.asarray(jnp.sum(st.vel * st.mass[:, None], axis=0))
    p1 = np.asarray(jnp.sum(out.vel * out.mass[:, None], axis=0))
    scale = float(jnp.sum(jnp.abs(st.vel) * st.mass[:, None]))
    np.testing.assert_allclose(p1, p0, atol=1e-5 * scale)


def test_block_overflow_residual_conserves_momentum(monkeypatch):
    """Force block-coverage overflow (tiny residual cap, everything in one
    cell so every block's true span is the whole array): beyond-cap pairs
    must drop SYMMETRICALLY — momentum exactly conserved, no NaNs."""
    monkeypatch.setattr(C, "_OVERFLOW_CAP", 32)
    k = jax.random.split(jax.random.PRNGKey(9), 3)
    n = 2048
    # All overlapping inside one radius-scaled cell region.
    pos = 2.0 * jax.random.normal(k[0], (n, 2)).astype(jnp.float32)
    vel = jax.random.uniform(k[1], (n, 2), jnp.float32, -5.0, 5.0)
    mass = jax.random.uniform(k[2], (n,), jnp.float32, 0.5, 2.0)
    radius = jnp.full((n,), 1.0)
    st = ParticleState.create(pos, vel, mass, radius)
    cfg = _cfg(n, collision_block_size=256)
    over = collision_block_overflow(st, cfg)
    assert over > 32            # the residual cap really is exceeded
    out = _block_pass(st, cfg)
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    p0 = np.asarray(jnp.sum(st.vel * st.mass[:, None], axis=0))
    p1 = np.asarray(jnp.sum(out.vel * out.mass[:, None], axis=0))
    scale = float(jnp.sum(jnp.abs(st.vel) * st.mass[:, None]))
    np.testing.assert_allclose(p1, p0, atol=1e-5 * scale)


def test_block_overflow_diagnostic():
    n = 2048
    spread = _random_state(n, 2, seed=5, span=500.0, big=False)
    cfg = _cfg(n, collision_block_size=256)   # window = 1024 rows
    assert collision_block_overflow(spread, cfg) == 0
    # Everything at one point: every block's true span is the whole array
    # (2048 rows), past the 1024-row window -> every small uncovered (up
    # to 64 of the largest radii leave the grid as extracted bigs).
    point = spread.replace(pos=jnp.zeros_like(spread.pos))
    assert collision_block_overflow(point, cfg) >= n - 64


def test_resolve_collisions_block_dispatch():
    st = ParticleState.create(
        jnp.array([[0.0, 0.0], [1.5, 0.0]]),
        jnp.array([[1.0, 0.0], [-1.0, 0.0]]),
        jnp.array([1.0, 1.0]), jnp.array([1.0, 1.0]))
    cfg = SimConfig(n=2, collision_broad_phase="block",
                    collision_cell_size=0.0)
    out = resolve_collisions(st, cfg)
    # Head-on equal-mass, impulse 1.5: relative velocity scales by -0.5.
    np.testing.assert_allclose(np.asarray(out.vel[0]), [-0.5, 0.0],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel[1]), [0.5, 0.0],
                               atol=1e-5)


def test_block_size_validation():
    with pytest.raises(ValueError):
        SimConfig(n=8, collision_block_size=100)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("max_cheb", [1, None])
def test_rect_pair_kernel_matches_blocked_xla(dim, max_cheb):
    """kernels/collide.rect_pair_deltas (interpret) vs the blocked-XLA
    _cheb_pair_deltas_blocked it replaces on large residual rectangles."""
    from nbodysim_tpu.kernels.collide import rect_pair_deltas
    from nbodysim_tpu.physics.collisions import _cheb_pair_deltas_blocked

    k = jax.random.split(jax.random.PRNGKey(17), 5)
    n, m = 1024, 512
    pos = jax.random.uniform(k[0], (n, dim), jnp.float32, -30.0, 30.0)
    vel = jax.random.uniform(k[1], (n, dim), jnp.float32, -5.0, 5.0)
    mass = jax.random.uniform(k[2], (n,), jnp.float32, 0.5, 2.0)
    radius = jax.random.uniform(k[3], (n,), jnp.float32, 0.8, 1.6)
    cell = jnp.floor(pos / 3.0).astype(jnp.int32)
    # Some zero-mass (inert) rows on both sides, like the real residual.
    mass = mass.at[::7].set(0.0)
    tgt = (pos, vel, mass, radius, cell)
    sel = jax.random.permutation(k[4], n)[:m]
    src = tuple(a[sel] for a in tgt)

    dp_x, dv_x = _cheb_pair_deltas_blocked(
        tgt, src, dim, 1.5, max_cheb=max_cheb)
    dp_p, dv_p = rect_pair_deltas(
        tgt, src, dim=dim, impulse=1.5, max_cheb=max_cheb, interpret=True)
    np.testing.assert_allclose(np.asarray(dp_p), np.asarray(dp_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_x),
                               atol=1e-5, rtol=1e-5)
    assert float(jnp.abs(dv_x).max()) > 1e-3   # non-trivial comparison


@pytest.mark.parametrize("dim", [2, 3])
def test_block_pallas_kernel_matches_xla(dim):
    """kernels/collide_block.py (interpret mode) against the XLA dense
    stage: identical masks and narrow phase, so results agree to f32
    summation order."""
    n = 2048
    st = _random_state(n, dim, seed=13)
    cfg = _cfg(n, dim)
    out_x = _block_pass(st, cfg)                      # CPU -> XLA stage
    out_p = _block_pass(st, cfg.replace(pallas_interpret=True))
    scale = max(float(jnp.abs(out_x.vel).max()), 1.0)
    np.testing.assert_allclose(np.asarray(out_p.pos), np.asarray(out_x.pos),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(out_p.vel), np.asarray(out_x.vel),
                               atol=1e-5 * scale)
    # And real overlaps were resolved (not a trivially-empty comparison).
    assert float(jnp.abs(out_x.vel - st.vel).max()) > 1e-3
