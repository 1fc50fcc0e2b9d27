"""Collision pipeline tests against the reference resolve() math
(Simulation.hpp:293-346)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState
from nbodysim_tpu.physics.collisions import (
    _dense_pass,
    _grid_pass,
    resolve_collisions,
)


def _cfg(**kw):
    return SimConfig(**{"force_backend": "xla", **kw})


def _state(pos, vel, mass, radius):
    return ParticleState.create(
        jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
        jnp.asarray(mass, jnp.float32), jnp.asarray(radius, jnp.float32))


def _reference_resolve(p1, p2, v1, v2, m1, m2, r1, r2, impulse=1.5):
    """Literal numpy transcription of resolve() (Simulation.hpp:293-346)."""
    p1, p2, v1, v2 = map(lambda a: np.array(a, np.float64), (p1, p2, v1, v2))
    d = p2 - p1
    r = r1 + r2
    if (d @ d) > r * r:
        return p1, p2, v1, v2
    v = v2 - v1
    d_dot_v = d @ v
    w1 = m2 / (m1 + m2)
    w2 = m1 / (m1 + m2)
    if d_dot_v >= 0.0 and not np.allclose(d, 0):
        tmp = d * (r / np.sqrt(d @ d) - 1.0)
        return p1 - tmp * w1, p2 + tmp * w2, v1, v2
    v_sq = v @ v
    disc = max(d_dot_v ** 2 - v_sq * ((d @ d) - r * r), 0.0)
    t = (d_dot_v + np.sqrt(disc)) / v_sq
    p1r = p1 - v1 * t
    p2r = p2 - v2 * t
    dn = p2r - p1r
    tmp = dn * (impulse * (dn @ v) / (dn @ dn))
    v1n = v1 + tmp * w1
    v2n = v2 - tmp * w2
    return p1r + v1n * t, p2r + v2n * t, v1n, v2n


@pytest.mark.parametrize("case", [
    # (p1, p2, v1, v2, m1, m2, r1, r2)
    ([0., 0.], [1.5, 0.], [1., 0.], [-1., 0.], 1., 1., 1., 1.),      # head-on
    ([0., 0.], [1.0, 0.5], [2., 0.3], [-1., -0.2], 2., 5., 1., 0.8), # oblique
    ([0., 0.], [1.2, 0.], [-1., 0.], [1., 0.], 1., 3., 1., 0.5),     # separating overlap
    ([0., 0.], [0.5, 0.5], [0., 0.], [0., 0.], 1., 1., 1., 1.),      # static overlap
])
def test_pair_matches_reference_resolve(case):
    """A single overlapping pair must reproduce resolve() exactly (the
    Jacobi pass on one pair IS the sequential algorithm)."""
    p1, p2, v1, v2, m1, m2, r1, r2 = case
    state = _state([p1, p2], [v1, v2], [m1, m2], [r1, r2])
    out = _dense_pass(state, _cfg())

    e_p1, e_p2, e_v1, e_v2 = _reference_resolve(p1, p2, v1, v2, m1, m2, r1, r2)
    np.testing.assert_allclose(np.asarray(out.pos[0]), e_p1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.pos[1]), e_p2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel[0]), e_v1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel[1]), e_v2, atol=1e-5)


def test_non_overlapping_untouched():
    state = _state([[0., 0.], [10., 0.]], [[1., 0.], [-1., 0.]],
                   [1., 1.], [1., 1.])
    out = _dense_pass(state, _cfg())
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(out.vel), np.asarray(state.vel))


def test_momentum_conserved_many_body():
    import jax

    k = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(k, 3)
    n = 200
    pos = jax.random.uniform(k1, (n, 2), jnp.float32, -10.0, 10.0)  # dense
    vel = jax.random.uniform(k2, (n, 2), jnp.float32, -5.0, 5.0)
    mass = jax.random.uniform(k3, (n,), jnp.float32, 0.5, 2.0)
    state = ParticleState.create(pos, vel, mass, jnp.full((n,), 0.7))

    out = _dense_pass(state, _cfg())
    p0 = np.asarray(jnp.sum(state.mass[:, None] * state.vel, axis=0))
    p1 = np.asarray(jnp.sum(out.mass[:, None] * out.vel, axis=0))
    np.testing.assert_allclose(p1, p0, atol=np.abs(p0).max() * 1e-3 + 1e-2)


def test_grid_pass_matches_dense():
    """The sorted-spatial-hash broad phase must find the same pairs as the
    dense test when no bucket overflows."""
    import jax

    k = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(k, 3)
    n = 300
    # Spread over several collision cells (cell size 600).
    pos = jax.random.uniform(k1, (n, 2), jnp.float32, -2000.0, 2000.0)
    vel = jax.random.uniform(k2, (n, 2), jnp.float32, -50.0, 50.0)
    mass = jax.random.uniform(k3, (n,), jnp.float32, 0.5, 2.0)
    radius = jnp.full((n,), 20.0)
    state = ParticleState.create(pos, vel, mass, radius)

    cfg = _cfg(collision_max_neighbors=32)
    dense = _dense_pass(state, cfg)
    grid = _grid_pass(state, cfg)
    np.testing.assert_allclose(
        np.asarray(grid.pos), np.asarray(dense.pos), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grid.vel), np.asarray(dense.vel), atol=1e-4)


def test_hash_radius_scaled_cells_merger_occupancy():
    """Clustered-scene collision story (VERDICT r2 #4): at merger-class
    occupancy (thousands of particles inside one 600-unit cell), the
    sorted hash with radius-scaled cells (collision_cell_size=0) must
    conserve momentum exactly (symmetric Jacobi), match the dense oracle,
    and actually resolve the overlapping pairs."""
    import jax

    k = jax.random.split(jax.random.PRNGKey(11), 4)
    n = 2048
    # A 200-unit-radius blob: all inside ONE 600-unit reference cell, with
    # particle radii ~2 so real overlaps exist but occupancy per
    # radius-scaled cell (~4 units) stays small.
    pos = 200.0 * jax.random.normal(k[0], (n, 2)).astype(jnp.float32)
    vel = jax.random.uniform(k[1], (n, 2), jnp.float32, -20.0, 20.0)
    mass = jax.random.uniform(k[2], (n,), jnp.float32, 0.5, 2.0)
    radius = jax.random.uniform(k[3], (n,), jnp.float32, 1.0, 2.0)
    state = ParticleState.create(pos, vel, mass, radius)

    cfg = _cfg(collision_cell_size=0.0)
    out = _grid_pass(state, cfg)
    p0 = np.asarray(jnp.sum(state.vel * state.mass[:, None], axis=0))
    p1 = np.asarray(jnp.sum(out.vel * out.mass[:, None], axis=0))
    np.testing.assert_allclose(p1, p0, atol=2e-2 * np.abs(p0).max())

    dense = _dense_pass(state, cfg)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(dense.pos),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(dense.vel),
                               atol=1e-3)
    # Some pairs really overlapped and were resolved.
    assert np.abs(np.asarray(out.vel) - np.asarray(state.vel)).max() > 0.1


def test_auto_switches_to_hash_on_bucket_overflow():
    """The occupancy probe flips clustered 2D large-N scenes to the hash
    broad phase with radius-scaled cells (and warns)."""
    import warnings

    import jax

    from nbodysim_tpu.physics import collisions as cmod

    k = jax.random.split(jax.random.PRNGKey(3), 2)
    n = 4096
    # A tight blob plus far outliers: the span-scaled bucket cell becomes
    # ~3900 units, so the whole blob lands in one cell (merger-nuclei
    # geometry) and overflows the slot cap.
    pos = 50.0 * jax.random.normal(k[0], (n, 2)).astype(jnp.float32)
    pos = pos.at[0].set(jnp.array([1e6, 0.0]))
    pos = pos.at[1].set(jnp.array([-1e6, 0.0]))
    state = ParticleState.create(
        pos, jnp.zeros((n, 2)), jnp.ones((n,)), jnp.full((n,), 1.0))
    cfg = _cfg()
    # Shrink the thresholds so the probe path runs at test scale.
    orig_thr, orig_cap = cmod.DENSE_THRESHOLD, cmod._OVERFLOW_CAP
    cmod.DENSE_THRESHOLD, cmod._OVERFLOW_CAP = 1024, 64
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = cmod.resolve_collision_phase_for_state(state, cfg)
        assert out.collision_broad_phase == "block"
        assert out.collision_cell_size == 0.0
        assert any("block" in str(x.message) for x in w)
        # Explicit choices are honored untouched.
        cfg_b = cfg.replace(collision_broad_phase="bucket")
        assert cmod.resolve_collision_phase_for_state(
            state, cfg_b) is cfg_b
    finally:
        cmod.DENSE_THRESHOLD, cmod._OVERFLOW_CAP = orig_thr, orig_cap


def test_resolve_collisions_dispatch():
    state = _state([[0., 0.], [1.5, 0.]], [[1., 0.], [-1., 0.]],
                   [1., 1.], [1., 1.])
    out = resolve_collisions(state, _cfg())
    # Head-on equal-mass with impulse 1.5: relative velocity scales by -0.5.
    np.testing.assert_allclose(np.asarray(out.vel[0]), [-0.5, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.vel[1]), [0.5, 0.0], atol=1e-5)

    out2 = resolve_collisions(state, _cfg(enable_collisions=False))
    np.testing.assert_array_equal(np.asarray(out2.vel), np.asarray(state.vel))


def test_bucket_pass_big_plus_overflow_momentum():
    """Regression (code-review finding): a big body adjacent to a cell that
    overflows the slot cap must not double-count big<->overflow pairs —
    momentum is conserved and the result matches the dense oracle."""
    import jax

    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    n = 13
    # 12 smalls crammed into one spot + 1 big body overlapping them.
    pos = jnp.concatenate([
        jax.random.uniform(k1, (12, 2), jnp.float32, -5.0, 5.0),
        jnp.array([[3.0, 0.0]]),
    ])
    vel = jax.random.uniform(k2, (n, 2), jnp.float32, -2.0, 2.0)
    mass = jnp.concatenate([jnp.ones((12,)), jnp.array([50.0])])
    radius = jnp.concatenate([jnp.full((12,), 1.5), jnp.array([400.0])])
    state = ParticleState.create(pos, vel, mass, radius)

    cfg = _cfg(collision_max_neighbors=4, collision_grid_res=64)
    dense = _dense_pass(state, cfg)
    from nbodysim_tpu.physics.collisions import _bucket_pass

    bucket = _bucket_pass(state, cfg)
    np.testing.assert_allclose(
        np.asarray(bucket.vel), np.asarray(dense.vel), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(bucket.pos), np.asarray(dense.pos), atol=1e-3)
    p0 = np.asarray(jnp.sum(mass[:, None] * vel, 0))
    p1 = np.asarray(jnp.sum(mass[:, None] * bucket.vel, 0))
    np.testing.assert_allclose(p1, p0, atol=1e-2)


def test_bucket_pass_momentum_large_random():
    """Bucket path conservation on a 70k-particle collision-rich cloud
    (covers the production N>64k path end-to-end)."""
    import jax

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    n = 70000
    pos = jax.random.uniform(k1, (n, 2), jnp.float32, -20000.0, 20000.0)
    vel = jax.random.uniform(k2, (n, 2), jnp.float32, -50.0, 50.0)
    mass = jax.random.uniform(k3, (n,), jnp.float32, 0.5, 2.0)
    radius = jnp.full((n,), 60.0)  # overlap-rich
    state = ParticleState.create(pos, vel, mass, radius)

    out = resolve_collisions(state, _cfg())
    p0 = np.asarray(jnp.sum(mass[:, None] * vel, 0))
    p1 = np.asarray(jnp.sum(mass[:, None] * out.vel, 0))
    scale = float(jnp.sum(mass * jnp.linalg.norm(vel, axis=-1)))
    np.testing.assert_allclose(p1, p0, atol=scale * 1e-5)
    assert not np.allclose(np.asarray(out.vel), np.asarray(vel))


def test_residual_beyond_cap_conserves_momentum(monkeypatch):
    """Overflow BEYOND the residual capacity drops pairs SYMMETRICALLY:
    the old one-sided (b) pass gave unselected-overflow targets impulses
    from selected-overflow sources without the reciprocal, injecting net
    momentum every step (r3 review). Covers the bucket and hash paths."""
    import jax

    import nbodysim_tpu.physics.collisions as C
    from nbodysim_tpu.physics.collisions import _bucket_pass, _grid_pass

    monkeypatch.setattr(C, "_OVERFLOW_CAP", 32)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    n = 512
    # One dense overlapping blob inside a wide domain: the blob cell
    # overflows far past cap + the 32-slot residual, so unselected
    # overflow exists.
    blob = 5.0 * jax.random.normal(k1, (n - 8, 2))
    far = jax.random.uniform(jax.random.PRNGKey(8), (8, 2), jnp.float32,
                             -20000.0, 20000.0)
    pos = jnp.concatenate([blob, far])
    vel = jax.random.uniform(k2, (n, 2), jnp.float32, -50.0, 50.0)
    mass = jax.random.uniform(k3, (n,), jnp.float32, 0.5, 2.0)
    radius = jnp.full((n,), 0.5)
    state = ParticleState.create(pos, vel, mass, radius)
    p0 = np.asarray(jnp.sum(mass[:, None] * vel, 0))
    scale = float(jnp.sum(mass * jnp.linalg.norm(vel, axis=-1)))

    for pass_fn, kw in ((_bucket_pass, dict()),
                        (_grid_pass, dict(collision_cell_size=0.0))):
        out = pass_fn(state, _cfg(collision_max_neighbors=8, **kw))
        assert bool(jnp.all(jnp.isfinite(out.vel)))
        p1 = np.asarray(jnp.sum(mass[:, None] * out.vel, 0))
        np.testing.assert_allclose(p1, p0, atol=scale * 1e-5)
        assert not np.allclose(np.asarray(out.vel), np.asarray(vel))


def test_pallas_collision_kernel_matches_xla():
    """The Pallas dense narrow phase (kernels/collide.py, interpret mode)
    must reproduce the blocked-XLA _pair_deltas oracle bit-for-bit-ish on
    a dense colliding cloud (2D and 3D)."""
    import jax
    import jax.numpy as jnp

    from nbodysim_tpu.core.state import ParticleState
    from nbodysim_tpu.physics.collisions import _dense_pass

    for dim in (2, 3):
        key = jax.random.PRNGKey(7 + dim)
        kp, kv, km = jax.random.split(key, 3)
        n = 300
        pos = jax.random.uniform(kp, (n, dim), jnp.float32, -10.0, 10.0)
        vel = jax.random.uniform(kv, (n, dim), jnp.float32, -5.0, 5.0)
        mass = jax.random.uniform(km, (n,), jnp.float32, 0.5, 2.0)
        radius = jnp.cbrt(mass) * 1.5   # dense enough to overlap a lot
        state = ParticleState(
            pos=pos, vel=vel, acc=jnp.zeros_like(pos), mass=mass,
            radius=radius, frame=jnp.array(0))
        cfg_x = SimConfig(n=n, dim=dim, collision_backend="xla")
        cfg_p = SimConfig(n=n, dim=dim, collision_backend="pallas",
                             pallas_interpret=True)
        out_x = _dense_pass(state, cfg_x)
        out_p = _dense_pass(state, cfg_p)
        scale = float(jnp.abs(out_x.vel).max())
        np.testing.assert_allclose(
            np.asarray(out_p.pos), np.asarray(out_x.pos),
            atol=1e-5 * max(scale, 10.0), err_msg=f"dim={dim} pos")
        np.testing.assert_allclose(
            np.asarray(out_p.vel), np.asarray(out_x.vel),
            atol=1e-5 * max(scale, 10.0), err_msg=f"dim={dim} vel")
        # Momentum conservation must hold for the kernel too.
        p0 = np.asarray((mass[:, None] * vel).sum(0))
        p1 = np.asarray((out_p.mass[:, None] * out_p.vel).sum(0))
        np.testing.assert_allclose(p1, p0, atol=1e-2 * np.abs(p0).max())


def _rand_state(n, dim, span, vspan, rad, seed):
    import jax

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    pos = jax.random.uniform(k1, (n, dim), jnp.float32, -span, span)
    vel = jax.random.uniform(k2, (n, dim), jnp.float32, -vspan, vspan)
    mass = jax.random.uniform(k3, (n,), jnp.float32, 0.5, 2.0)
    radius = jnp.full((n,), rad)
    return ParticleState.create(pos, vel, mass, radius)


def test_grid_pass_3d_overflow_matches_dense():
    """VERDICT item 3: clustered 3D cells beyond the window cap must go
    through the exact residual — the pass then matches the dense oracle
    and conserves momentum (round 1 injected momentum here)."""
    n = 1200
    # Everything inside ~2 cells of size 600 -> rank overflow everywhere.
    state = _rand_state(n, 3, 500.0, 50.0, 15.0, seed=11)
    cfg = _cfg(dim=3, collision_max_neighbors=16)
    dense = _dense_pass(state, cfg)
    grid = _grid_pass(state, cfg)
    np.testing.assert_allclose(
        np.asarray(grid.pos), np.asarray(dense.pos), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(grid.vel), np.asarray(dense.vel), atol=2e-3)
    p0 = np.asarray((state.mass[:, None] * state.vel).sum(0))
    p1 = np.asarray((grid.mass[:, None] * grid.vel).sum(0))
    np.testing.assert_allclose(p1, p0, atol=1e-2 * np.abs(p0).max() + 1e-3)


def test_grid_pass_3d_big_bodies_match_dense():
    """VERDICT item 3: pairs whose combined radius exceeds the cell size
    were missed in round 1; big-body extraction must recover them."""
    import jax

    n = 600
    state = _rand_state(n, 3, 3000.0, 50.0, 10.0, seed=13)
    # One giant body (radius 5x the 600-unit cell) overlapping many others.
    radius = state.radius.at[0].set(3000.0)
    mass = state.mass.at[0].set(500.0)
    state = state.replace(radius=radius, mass=mass)
    cfg = _cfg(dim=3, collision_max_neighbors=32)
    dense = _dense_pass(state, cfg)
    grid = _grid_pass(state, cfg)
    scale = float(jnp.abs(dense.vel).max())
    np.testing.assert_allclose(
        np.asarray(grid.pos), np.asarray(dense.pos), atol=1e-4 * 3000.0)
    np.testing.assert_allclose(
        np.asarray(grid.vel), np.asarray(dense.vel), atol=1e-4 * scale)


def test_grid_pass_3d_momentum_mixed_large():
    """Momentum conservation on a mixed clustered+spread 3D scene with
    overflow and big bodies at once (the full safeguard stack)."""
    import jax

    n = 4000
    state = _rand_state(n, 3, 4000.0, 80.0, 25.0, seed=17)
    # Clustered core: half the particles inside one cell.
    pos = state.pos.at[: n // 2].set(state.pos[: n // 2] * 0.05)
    radius = state.radius.at[:3].set(jnp.array([2000.0, 900.0, 700.0]))
    state = state.replace(pos=pos, radius=radius)
    cfg = _cfg(dim=3, collision_max_neighbors=8)
    out = _grid_pass(state, cfg)
    assert np.all(np.isfinite(np.asarray(out.pos)))
    p0 = np.asarray((state.mass[:, None] * state.vel).sum(0))
    p1 = np.asarray((out.mass[:, None] * out.vel).sum(0))
    gross = float(jnp.abs(out.mass[:, None] * out.vel).sum())
    np.testing.assert_allclose(p1, p0, atol=1e-5 * gross)


def test_grid_pass_chunked_window_matches_single_shot():
    """Large-N hash pass chunks the windowed candidate scan under lax.map
    (a single-shot [N, C*W, D] scan OOMs HBM at N=4M); the chunked scan
    must match the single-shot program to roundoff and keep momentum."""
    import jax

    import nbodysim_tpu.physics.collisions as collisions_mod

    for dim in (2, 3):
        state = _rand_state(1500, dim, 100.0, 5.0, 4.0, seed=dim)
        radius = state.radius.at[:3].set(30.0)      # big-body path too
        state = state.replace(radius=radius)
        cfg = _cfg(dim=dim, collision_broad_phase="hash",
                   collision_cell_size=0.0)
        single = _grid_pass(state, cfg)
        old = collisions_mod._WINDOW_CHUNK
        collisions_mod._WINDOW_CHUNK = 256
        try:
            chunked = _grid_pass(state, cfg)
        finally:
            collisions_mod._WINDOW_CHUNK = old
        scale = float(jnp.max(jnp.abs(single.vel - state.vel)))
        np.testing.assert_allclose(np.asarray(chunked.pos),
                                   np.asarray(single.pos),
                                   atol=1e-4 * max(scale, 1.0))
        np.testing.assert_allclose(np.asarray(chunked.vel),
                                   np.asarray(single.vel),
                                   atol=1e-4 * max(scale, 1.0))
        p0 = np.asarray((state.mass[:, None] * state.vel).sum(0))
        p1 = np.asarray((chunked.mass[:, None] * chunked.vel).sum(0))
        gross = float(jnp.abs(chunked.mass[:, None] * chunked.vel).sum())
        np.testing.assert_allclose(p1, p0, atol=1e-5 * gross)
