"""Deep-overflow multipole chain (2D tree-PM regime).

Covers the three contracts of barneshut._bh_accelerations(deep_levels=...):
  1. a scene with NO overflowing cells is bit-for-bit unaffected (the
     deep branch only replaces forces near hot cells);
  2. a heavily clustered scene gets bounded, locally-smoothed forces at
     any occupancy (no residual-capacity cliff, no blowups), while
     particles away from the hot region keep exact-tier accuracy;
  3. 'auto' backend resolution turns the chain on (and the capacity
     warning off) when clustering exceeds the exact-residual capacity.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.physics import barneshut as bh
from nbodysim_tpu.physics.forces import direct_accelerations

EPS_SQ = 1.0


def _forces(pos, mass, levels, deep):
    return np.asarray(bh._bh_accelerations(
        pos, mass, levels=levels, eps_sq=EPS_SQ, g_const=1.0,
        near_cap=bh.NEAR_CAP, radius=3, deep_levels=deep))


def _clustered(n, seed=3):
    k = jax.random.split(jax.random.PRNGKey(seed), 4)
    blob1 = 60.0 * jax.random.normal(k[0], (n // 4, 2)) + jnp.array(
        [1500.0, -700.0])
    blob2 = 40.0 * jax.random.normal(k[1], (n // 4, 2)) + jnp.array(
        [-2000.0, 1000.0])
    bg = jax.random.uniform(k[2], (n // 2, 2), jnp.float32,
                            -4000.0, 4000.0)
    pos = jnp.concatenate([blob1, blob2, bg]).astype(jnp.float32)
    mass = jax.random.uniform(k[3], (n,), jnp.float32, 0.1, 10.0)
    return pos, mass


def test_deep_inert_without_overflow():
    n = 2048
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pos = jax.random.uniform(k1, (n, 2), jnp.float32, -4000.0, 4000.0)
    mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)
    cfg = SimConfig(n=n)
    assert int(bh.bh_near_overflow(pos, mass,
                                   SimConfig(n=n, bh_levels=4))) == 0
    a0 = _forces(pos, mass, 4, 0)
    a1 = _forces(pos, mass, 4, 8)
    # no hot cells -> the deep branch selects nothing; only roundoff from
    # building the pyramid deeper and pooling up differs.
    assert np.allclose(a0, a1, rtol=1e-4, atol=1e-7), (
        np.abs(a0 - a1).max())


def test_deep_clustered_bounded_and_cool_targets_exact():
    n = 4096
    pos, mass = _clustered(n)
    cfg_probe = SimConfig(n=n, bh_levels=4)
    over = int(bh.bh_near_overflow(pos, mass, cfg_probe))
    assert over > 1000, over          # the scene really is clustered

    a_d = np.asarray(direct_accelerations(pos, mass, eps_sq=EPS_SQ,
                                          g_const=1.0))
    a = _forces(pos, mass, 4, 9)
    rel = (np.linalg.norm(a - a_d, axis=1)
           / (np.linalg.norm(a_d, axis=1) + 1e-12))
    # background half of the particles: away from the blobs -> exact-tier
    bg_rel = rel[n // 2:]
    assert np.median(bg_rel) < 2e-2, np.median(bg_rel)
    # blob particles: PM-smoothed, bounded — no runaway forces. The old
    # residual-overflow path injected unbounded one-sided errors here.
    fmag = np.linalg.norm(a, axis=1)
    dmag = np.linalg.norm(a_d, axis=1)
    assert fmag.max() < 10.0 * dmag.max(), (fmag.max(), dmag.max())
    assert np.isfinite(a).all()


def test_tile_refinement_improves_clustered_accuracy():
    """Hot-zone sub-box tiles (VERDICT r2 #2): on a clustered scene the
    tiled deep chain must be strictly more accurate than the plain deep
    chain (2^k finer PM smoothing inside the hot tiles), and inert on
    scenes with no hot cells."""
    n = 4096
    pos, mass = _clustered(n)
    cfg0 = SimConfig(n=n, bh_levels=5, bh_deep_levels=7, bh_tile_levels=0,
                     force_backend="bh")
    cfg3 = SimConfig(n=n, bh_levels=5, bh_deep_levels=7, bh_tile_levels=3,
                     bh_tile_size=16, force_backend="bh")
    a_d = np.asarray(direct_accelerations(pos, mass, eps_sq=EPS_SQ,
                                          g_const=1.0))
    nrm = np.linalg.norm(a_d, axis=1) + 1e-12
    e0 = np.median(np.linalg.norm(
        np.asarray(bh.bh_accelerations(pos, mass, cfg0)) - a_d, axis=1)
        / nrm)
    e3 = np.median(np.linalg.norm(
        np.asarray(bh.bh_accelerations(pos, mass, cfg3)) - a_d, axis=1)
        / nrm)
    assert e3 < 0.7 * e0, (e3, e0)

    # Inert without hot cells: uniform scene, tiles on == tiles off.
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    up = jax.random.uniform(k1, (2048, 2), jnp.float32, -4000.0, 4000.0)
    um = jax.random.uniform(k2, (2048,), jnp.float32, 0.1, 10.0)
    u0 = np.asarray(bh.bh_accelerations(up, um, cfg0.replace(n=2048)))
    u3 = np.asarray(bh.bh_accelerations(up, um, cfg3.replace(n=2048)))
    assert np.allclose(u0, u3, rtol=1e-4, atol=1e-7)


def test_tile_selection_follows_migrated_mass():
    """VERDICT r3 #6 (re-pin): tile placement is NOT pinned at init —
    `_tile_select` top-ks the deep-target occupancy INSIDE the jitted
    step, so a 10k-step merger whose nuclei migrate re-selects tiles
    every evaluation. Gate: one compiled function evaluated on the same
    scene with the hot blobs TRANSLATED to the opposite corners keeps
    tile-tier accuracy at both placements (an init-pinned selection
    would lose the refinement after the move)."""
    n = 4096
    pos, mass = _clustered(n)
    cfg = SimConfig(n=n, bh_levels=5, bh_deep_levels=7, bh_tile_levels=3,
                    bh_tile_size=16, force_backend="bh")
    fn = jax.jit(lambda p: bh.bh_accelerations(p, mass, cfg))

    def tile_err(p):
        a_d = np.asarray(direct_accelerations(p, mass, eps_sq=EPS_SQ,
                                              g_const=1.0))
        rel = (np.linalg.norm(np.asarray(fn(p)) - a_d, axis=1)
               / (np.linalg.norm(a_d, axis=1) + 1e-12))
        return np.median(rel)

    e_before = tile_err(pos)
    # Migrate: move each blob across the domain (background unchanged,
    # so the bounding square — and with it the grid geometry — barely
    # moves; only the hot-tile LOCATIONS change).
    moved = jnp.concatenate([
        pos[: n // 4] + jnp.array([-3000.0, 1500.0]),
        pos[n // 4: n // 2] + jnp.array([3500.0, -1800.0]),
        pos[n // 2:]])
    e_after = tile_err(moved)
    # Both placements hold tile-tier accuracy (the untiled deep chain
    # measures ~5e-2 median on this scene; tiles ~1.5e-2).
    assert e_before < 3.5e-2, e_before
    assert e_after < 3.5e-2, e_after


def test_tile_params_resolution():
    cfg = SimConfig(n=1024)
    # off when the deep chain is off
    assert bh._resolve_tile_params(cfg, 0, 3) == (0, 0, 0)
    # auto: 3 sub-levels at the 2D default tile size
    assert bh._resolve_tile_params(cfg, 10, 3) == (3, 32, 8)
    # explicit off
    assert bh._resolve_tile_params(
        cfg.replace(bh_tile_levels=0), 10, 3) == (0, 0, 0)
    # tiny deep grids shrink the tile until enough tiles exist...
    k, t, c = bh._resolve_tile_params(cfg, 6, 3)
    assert k == 3 and t * max(1, (1 << 6) // t) <= 1 << 6 and t >= 6
    # ...and disable when t would drop below the 2R halo minimum
    assert bh._resolve_tile_params(cfg, 3, 3) == (0, 0, 0)


def test_auto_resolution_enables_deep_chain():
    from nbodysim_tpu.physics.forces import resolve_config_for_state

    n = 4096
    pos, mass = _clustered(n)
    # force the bh branch of auto by a tiny threshold override: call the
    # resolver with a config whose n exceeds the auto threshold is not
    # possible here, so drive the probe directly via a bh-selecting n.
    cfg = SimConfig(n=n, force_backend="auto", bh_levels=4)
    from nbodysim_tpu.physics import forces as forces_mod
    orig = forces_mod.BH_AUTO_THRESHOLD
    orig_cap = bh._OVERFLOW_CAP
    forces_mod.BH_AUTO_THRESHOLD = 1024
    # the exact residual covers any overflow at n <= 16384, so shrink the
    # capacity to exercise the production-scale activation path
    bh._OVERFLOW_CAP = 100
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = resolve_config_for_state(pos, mass, cfg)
        assert out.force_backend == "bh"
        assert out.bh_deep_levels == -1
        assert any("deep-overflow" in str(x.message) for x in w)
    finally:
        forces_mod.BH_AUTO_THRESHOLD = orig
        bh._OVERFLOW_CAP = orig_cap


def test_deep3d_inert_and_bounded():
    from nbodysim_tpu.physics import barneshut3d as b3

    n = 2048
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    blob = 40.0 * jax.random.normal(k[0], (n // 2, 3)) + jnp.array(
        [500.0, -300.0, 200.0])
    bg = jax.random.uniform(k[2], (n // 2, 3), jnp.float32,
                            -2000.0, 2000.0)
    pos = jnp.concatenate([blob, bg]).astype(jnp.float32)
    mass = jax.random.uniform(k[3], (n,), jnp.float32, 0.1, 10.0)
    a_d = np.asarray(direct_accelerations(pos, mass, eps_sq=EPS_SQ,
                                          g_const=1.0))
    a = np.asarray(b3._bh3_accelerations(
        pos, mass, levels=4, eps_sq=EPS_SQ, g_const=1.0,
        near_cap=16, radius=2, deep_levels=6))
    assert np.isfinite(a).all()
    rel = (np.linalg.norm(a - a_d, axis=1)
           / (np.linalg.norm(a_d, axis=1) + 1e-12))
    assert np.median(rel[n // 2:]) < 3e-2       # background: exact-tier
    fmag = np.linalg.norm(a, axis=1)
    assert fmag.max() < 10.0 * np.linalg.norm(a_d, axis=1).max()

    # uniform scene: the deep branch must select nothing
    k1, _ = jax.random.split(jax.random.PRNGKey(0))
    posu = jax.random.uniform(k1, (n, 3), jnp.float32, -2000.0, 2000.0)
    kw = dict(levels=4, eps_sq=EPS_SQ, g_const=1.0, near_cap=16, radius=2)
    a0 = np.asarray(b3._bh3_accelerations(posu, mass, deep_levels=0, **kw))
    a1 = np.asarray(b3._bh3_accelerations(posu, mass, deep_levels=6, **kw))
    assert np.allclose(a0, a1, rtol=1e-4, atol=1e-6)

    # R=3 activates the deep aggregate-shell fold (a static no-op at the
    # default R=2; r3 review found it untested) — same clustered scene
    # must stay finite with background accuracy at least as good.
    a3 = np.asarray(b3._bh3_accelerations(
        pos, mass, levels=4, eps_sq=EPS_SQ, g_const=1.0, near_cap=16,
        radius=3, deep_levels=6))
    assert np.isfinite(a3).all()
    rel3 = (np.linalg.norm(a3 - a_d, axis=1)
            / (np.linalg.norm(a_d, axis=1) + 1e-12))
    assert np.median(rel3[n // 2:]) < 3e-2


def test_deep_rollout_stable():
    """Dynamic contract: a COLD-COLLAPSING clustered scene stepped with
    the deep chain stays finite with bounded energy drift (the old
    residual overflow injected unbounded one-sided forces here). Cold
    collapse drives the blob far below the PM smoothing scale, so the
    integrated (smoothed) Hamiltonian visibly departs from the exact
    energy — measured r3: 1.7e-2 at 300 steps without tiles, 3.4e-2 at
    1000 steps with tiles. Boundedness, not accuracy, is this test's
    contract; the tightened drift gate lives in
    test_deep_drift_gate_virialized."""
    from nbodysim_tpu.core.state import ParticleState
    from nbodysim_tpu.diagnostics.metrics import diagnostics
    from nbodysim_tpu.physics.integrators import (
        make_rollout, prime_accelerations)

    n = 2048
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    blob = 60.0 * jax.random.normal(k[0], (n // 2, 2)) + jnp.array(
        [1500.0, -700.0])
    bg = jax.random.uniform(k[2], (n // 2, 2), jnp.float32,
                            -4000.0, 4000.0)
    pos = jnp.concatenate([blob, bg])
    vel = 0.1 * jax.random.normal(k[1], (n, 2))
    cfg = SimConfig(n=n, dt=0.05, force_backend="bh", bh_levels=4,
                    bh_deep_levels=7, integrator="leapfrog_kdk",
                    enable_collisions=False, enable_boundary=False,
                    enable_velocity_clamp=False, softening=5.0)
    state = prime_accelerations(
        ParticleState.create(pos=pos, vel=vel, mass=jnp.ones((n,))), cfg)
    e0 = float(diagnostics(state, cfg).total_energy)
    out = make_rollout(cfg, 300)(state)
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    e1 = float(diagnostics(out, cfg).total_energy)
    assert abs(e1 - e0) / abs(e0) < 5e-2, (e0, e1)


def test_cold_collapse_accuracy_tiles_k4():
    """Accuracy-gated cold collapse (VERDICT r3 #6): the r4 attribution
    run (scripts/drift_cold.py) measured the EXACT solver at |dE/E| ~
    1.1e-5 over the same 1000 steps — the 3.4e-2 deep-chain drift is
    force-smoothing error, not timestep error, so tile-level escalation
    is the right lever. One extra tile level (k=4, 16x finer smoothing
    in hot tiles) measured 1.16e-3 @300 / 7.5e-3 @1000 — under the 1e-2
    per-1k-steps target. CI gates the 300-step mark with 3x headroom."""
    from nbodysim_tpu.core.state import ParticleState
    from nbodysim_tpu.diagnostics.metrics import diagnostics
    from nbodysim_tpu.physics.integrators import (
        make_rollout, prime_accelerations)

    n = 2048
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    blob = 60.0 * jax.random.normal(k[0], (n // 2, 2)) + jnp.array(
        [1500.0, -700.0])
    bg = jax.random.uniform(k[2], (n // 2, 2), jnp.float32,
                            -4000.0, 4000.0)
    pos = jnp.concatenate([blob, bg])
    vel = 0.1 * jax.random.normal(k[1], (n, 2))
    cfg = SimConfig(n=n, dt=0.05, force_backend="bh", bh_levels=4,
                    bh_deep_levels=7, bh_tile_levels=4, bh_tile_size=16,
                    integrator="leapfrog_kdk", enable_collisions=False,
                    enable_boundary=False, enable_velocity_clamp=False,
                    softening=5.0)
    state = prime_accelerations(
        ParticleState.create(pos=pos, vel=vel, mass=jnp.ones((n,))), cfg)
    e0 = float(diagnostics(state, cfg).total_energy)
    out = make_rollout(cfg, 300)(state)
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    e1 = float(diagnostics(out, cfg).total_energy)
    assert abs(e1 - e0) / abs(e0) < 4e-3, (e0, e1)


def test_deep_drift_gate_virialized():
    """CI-scale drift regression gate for the deep chain (VERDICT r2 #6):
    a VIRIALIZED clustered blob (sigma_v = sqrt(GM/2R)) stepped 1000
    steps with deep + tile refinement holds |dE/E| < 1e-2 — measured
    4.56e-3 (r3). The gate pins the regime where the deep chain claims
    accuracy: tile smoothing scale (0.3 * 62.5/8 ~ 2.3 units) below the
    softening (30). The long-horizon evidence is scripts/drift_deep.py:
    N=65k galaxy merger, 10k steps, worst |dE/E| = 2.55e-5 on the chip.
    (Cold collapse instead drifts ~3.4e-2/1k steps — that regime is
    test_deep_rollout_stable's boundedness contract.)"""
    from nbodysim_tpu.core.state import ParticleState
    from nbodysim_tpu.diagnostics.metrics import diagnostics
    from nbodysim_tpu.physics.integrators import (
        make_rollout, prime_accelerations)

    n = 2048
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    blob = 60.0 * jax.random.normal(k[0], (n // 2, 2)) + jnp.array(
        [1500.0, -700.0])
    bg = jax.random.uniform(k[2], (n // 2, 2), jnp.float32,
                            -4000.0, 4000.0)
    pos = jnp.concatenate([blob, bg])
    sig = float(np.sqrt((n // 2) * 1.0 / (2 * 60.0)))
    vel = jnp.concatenate([
        sig * jax.random.normal(k[1], (n // 2, 2)),
        0.1 * jax.random.normal(k[3], (n // 2, 2))])
    cfg = SimConfig(n=n, dt=0.05, force_backend="bh", bh_levels=4,
                    bh_deep_levels=7, bh_tile_levels=-1, bh_tile_size=16,
                    integrator="leapfrog_kdk",
                    enable_collisions=False, enable_boundary=False,
                    enable_velocity_clamp=False, softening=30.0)
    state = prime_accelerations(
        ParticleState.create(pos=pos, vel=vel, mass=jnp.ones((n,))), cfg)
    e0 = float(diagnostics(state, cfg).total_energy)
    roll = make_rollout(cfg, 500)
    worst = 0.0
    for _ in range(2):
        state = roll(state)
        e = float(diagnostics(state, cfg).total_energy)
        worst = max(worst, abs(e - e0) / abs(e0))
    assert bool(jnp.all(jnp.isfinite(state.pos)))
    assert worst < 1e-2, worst


def test_resolve_deep_levels():
    cfg = SimConfig(n=1024)
    assert bh._resolve_deep_levels(cfg, 10) == 0
    assert bh._resolve_deep_levels(cfg.replace(bh_deep_levels=-1), 10) == 12
    assert bh._resolve_deep_levels(cfg.replace(bh_deep_levels=12), 10) == 12
    # shallower-than-bucket request disables
    assert bh._resolve_deep_levels(cfg.replace(bh_deep_levels=5), 10) == 0


def test_compact_indices_unit():
    mask = jnp.array([False, True, True, False, True])
    sidx, cnt = bh._compact_indices(mask, 2)
    assert int(cnt) == 3
    assert sidx.tolist() == [1, 2]
    sidx4, _ = bh._compact_indices(mask, 4)
    assert sidx4.tolist() == [1, 2, 4, 5]       # 5 = sentinel (= n)


def test_tile_apply_compaction_parity(monkeypatch):
    """r5: the tile apply evaluates a COMPACTED refined-candidate set
    (the full-length pass discarded ~85% of its rows on the flagship
    merger). Full-length, compacted, and overflow-fallback paths must
    agree bitwise."""
    n = 4096
    pos, mass = _clustered(n)
    cfg = SimConfig(n=n, bh_levels=5, bh_deep_levels=7, bh_tile_levels=3,
                    bh_tile_size=16, force_backend="bh")
    a_full = np.asarray(bh.bh_accelerations(pos, mass, cfg))

    # Compacted: cap 90% of n engages unless >90% of rows refine (the
    # scene's uniform background half never does).
    monkeypatch.setattr(bh, "_refined_cap", lambda n: (9 * n) // 10)
    jax.clear_caches()
    a_compact = np.asarray(bh.bh_accelerations(pos, mass, cfg))
    assert np.array_equal(a_full, a_compact)

    # Overflow fallback: cap 16 certainly overflows -> lax.cond full pass.
    monkeypatch.setattr(bh, "_refined_cap", lambda n: 16)
    jax.clear_caches()
    a_fb = np.asarray(bh.bh_accelerations(pos, mass, cfg))
    assert np.array_equal(a_full, a_fb)

    # Scatter-source compaction (r5): compacted sources and the
    # overflow fallback must reproduce the full-length scatter bitwise.
    monkeypatch.setattr(bh, "_refined_cap", lambda n: n)
    monkeypatch.setattr(bh, "_scatter_cap", lambda n: (9 * n) // 10)
    jax.clear_caches()
    a_cs = np.asarray(bh.bh_accelerations(pos, mass, cfg))
    assert np.array_equal(a_full, a_cs)
    monkeypatch.setattr(bh, "_scatter_cap", lambda n: 16)
    jax.clear_caches()
    a_csf = np.asarray(bh.bh_accelerations(pos, mass, cfg))
    assert np.array_equal(a_full, a_csf)
    jax.clear_caches()      # drop traces that baked the patched caps


def test_tile_apply_compaction_parity_3d(monkeypatch):
    from nbodysim_tpu.physics import barneshut3d as b3

    n = 4096
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    blob = 40.0 * jax.random.normal(k[0], (n // 2, 3)) + jnp.array(
        [500.0, -300.0, 200.0])
    bg = jax.random.uniform(k[2], (n // 2, 3), jnp.float32,
                            -2000.0, 2000.0)
    pos = jnp.concatenate([blob, bg]).astype(jnp.float32)
    mass = jax.random.uniform(k[3], (n,), jnp.float32, 0.1, 10.0)
    kw = dict(levels=4, eps_sq=EPS_SQ, g_const=1.0, near_cap=16, radius=2,
              deep_levels=6, tile_levels=2, tile_size=4, tile_count=8)
    a_full = np.asarray(b3._bh3_accelerations(pos, mass, **kw))
    assert np.isfinite(a_full).all()

    monkeypatch.setattr(b3, "_refined_cap3", lambda n: (9 * n) // 10)
    jax.clear_caches()
    a_compact = np.asarray(b3._bh3_accelerations(pos, mass, **kw))
    assert np.array_equal(a_full, a_compact)

    monkeypatch.setattr(b3, "_refined_cap3", lambda n: 16)
    jax.clear_caches()
    a_fb = np.asarray(b3._bh3_accelerations(pos, mass, **kw))
    assert np.array_equal(a_full, a_fb)

    monkeypatch.setattr(b3, "_refined_cap3", lambda n: n)
    monkeypatch.setattr(b3, "_scatter_cap3", lambda n: (9 * n) // 10)
    jax.clear_caches()
    a_cs = np.asarray(b3._bh3_accelerations(pos, mass, **kw))
    assert np.array_equal(a_full, a_cs)
    monkeypatch.setattr(b3, "_scatter_cap3", lambda n: 16)
    jax.clear_caches()
    a_csf = np.asarray(b3._bh3_accelerations(pos, mass, **kw))
    assert np.array_equal(a_full, a_csf)
    jax.clear_caches()


def test_deep_rows_compaction_parity(monkeypatch):
    """r5: with tiles on, the deep L2P + aggregate pass runs only on
    b_par & ~refined rows (refined rows discard both — the tile output
    overrides them). Compacted, overflow-fallback, and full paths must
    agree bitwise, in 2D and 3D."""
    from nbodysim_tpu.physics import barneshut3d as b3

    n = 4096
    pos, mass = _clustered(n)
    cfg = SimConfig(n=n, bh_levels=5, bh_deep_levels=7, bh_tile_levels=3,
                    bh_tile_size=16, force_backend="bh")
    a_full = np.asarray(bh.bh_accelerations(pos, mass, cfg))

    monkeypatch.setattr(bh, "_deep_rows_cap", lambda n: (9 * n) // 10)
    jax.clear_caches()
    a_compact = np.asarray(bh.bh_accelerations(pos, mass, cfg))
    assert np.array_equal(a_full, a_compact)

    monkeypatch.setattr(bh, "_deep_rows_cap", lambda n: 16)
    jax.clear_caches()
    a_fb = np.asarray(bh.bh_accelerations(pos, mass, cfg))
    assert np.array_equal(a_full, a_fb)
    jax.clear_caches()

    k = jax.random.split(jax.random.PRNGKey(3), 4)
    blob = 40.0 * jax.random.normal(k[0], (n // 2, 3)) + jnp.array(
        [500.0, -300.0, 200.0])
    bg = jax.random.uniform(k[2], (n // 2, 3), jnp.float32,
                            -2000.0, 2000.0)
    pos3 = jnp.concatenate([blob, bg]).astype(jnp.float32)
    mass3 = jax.random.uniform(k[3], (n,), jnp.float32, 0.1, 10.0)
    kw = dict(levels=4, eps_sq=EPS_SQ, g_const=1.0, near_cap=16, radius=2,
              deep_levels=6, tile_levels=2, tile_size=4, tile_count=8)
    b_full = np.asarray(b3._bh3_accelerations(pos3, mass3, **kw))
    assert np.isfinite(b_full).all()

    monkeypatch.setattr(b3, "_deep_rows_cap3", lambda n: (9 * n) // 10)
    jax.clear_caches()
    b_compact = np.asarray(b3._bh3_accelerations(pos3, mass3, **kw))
    assert np.array_equal(b_full, b_compact)

    monkeypatch.setattr(b3, "_deep_rows_cap3", lambda n: 16)
    jax.clear_caches()
    b_fb = np.asarray(b3._bh3_accelerations(pos3, mass3, **kw))
    assert np.array_equal(b_full, b_fb)
    jax.clear_caches()


def test_packed_aggregates_bitwise_parity():
    """r5: the packed (lane-widened) deep near-aggregate variants must be
    bitwise-identical to the per-offset gather form (same f32 ops in the
    same accumulation order) — 2D and 3D."""
    from nbodysim_tpu.physics import barneshut3d as b3

    key = jax.random.split(jax.random.PRNGKey(7), 6)
    n, r = 512, 16
    # 2D
    g3 = jax.random.normal(key[0], (r, r, 3), jnp.float32)
    g3 = g3.at[..., 0].set(jnp.abs(g3[..., 0]))
    g3_pad = jnp.pad(g3, ((1, 1), (1, 1), (0, 0)))
    ci = jax.random.randint(key[1], (n, 2), 0, r)
    pos = jax.random.normal(key[2], (n, 2), jnp.float32) * r
    payload = jnp.zeros((n, 3), jnp.float32)
    a_old = np.asarray(bh._deep_near_aggregates(
        pos, payload, g3_pad, ci, 1.0, 2.0, rr=1))
    a_new = np.asarray(bh._deep_near_aggregates_packed(
        pos, payload, g3_pad, ci, 1.0, 2.0))
    assert np.array_equal(a_old, a_new)
    # 3D
    g4 = jax.random.normal(key[3], (r, r, r, 4), jnp.float32)
    g4 = g4.at[..., 0].set(jnp.abs(g4[..., 0]))
    g4_pad = jnp.pad(g4, ((1, 1), (1, 1), (1, 1), (0, 0)))
    ci3 = jax.random.randint(key[4], (n, 3), 0, r)
    pos3 = jax.random.normal(key[5], (n, 3), jnp.float32) * r
    payload3 = jnp.zeros((n, 4), jnp.float32)
    b_old = np.asarray(b3._deep_near_aggregates3(
        pos3, payload3, g4_pad, ci3, 1.0, 2.0, rr=1))
    b_new = np.asarray(b3._deep_near_aggregates3_packed(
        pos3, payload3, g4_pad, ci3, 1.0, 2.0))
    assert np.array_equal(b_old, b_new)

    # The shared packed helpers must match _aggregate_window_eval* given
    # the SAME flattened grid (the tile apply's rin=1 path wires them
    # with per-tile strides; this pins the helper math bitwise).
    side = r + 2
    g2flat = jnp.pad(g3, ((1, 1), (1, 1), (0, 0)))
    base2 = (ci[:, 0] + 1) * side + ci[:, 1] + 1
    w_old = np.asarray(bh._aggregate_window_eval(
        g2flat.reshape(-1, 3), base2, side, payload, pos, 1.0, 1))
    gy = jnp.concatenate([g2flat[:, :-2, :], g2flat[:, 1:-1, :],
                          g2flat[:, 2:, :]], axis=-1)
    gxy = jnp.concatenate([gy[:-2], gy[1:-1], gy[2:]], axis=-1)
    basep2 = ci[:, 0] * r + ci[:, 1]
    w_new = np.asarray(bh._packed_mono_window(
        gxy.reshape(-1, 27), basep2, payload, pos, 1.0))
    assert np.array_equal(w_old, w_new)

    g3flat = jnp.pad(g4, ((1, 1), (1, 1), (1, 1), (0, 0)))
    base3 = ((ci3[:, 0] + 1) * side + ci3[:, 1] + 1) * side \
        + ci3[:, 2] + 1
    v_old = np.asarray(b3._aggregate_window_eval3(
        g3flat.reshape(-1, 4), base3, side, payload3, pos3, 1.0, 1))
    gz = jnp.concatenate([g3flat[:, :, :-2, :], g3flat[:, :, 1:-1, :],
                          g3flat[:, :, 2:, :]], axis=-1)
    gyz = jnp.concatenate([gz[:, :-2], gz[:, 1:-1], gz[:, 2:]], axis=-1)
    basep3 = ((ci3[:, 0] + 1) * r + ci3[:, 1]) * r + ci3[:, 2]
    v_new = np.asarray(b3._packed_mono_window3(
        gyz.reshape(-1, 36), basep3, r * r, payload3, pos3, 1.0))
    assert np.array_equal(v_old, v_new)
