"""Banded multi-chip collision broad phase vs the single-chip passes.

parallel/collisions.py shards the large-N broad phases (2D bucket grid by
grid-row bands, sorted spatial hash by sorted-target chunks) and psums
disjoint contributions, so it must reproduce the single-chip
`_bucket_pass`/`_grid_pass` (physics/collisions.py) to roundoff on every
scene class: overlapping uniform clouds, big-body scenes (radius > cell/2),
and overflow-triggering clustered scenes. VERDICT r3 item 2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState
from nbodysim_tpu.parallel import make_mesh
from nbodysim_tpu.parallel.collisions import sharded_collision_deltas
from nbodysim_tpu.physics.collisions import (
    _block_pass,
    _bucket_pass,
    _dense_pass,
    _grid_pass,
)

_SINGLE = {"bucket": _bucket_pass, "hash": _grid_pass,
           "dense": _dense_pass, "block": _block_pass}


def _banded(state, cfg, n_dev=8):
    mesh = make_mesh(n_dev)

    def f(pos_l, vel_l, mass_l, radius_l):
        return sharded_collision_deltas(
            pos_l, vel_l, mass_l, radius_l, cfg, "shards")

    fn = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("shards"),) * 4,
        out_specs=(P("shards"), P("shards")), check_vma=False))
    dp, dv = fn(state.pos, state.vel, state.mass, state.radius)
    return np.asarray(dp), np.asarray(dv)


def _check(state, cfg, n_dev=8, rtol=2e-5, single=None):
    dp_b, dv_b = _banded(state, cfg, n_dev)
    one_pass = _SINGLE[single or cfg.collision_broad_phase]
    out = one_pass(state, cfg)
    dp_s = np.asarray(out.pos - state.pos)
    dv_s = np.asarray(out.vel - state.vel)
    # A pass with zero overlaps would vacuously 'match'; require activity.
    assert np.abs(dp_s).max() > 0 or np.abs(dv_s).max() > 0
    sp = max(np.abs(dp_s).max(), 1e-12)
    sv = max(np.abs(dv_s).max(), 1e-12)
    np.testing.assert_allclose(dp_b, dp_s, atol=sp * rtol)
    np.testing.assert_allclose(dv_b, dv_s, atol=sv * rtol)


def _overlapping(n, dim=2, seed=0, span=1000.0, r_lo=2.0, r_hi=12.0):
    """Random cloud dense enough that many pairs overlap, with velocities
    mixing approaching and separating branches of the narrow phase."""
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    pos = jax.random.uniform(k1, (n, dim), jnp.float32, -span, span)
    vel = jax.random.uniform(k2, (n, dim), jnp.float32, -5.0, 5.0)
    mass = jax.random.uniform(k3, (n,), jnp.float32, 0.1, 10.0)
    radius = jax.random.uniform(k4, (n,), jnp.float32, r_lo, r_hi)
    return ParticleState.create(pos=pos, vel=vel, mass=mass, radius=radius)


def _with_big(state, idx=0, radius=400.0, mass=1e6):
    """Plant a big body (radius > cell/2) that overlaps across cells."""
    return state.replace(
        radius=state.radius.at[idx].set(radius),
        mass=state.mass.at[idx].set(mass))


def _clustered(n, dim=2, seed=0):
    """Half the cloud collapsed into a tight blob: bucket cells overflow
    their slot caps and the residual path engages."""
    st = _overlapping(n, dim=dim, seed=seed)
    blob = st.pos[: n // 2] * 0.004 + jnp.array(
        [300.0, -200.0, 100.0][:dim])
    return st.replace(pos=jnp.concatenate([blob, st.pos[n // 2:]]))


# ---------------------------------------------------------------------
# 2D bucket grid (grid-row bands)
# ---------------------------------------------------------------------

def test_banded_bucket_uniform_matches(eight_devices):
    st = _overlapping(4096)
    cfg = SimConfig(n=4096, collision_broad_phase="bucket",
                    collision_grid_res=64)
    _check(st, cfg)


def test_banded_bucket_two_device_mesh(eight_devices):
    st = _overlapping(2048, seed=5)
    cfg = SimConfig(n=2048, collision_broad_phase="bucket",
                    collision_grid_res=64)
    _check(st, cfg, n_dev=2)


def test_banded_bucket_big_body_matches(eight_devices):
    """Big-body extraction: the exact everyone<->big passes split across
    the mesh (targets post-psum local, sources psum-partitioned)."""
    st = _with_big(_overlapping(4096, seed=1))
    cfg = SimConfig(n=4096, collision_broad_phase="bucket",
                    collision_grid_res=64)
    _check(st, cfg)


def test_banded_bucket_overflow_residual_matches(eight_devices):
    """Clustered blob overflows the slot cap; the banded residual's global
    selection must drop beyond-capacity pairs symmetrically and match the
    single-chip residual."""
    from nbodysim_tpu.physics.collisions import collision_bucket_overflow

    st = _clustered(4096, seed=2)
    cfg = SimConfig(n=4096, collision_broad_phase="bucket",
                    collision_grid_res=64, collision_max_neighbors=8)
    assert collision_bucket_overflow(st, cfg) > 0   # residual engages
    _check(st, cfg, rtol=5e-5)


def test_banded_bucket_compact_window_engages(eight_devices):
    """The compacted per-band window sort actually engages at this size
    (capacity model asserted) and still matches — identical slot ranks via
    the stable compact argsort."""
    from nbodysim_tpu.parallel.tree import compact_capacity

    n = 8192
    assert compact_capacity(n, 64 // 8 + 2, 64) < n
    st = _overlapping(n, seed=3)
    cfg = SimConfig(n=n, collision_broad_phase="bucket",
                    collision_grid_res=64)
    _check(st, cfg)


def test_banded_bucket_compact_fallback_clustered_band(eight_devices):
    """Everything in a thin x-strip lands in few bands: the hot device's
    window exceeds the compact capacity and falls back to the full-length
    sort in-jit while others stay compact — mixed branches must match."""
    st = _overlapping(8192, seed=4)
    st = st.replace(pos=st.pos * jnp.array([0.01, 1.0]))
    cfg = SimConfig(n=8192, collision_broad_phase="bucket",
                    collision_grid_res=64)
    _check(st, cfg, rtol=5e-5)


def test_banded_bucket_res_not_divisible_falls_back(eight_devices):
    """collision_grid_res not divisible by the mesh size -> replicated
    single-chip fallback, still correct."""
    st = _overlapping(2048, seed=6)
    cfg = SimConfig(n=2048, collision_broad_phase="bucket",
                    collision_grid_res=100)         # 100 % 8 != 0
    _check(st, cfg)


# ---------------------------------------------------------------------
# Sorted spatial hash (sorted-target-chunk bands)
# ---------------------------------------------------------------------

def test_banded_hash_3d_uniform_matches(eight_devices):
    st = _overlapping(4096, dim=3, r_lo=8.0, r_hi=30.0)
    cfg = SimConfig(n=4096, dim=3, collision_broad_phase="hash",
                    collision_cell_size=0.0)
    _check(st, cfg)


def test_banded_hash_3d_big_body_matches(eight_devices):
    st = _with_big(_overlapping(4096, dim=3, seed=1, r_lo=8.0, r_hi=30.0))
    cfg = SimConfig(n=4096, dim=3, collision_broad_phase="hash",
                    collision_cell_size=0.0)
    _check(st, cfg)


def test_banded_hash_3d_overflow_matches(eight_devices):
    """Clustered 3D blob exceeds the per-cell window; banded residual vs
    single-chip."""
    st = _clustered(4096, dim=3, seed=2)
    cfg = SimConfig(n=4096, dim=3, collision_broad_phase="hash",
                    collision_cell_size=0.0, collision_max_neighbors=8)
    _check(st, cfg, rtol=5e-5)


def test_banded_hash_2d_clustered_matches(eight_devices):
    """The flagship composition: clustered 2D scene on the radius-scaled
    hash (what resolve_collision_phase_for_state switches to)."""
    st = _clustered(4096, seed=7)
    cfg = SimConfig(n=4096, collision_broad_phase="hash",
                    collision_cell_size=0.0)
    _check(st, cfg)


def test_banded_hash_two_device_mesh(eight_devices):
    st = _overlapping(2048, dim=3, seed=5, r_lo=8.0, r_hi=30.0)
    cfg = SimConfig(n=2048, dim=3, collision_broad_phase="hash",
                    collision_cell_size=0.0)
    _check(st, cfg, n_dev=2)


# ---------------------------------------------------------------------
# Lex-sorted block pass (disjoint block bands)
# ---------------------------------------------------------------------

def test_banded_block_2d_uniform_matches(eight_devices):
    st = _overlapping(4096)
    cfg = SimConfig(n=4096, collision_broad_phase="block",
                    collision_cell_size=0.0)
    _check(st, cfg, single="block")


def test_banded_block_3d_matches(eight_devices):
    st = _overlapping(4096, dim=3, r_lo=8.0, r_hi=30.0)
    cfg = SimConfig(n=4096, dim=3, collision_broad_phase="block",
                    collision_cell_size=0.0)
    _check(st, cfg, single="block")


def test_banded_block_big_body_matches(eight_devices):
    st = _with_big(_overlapping(4096, seed=1))
    cfg = SimConfig(n=4096, collision_broad_phase="block",
                    collision_cell_size=0.0)
    _check(st, cfg, single="block")


def test_banded_block_clustered_matches(eight_devices):
    """The config-5 composition: clustered scene, some blocks uncovered
    (window span beyond the static gather window) taking the exact
    residual — the banded pass must reproduce residual selection too."""
    st = _clustered(4096, seed=2)
    cfg = SimConfig(n=4096, collision_broad_phase="block",
                    collision_cell_size=0.0)
    _check(st, cfg, single="block", rtol=5e-5)


def test_banded_block_two_device_mesh(eight_devices):
    st = _overlapping(2048, seed=5)
    cfg = SimConfig(n=2048, collision_broad_phase="block",
                    collision_cell_size=0.0)
    _check(st, cfg, n_dev=2, single="block")


def test_banded_block_uneven_bands_match(eight_devices):
    """nb not divisible by P: the band padding (sentinel keys, ok=0,
    empty windows) must stay inert. n=4864 -> nb=19 blocks over 8
    devices -> nb_loc=3, 5 pad blocks."""
    st = _overlapping(4864, seed=11)
    cfg = SimConfig(n=4864, collision_broad_phase="block",
                    collision_cell_size=0.0)
    _check(st, cfg, single="block")


def test_banded_block_per_device_flops_drop_with_mesh_size(eight_devices):
    """Strong-scaling evidence for the flagship collision path: the block
    pass's dense window stage divides by P in XLA's compiled cost
    analysis (same F_fixed + S/P fit as the bucket test; the replicated
    sort/window prep and the once-counted lax.map chunk bodies form the
    fixed floor)."""
    n = 1 << 15
    st = _overlapping(n, seed=22)
    cfg = SimConfig(n=n, collision_broad_phase="block",
                    collision_cell_size=0.0)

    def banded_flops(n_dev):
        mesh = make_mesh(n_dev)

        def f(p, v, m, r):
            return sharded_collision_deltas(p, v, m, r, cfg, "shards")

        fn = jax.shard_map(f, mesh=mesh, in_specs=(P("shards"),) * 4,
                           out_specs=(P("shards"), P("shards")),
                           check_vma=False)
        return _compiled_flops(fn, st.pos, st.vel, st.mass, st.radius)

    f2, f4, f8 = banded_flops(2), banded_flops(4), banded_flops(8)
    assert f8 < f4 < f2, (f2, f4, f8)
    s = (f2 - f8) / (1 / 2 - 1 / 8)
    fixed = f2 - s / 2
    assert abs(fixed + s / 4 - f4) < 0.1 * f4, (fixed, s, f4)
    # The scaling component covers at least the dense window stage:
    # nb * n_off * t_blk * w_len pair slots at >= 8 flops each.
    t_blk = cfg.collision_block_size
    w_len = 2 * t_blk + 512
    nb = -(-n // t_blk)
    assert s > nb * 3 * t_blk * w_len * 8, s


# ---------------------------------------------------------------------
# Dense small-N path + full-step integration
# ---------------------------------------------------------------------

def test_banded_dense_small_n_matches(eight_devices):
    """Below DENSE_THRESHOLD the dispatch keeps the gathered dense pass,
    which must match the single-chip dense pass."""
    st = _overlapping(1024, seed=8)
    cfg = SimConfig(n=1024, collision_broad_phase="dense")
    _check(st, cfg)


def test_sharded_step_banded_collisions_conserve_momentum(eight_devices):
    """One full sharded step with the banded bucket pass conserves total
    momentum (every applied impulse has its Jacobi counterpart across
    device boundaries)."""
    from nbodysim_tpu.parallel import (
        make_sharded_step, prime_accelerations_sharded, shard_state)

    st = _overlapping(2048, seed=9)
    cfg = SimConfig(n=2048, collision_broad_phase="bucket",
                    collision_grid_res=64, integrator="leapfrog_kdk",
                    enable_boundary=False, enable_velocity_clamp=False)
    mesh = make_mesh(8)
    sh = shard_state(st, mesh)
    sh = prime_accelerations_sharded(sh, cfg, mesh)
    p0 = np.asarray(jnp.sum(sh.mass[:, None] * sh.vel, axis=0))
    out = make_sharded_step(cfg, mesh)(sh)
    p1 = np.asarray(jnp.sum(out.mass[:, None] * out.vel, axis=0))
    # Gravity conserves momentum exactly in pair-symmetric form; the
    # collision deltas are antisymmetric by construction. Tolerance covers
    # f32 accumulation over 2048 bodies.
    scale = float(np.abs(np.asarray(sh.mass[:, None] * sh.vel)).sum())
    assert np.abs(p1 - p0).max() < 1e-5 * scale


# ---------------------------------------------------------------------
# Per-device compiled-FLOP scaling (strong-scaling evidence)
# ---------------------------------------------------------------------

def _compiled_flops(fn, *args) -> float:
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def test_banded_bucket_per_device_flops_drop_with_mesh_size(eight_devices):
    """XLA's compiled cost analysis: the banded bucket pass's per-device
    FLOPs follow F_fixed + S/P. The fixed floor is the replicated O(N)
    prep + the static double-count of the compact/full and residual
    lax.conds (cost analysis sums both branches); S — the stencil, the
    window gathers, and the banded exact passes — divides by P."""
    n = 1 << 15
    st = _overlapping(n, seed=21)
    cfg = SimConfig(n=n, collision_broad_phase="bucket",
                    collision_grid_res=128)

    def single(p, v, m, r):
        out = _bucket_pass(
            ParticleState.create(pos=p, vel=v, mass=m, radius=r), cfg)
        return out.pos, out.vel

    flops_1 = _compiled_flops(single, st.pos, st.vel, st.mass, st.radius)

    def banded_flops(n_dev):
        mesh = make_mesh(n_dev)

        def f(p, v, m, r):
            return sharded_collision_deltas(p, v, m, r, cfg, "shards")

        fn = jax.shard_map(f, mesh=mesh, in_specs=(P("shards"),) * 4,
                           out_specs=(P("shards"), P("shards")),
                           check_vma=False)
        return _compiled_flops(fn, st.pos, st.vel, st.mass, st.radius)

    f2, f4, f8 = banded_flops(2), banded_flops(4), banded_flops(8)
    assert f8 < f4 < f2, (flops_1, f2, f4, f8)
    # F_fixed + S/P: solve from P=2 and P=8, check P=4.
    s = (f2 - f8) / (1 / 2 - 1 / 8)
    fixed = f2 - s / 2
    assert abs(fixed + s / 4 - f4) < 0.1 * f4, (fixed, s, f4)
    # The scaling component must cover at least the full stencil — the
    # asymptotically dominant stage — at a conservative >= 8 flops per
    # pair slot (2 subs x 2D + dot + radius/mass terms). NOTE: comparing
    # s against flops_1 (as the banded-tree test does) is NOT sound here:
    # the residual/big-body passes run through pairwise_blocked, whose
    # lax.scan/lax.map bodies XLA's cost analysis counts ONCE regardless
    # of trip count — those passes truly divide by P (their target counts
    # are n/P and m_cap/P) but are counted as a P-independent constant,
    # deflating s and inflating `fixed` (measured r4: dropping
    # _OVERFLOW_CAP 16384 -> 1024 moved 0.7 GF from fixed into s with the
    # same code).
    res, cap = cfg.collision_grid_res, cfg.collision_max_neighbors
    stencil_floor = res * res * cap * cap * 9 * 8
    assert s > stencil_floor, (s, stencil_floor)
