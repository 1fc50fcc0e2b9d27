"""Gravitational accelerations.

Physics: Plummer-softened Newtonian monopole, G = 1 —

    a_i = G * sum_j m_j * (x_j - x_i) * (|x_j - x_i|^2 + eps^2)^(-3/2)

matching the reference kick (Quadtree.hpp:124-127: `inv_dist = rsqrt(d_sq +
e_sq); acc += d * (mass * inv_dist^3)`), with the self/coincident term skipped
(the reference guards `if (d_sq > 0)`, Quadtree.hpp:124/139). The reference
evaluates this through a Barnes-Hut tree with theta=1 plus a Quake-III
approximate rsqrt under `-ffast-math`; we provide

  * `direct_accelerations`      — exact O(N^2) XLA evaluation. The correctness
    oracle, and surprisingly competitive on TPU because the pairwise kernel is
    pure fused VPU work.
  * `compute_accelerations`     — backend dispatcher: Pallas tiled kernel
    (kernels/allpairs.py), XLA direct, or the multilevel tree code
    (physics/barneshut.py), per `SimConfig.force_backend`.

The O(N^2) form is evaluated blockwise (lax.map over row tiles) so the N x N
pair matrix never materializes in HBM: at N=1M a full pair matrix would be 4TB,
while the blocked form streams source tiles through VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from nbodysim_tpu.config import SimConfig


def _pairwise_acc_block(
    tgt_pos: jax.Array,      # [T, D] target positions
    src_pos: jax.Array,      # [S, D] source positions
    src_mass: jax.Array,     # [S]    source masses
    eps_sq: float,
    g_const: float = 1.0,
) -> jax.Array:
    """Accelerations on a tile of targets from a tile of sources. [T, D].

    Coincident pairs (d == 0) contribute nothing, which also removes
    self-interaction without needing index bookkeeping — same rule as the
    reference (Quadtree.hpp:124 `if (d_sq > 0)`).
    """
    # d[t, s, :] = src[s] - tgt[t]
    d = src_pos[None, :, :] - tgt_pos[:, None, :]          # [T, S, D]
    d_sq = jnp.sum(d * d, axis=-1)                          # [T, S]
    inv_dist = lax.rsqrt(d_sq + eps_sq)                     # [T, S]
    w = src_mass[None, :] * (inv_dist * inv_dist * inv_dist)
    w = jnp.where(d_sq > 0.0, w, 0.0)
    return g_const * jnp.einsum("ts,tsd->td", w, d)


def direct_accelerations(
    pos: jax.Array,
    mass: jax.Array,
    eps_sq: float,
    g_const: float = 1.0,
    block_size: int = 2048,
    src_pos: Optional[jax.Array] = None,
    src_mass: Optional[jax.Array] = None,
) -> jax.Array:
    """Exact O(N^2) softened gravity, evaluated in row blocks.

    If `src_pos`/`src_mass` are given, computes accelerations on `pos` due to
    those sources only (used by the sharded ring reduction in parallel/);
    the positional `mass` is then unused and may be None.
    """
    if src_pos is None:
        src_pos, src_mass = pos, mass
    elif src_mass is None:
        raise ValueError("src_mass must accompany src_pos")
    n = pos.shape[0]
    n_src = src_pos.shape[0]
    if n <= block_size and n_src <= 2 * block_size:
        return _pairwise_acc_block(pos, src_pos, src_mass, eps_sq, g_const)

    # Blocked over BOTH axes (a [block, n_src] temp is 16 GB at n_src=1M).
    from nbodysim_tpu.core.blocking import pairwise_blocked

    def kernel(tgt, src):
        (tp,) = tgt
        sp, sm = src   # zero-padded sources are inert (mass 0)
        return (_pairwise_acc_block(tp, sp, sm, eps_sq, g_const),)

    (acc,) = pairwise_blocked(
        kernel, (pos,), (src_pos, src_mass),
        out_dims=((pos.shape[1],),), dtype=pos.dtype,
        bs_t=block_size, bs_s=2 * block_size)
    return acc


def potential_energy_large(
    pos: jax.Array,
    mass: jax.Array,
    eps_sq: float,
    g_const: float = 1.0,
    pairs_per_call: float = 4e12,
) -> float:
    """Host-chunked exact potential for very large N.

    A single device call computing all N^2/2 pair terms runs ~30 s per 4e12
    pairs on v5e; beyond that the device tunnel's execution watchdog kills
    the worker (observed at N=4M). This wrapper splits the target axis over
    multiple device calls. Returns a Python float (host sync per chunk).
    """
    n = pos.shape[0]
    n_chunks = max(1, int(-(-float(n) * n // pairs_per_call)))
    if n_chunks == 1:
        return float(potential_energy(pos, mass, eps_sq, g_const))
    chunk = -(-n // n_chunks)
    total = 0.0
    for i in range(0, n, chunk):
        tgt = pos[i : i + chunk]
        tgt_m = mass[i : i + chunk]
        total += float(
            _partial_potential(tgt, tgt_m, pos, mass, eps_sq)
        )
    return -0.5 * g_const * total


@functools.partial(jax.jit, static_argnames=("eps_sq",))
def _partial_potential(tgt, tgt_m, src, src_m, eps_sq):
    """sum_{i in tgt, j in src, d!=0} m_i m_j / sqrt(d^2 + eps^2)."""
    bs = min(2048, tgt.shape[0])
    nb = -(-tgt.shape[0] // bs)
    tp = jnp.pad(tgt, ((0, nb * bs - tgt.shape[0]), (0, 0)))
    tm = jnp.pad(tgt_m, (0, nb * bs - tgt.shape[0]))
    sb = min(4096, src.shape[0])
    nsb = -(-src.shape[0] // sb)
    sp = jnp.pad(src, ((0, nsb * sb - src.shape[0]), (0, 0))).reshape(
        nsb, sb, -1)
    sm = jnp.pad(src_m, (0, nsb * sb - src.shape[0])).reshape(nsb, sb)

    def one(args):
        tpb, tmb = args

        def one_src(acc, sargs):
            spb, smb = sargs
            d = spb[None, :, :] - tpb[:, None, :]
            d_sq = jnp.sum(d * d, axis=-1)
            inv = lax.rsqrt(d_sq + eps_sq)
            pair = tmb[:, None] * smb[None, :] * inv
            return acc + jnp.sum(jnp.where(d_sq > 0.0, pair, 0.0)), None

        out, _ = lax.scan(one_src, jnp.zeros((), tgt.dtype), (sp, sm))
        return out

    return jnp.sum(lax.map(
        one, (tp.reshape(nb, bs, -1), tm.reshape(nb, bs))))


def potential_energy(
    pos: jax.Array,
    mass: jax.Array,
    eps_sq: float,
    g_const: float = 1.0,
    block_size: int = 2048,
) -> jax.Array:
    """Total softened potential energy  U = -G/2 * sum_{i != j} m_i m_j / sqrt(d^2+eps^2).

    Consistent with the force law above (it is its exact negative gradient for
    fixed eps), so dE/dt -> 0 under a symplectic integrator. Blocked like
    direct_accelerations. For N > ~2M use `potential_energy_large` (host-
    chunked; a single device call that long trips the execution watchdog).
    """
    n = pos.shape[0]
    bs = min(block_size, n)
    n_blocks = -(-n // bs)
    n_pad = n_blocks * bs - n
    tgt = jnp.pad(pos, ((0, n_pad), (0, 0))).reshape(n_blocks, bs, -1)
    tgt_m = jnp.pad(mass, (0, n_pad)).reshape(n_blocks, bs)
    src = tgt      # sources chunked identically (a [bs, N] temp is 32 GB
    src_m = tgt_m  # at N=4M; double blocking keeps temps at [bs, bs])

    def one_block(args):
        tp, tm = args

        def one_src(acc, sargs):
            sp, sm = sargs
            d = sp[None, :, :] - tp[:, None, :]
            d_sq = jnp.sum(d * d, axis=-1)
            inv = lax.rsqrt(d_sq + eps_sq)
            pair = tm[:, None] * sm[None, :] * inv
            pair = jnp.where(d_sq > 0.0, pair, 0.0)
            return acc + jnp.sum(pair), None

        total, _ = lax.scan(one_src, jnp.zeros((), pos.dtype), (src, src_m))
        return total

    per_block = lax.map(one_block, (tgt, tgt_m))
    return -0.5 * g_const * jnp.sum(per_block)


# Measured exact-vs-tree crossover on one v5e chip (round 2, with the
# Pallas near-field kernel): the stencil FMM at default R=3 beats the
# exact Pallas kernel from ~90k particles (N=65k: 23 ms exact vs 36 ms
# FMM; N=131k: 80 ms exact vs 47 ms FMM). Below it the exact kernel wins
# and is, well, exact.
BH_AUTO_THRESHOLD = 100_000
# 3D octree crossover, measured on one v5e chip (uniform cloud, octree
# defaults R=2/auto levels, Pallas near field): N=65k exact 21 ms vs
# octree ~50 ms; N=131k exact 108 ms vs octree 74 ms; N=1M exact 5.92 s
# vs octree 364 ms (16x).
BH3_AUTO_THRESHOLD = 100_000


def resolve_backend(config: SimConfig, n: int, dim: int) -> str:
    """Resolve 'auto' to a concrete backend: the tree code for large
    systems (past the measured crossover: quadtree FMM in 2D, octree in
    3D), the exact all-pairs kernels below it (Pallas on TPU, blocked XLA
    elsewhere)."""
    backend = config.force_backend
    if backend != "auto":
        return backend
    if n >= (BH_AUTO_THRESHOLD if dim == 2 else BH3_AUTO_THRESHOLD):
        return "bh"
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def resolve_backend_for_state(pos, mass, config: SimConfig) -> str:
    """State-aware 'auto' backend resolution (string form; see
    resolve_config_for_state for the full pinning api.Simulation uses)."""
    return resolve_config_for_state(pos, mass, config).force_backend


def resolve_config_for_state(pos, mass, config: SimConfig) -> SimConfig:
    """State-aware 'auto' resolution: like `resolve_backend`, but when the
    tree code would be chosen, probe the near-field bucket occupancy of
    the ACTUAL particle distribution (host-side, once). If the overflow
    exceeds the exact-residual capacity, the scene is too clustered for
    the fixed-depth buckets alone:

    2D and 3D alike: stay on the tree and turn ON the deep-overflow
    multipole chain + hot-zone tile refinement (bh_deep_levels=-1,
    bh_tile_levels=-1; tree-PM regime: exact buckets where they hold,
    PM-smoothed aggregates at the deep/tile-grid scale inside ultra-
    dense cores) — bounded physics at any clustering, O(N). Round 2
    fell back to the exact kernels in 3D because the HBM-capped 256^3
    deep grid alone was too coarse (smoothed-wrong lost to the 5.9
    s/eval exact kernel at N=1M); the r3 tile refinement continues the
    chain 2^k finer inside the hottest tiles, measured on clustered-blob
    scenes at median rel err 9.9e-2 -> 1.5e-2 and p99 8.5 -> 0.098 vs
    exact — accuracy the θ=1 reference never had, at tree speed.

    An explicit force_backend='bh' still honors the user's choice (with
    the capacity warning from api.check_capacity)."""
    import warnings

    n, dim = pos.shape[0], pos.shape[1]
    backend = resolve_backend(config, n, dim)
    if backend != "bh" or config.force_backend != "auto":
        return config.replace(force_backend=backend)
    if dim == 3:
        from nbodysim_tpu.physics.barneshut3d import bh3_near_overflow
        over = bh3_near_overflow(pos, mass, config)
    else:
        from nbodysim_tpu.physics.barneshut import bh_near_overflow
        over = bh_near_overflow(pos, mass, config)
    from nbodysim_tpu.physics.barneshut import _OVERFLOW_CAP

    if over > _OVERFLOW_CAP and config.bh_deep_levels == 0:
        warnings.warn(
            f"auto force backend: near-field overflow {over} exceeds "
            f"the exact-residual capacity {_OVERFLOW_CAP}; enabling "
            f"the deep-overflow multipole chain + tile refinement "
            f"(tree-PM regime — forces inside ultra-dense cells are "
            f"smoothed at the deep/tile-grid scale). Set force_backend "
            f"explicitly to override.", RuntimeWarning)
        # bh_tile_levels defaults to -1 (auto: on whenever deep is on);
        # an explicit user 0 keeps tiles off.
        config = config.replace(force_backend="bh", bh_deep_levels=-1)
        return _resolve_nf_sparse(pos, mass, config)
    return _resolve_nf_sparse(pos, mass,
                              config.replace(force_backend="bh"))


def _resolve_nf_sparse(pos, mass, config: SimConfig) -> SimConfig:
    """Pin bh_nf_sparse = -1 (auto) to 0/1 from the actual distribution:
    ON when the deep chain is active and the bucket-tier target count
    fits half the sparse pass's static capacity (3D only — the dense
    2D bucket stencil is cheap enough and 2D scenes keep far more
    bucket-tier targets; r5 probe: 14% of N=4M vs 0.4% at clustered 3D
    N=1M). Beyond-capacity growth mid-run degrades gracefully (targets
    promote to the deep path), so the half-capacity margin only guards
    accuracy, not correctness."""
    if config.bh_nf_sparse != -1 or pos.shape[1] != 3:
        return (config if config.bh_nf_sparse != -1
                else config.replace(bh_nf_sparse=0))
    from nbodysim_tpu.physics.barneshut3d import (
        _NF_SPARSE_CAP, _resolve_deep_levels3, _resolve_levels3,
        bh3_bucket_tier_count)

    deep = _resolve_deep_levels3(
        config, _resolve_levels3(config, pos.shape[0]))
    if not deep:
        return config.replace(bh_nf_sparse=0)
    count = bh3_bucket_tier_count(pos, mass, config)
    return config.replace(
        bh_nf_sparse=1 if count <= _NF_SPARSE_CAP // 2 else 0)


def compute_accelerations(
    pos: jax.Array,
    mass: jax.Array,
    config: SimConfig,
) -> jax.Array:
    """Dispatch to the configured force backend."""
    backend = resolve_backend(config, pos.shape[0], pos.shape[1])
    if backend == "pallas":
        from nbodysim_tpu.kernels.allpairs import allpairs_accelerations

        return allpairs_accelerations(
            pos, mass,
            eps_sq=config.eps_sq,
            g_const=config.g_const,
            block_targets=config.force_block_targets,
            block_sources=config.force_block_sources,
            interpret=config.pallas_interpret,
        )
    if backend == "bh":
        from nbodysim_tpu.physics.barneshut import bh_accelerations

        return bh_accelerations(pos, mass, config)
    return direct_accelerations(
        pos, mass, eps_sq=config.eps_sq, g_const=config.g_const
    )
