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
    those sources only (used by the sharded ring reduction in parallel/).
    """
    if src_pos is None:
        src_pos, src_mass = pos, mass
    n = pos.shape[0]
    if n <= block_size:
        return _pairwise_acc_block(pos, src_pos, src_mass, eps_sq, g_const)

    # Pad targets to a multiple of the block size, then map over row tiles.
    n_blocks = -(-n // block_size)
    n_pad = n_blocks * block_size - n
    tgt = jnp.pad(pos, ((0, n_pad), (0, 0)))
    tgt = tgt.reshape(n_blocks, block_size, -1)

    def one_block(tgt_block):
        return _pairwise_acc_block(tgt_block, src_pos, src_mass, eps_sq, g_const)

    acc = lax.map(one_block, tgt)                    # [n_blocks, B, D]
    return acc.reshape(n_blocks * block_size, -1)[:n]


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
    direct_accelerations.
    """
    n = pos.shape[0]
    bs = min(block_size, n)
    n_blocks = -(-n // bs)
    n_pad = n_blocks * bs - n
    tgt = jnp.pad(pos, ((0, n_pad), (0, 0))).reshape(n_blocks, bs, -1)
    tgt_m = jnp.pad(mass, (0, n_pad)).reshape(n_blocks, bs)

    def one_block(args):
        tp, tm = args
        d = pos[None, :, :] - tp[:, None, :]
        d_sq = jnp.sum(d * d, axis=-1)
        inv = lax.rsqrt(d_sq + eps_sq)
        pair = tm[:, None] * mass[None, :] * inv
        pair = jnp.where(d_sq > 0.0, pair, 0.0)
        return jnp.sum(pair)

    per_block = lax.map(one_block, (tgt, tgt_m))
    return -0.5 * g_const * jnp.sum(per_block)


def compute_accelerations(
    pos: jax.Array,
    mass: jax.Array,
    config: SimConfig,
) -> jax.Array:
    """Dispatch to the configured force backend."""
    backend = config.force_backend
    if backend == "auto":
        # Pallas on TPU; XLA elsewhere (CPU tests, interpret-unfriendly sizes).
        on_tpu = jax.default_backend() == "tpu"
        backend = "pallas" if on_tpu else "xla"
    if backend == "pallas":
        from nbodysim_tpu.kernels.allpairs import allpairs_accelerations

        return allpairs_accelerations(
            pos, mass,
            eps_sq=config.eps_sq,
            g_const=config.g_const,
            block_targets=config.force_block_targets,
            block_sources=config.force_block_sources,
        )
    if backend == "bh":
        from nbodysim_tpu.physics.barneshut import bh_accelerations

        return bh_accelerations(pos, mass, config)
    return direct_accelerations(
        pos, mass, eps_sq=config.eps_sq, g_const=config.g_const
    )
