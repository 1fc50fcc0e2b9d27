"""Collision detection and response, TPU-idiomatic.

Reference semantics (Simulation.hpp:216-346): broad phase = spatial hash grid
(CELL_SIZE=600) + per-cell sweep-and-prune on x; narrow phase `resolve(i, j)`
for each overlapping pair (|d| < r_i + r_j, d = x_j - x_i, v = v_j - v_i,
w1 = m_j/(m_i+m_j), w2 = m_i/(m_i+m_j)):

  separating (d.v >= 0, d != 0):  positional de-penetration
      tmp = d * (r/|d| - 1);  pos_i -= tmp*w1;  pos_j += tmp*w2
  approaching (d.v < 0):          time-of-impact rewind + impulse
      t   = (d.v + sqrt(max(0, (d.v)^2 - v^2 (d^2 - r^2)))) / v^2
      d'  = d - v t                       (positions rewound by t)
      tmp = d' * (1.5 * (d'.v) / |d'|^2)  (impulse factor 1.5, hpp:338)
      v_i += tmp*w1; v_j -= tmp*w2; positions re-advanced with new velocities

The reference applies pairs *sequentially* (order-dependent; pairs spanning
two grid cells even get resolved twice). On TPU, sequential pair application
is a non-starter; we use **Jacobi resolution**: every particle gathers its
overlap candidates, computes its own side of each pair correction, and all
corrections are applied simultaneously. The per-pair math above is exactly
antisymmetric under i<->j exchange, so the Jacobi pass conserves momentum by
construction. `config.collision_iterations` > 1 re-runs the pass to converge
colliding chains (Gauss-Seidel-by-sweeps).

Net per-particle corrections (derived by folding the reference's rewind /
re-advance into deltas):
  separating:  dpos_i = -tmp * w1,        dvel_i = 0
  approaching: dvel_i = +tmp * w1,        dpos_i = tmp * w1 * t

Broad phases:
  * N <= dense_threshold: full O(N^2) masked pair test — pure VPU work, no
    data-dependent shapes, fastest at small/medium N on TPU.
  * large N: sorted spatial hash — quantize to cells of CELL_SIZE, hash cell
    coords (multiplicative hash like SpatialGrid::hash_position), sort
    particles by hash, and for each particle scan a fixed window of the
    sorted order around each of its 9 (2D) / 27 (3D) neighbor cells located
    by binary search. Fixed shapes throughout; hash collisions only add
    false candidates that the exact overlap test rejects.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState

DENSE_THRESHOLD = 8192


def _pair_deltas(
    d: jax.Array,        # [..., D]  x_j - x_i
    v: jax.Array,        # [..., D]  v_j - v_i
    w1: jax.Array,       # [...]     m_j / (m_i + m_j)
    r: jax.Array,        # [...]     r_i + r_j
    valid: jax.Array,    # [...]     candidate mask (excl. self)
    impulse: float,
) -> Tuple[jax.Array, jax.Array]:
    """Per-candidate (dpos_i, dvel_i) for particle i; masked, NaN-safe."""
    d_sq = jnp.sum(d * d, axis=-1)
    r_sq = r * r
    overlap = (d_sq <= r_sq) & valid

    d_dot_v = jnp.sum(d * v, axis=-1)
    v_sq = jnp.sum(v * v, axis=-1)

    separating = overlap & (d_dot_v >= 0.0) & (d_sq > 0.0)
    approaching = overlap & (d_dot_v < 0.0)

    # --- separating: positional de-penetration --------------------------
    safe_dist = jnp.sqrt(jnp.where(d_sq > 0.0, d_sq, 1.0))
    tmp_sep = d * (r / safe_dist - 1.0)[..., None]
    dpos_sep = -tmp_sep * w1[..., None]

    # --- approaching: TOI rewind + impulse ------------------------------
    safe_v_sq = jnp.where(v_sq > 0.0, v_sq, 1.0)
    disc = jnp.maximum(d_dot_v * d_dot_v - v_sq * (d_sq - r_sq), 0.0)
    t = (d_dot_v + jnp.sqrt(disc)) / safe_v_sq
    d_new = d - v * t[..., None]
    d_new_sq = jnp.sum(d_new * d_new, axis=-1)
    safe_d_new_sq = jnp.where(d_new_sq > 0.0, d_new_sq, 1.0)
    scale = impulse * jnp.sum(d_new * v, axis=-1) / safe_d_new_sq
    tmp_imp = d_new * scale[..., None]
    dvel_imp = tmp_imp * w1[..., None]
    dpos_imp = dvel_imp * t[..., None]

    dpos = jnp.where(
        separating[..., None], dpos_sep,
        jnp.where(approaching[..., None], dpos_imp, 0.0),
    )
    dvel = jnp.where(approaching[..., None], dvel_imp, 0.0)
    return dpos, dvel


def _dense_pass(state: ParticleState, config: SimConfig) -> ParticleState:
    """O(N^2) masked Jacobi collision pass (small/medium N)."""
    pos, vel, mass, radius = state.pos, state.vel, state.mass, state.radius
    n = pos.shape[0]

    d = pos[None, :, :] - pos[:, None, :]          # [i, j, D] = x_j - x_i
    v = vel[None, :, :] - vel[:, None, :]
    msum = mass[:, None] + mass[None, :]
    w1 = mass[None, :] / msum                       # m_j / (m_i + m_j)
    r = radius[:, None] + radius[None, :]
    not_self = ~jnp.eye(n, dtype=bool)

    dpos, dvel = _pair_deltas(d, v, w1, r, not_self, config.collision_impulse)
    return state.replace(
        pos=pos + jnp.sum(dpos, axis=1),
        vel=vel + jnp.sum(dvel, axis=1),
    )


# ---------------------------------------------------------------------------
# Sorted-spatial-hash broad phase for large N
# ---------------------------------------------------------------------------

def _cell_hash(cell: jax.Array, n_buckets: int) -> jax.Array:
    """Multiplicative hash of integer cell coords -> [0, n_buckets).

    Same family as the reference's SpatialGrid::hash_position
    (Simulation.hpp:31-34); n_buckets is a power of two.
    """
    primes = jnp.array([92837111, 689287499, 283923481], dtype=jnp.uint32)
    h = jnp.zeros(cell.shape[:-1], dtype=jnp.uint32)
    for axis in range(cell.shape[-1]):
        h = h ^ (cell[..., axis].astype(jnp.uint32) * primes[axis])
    h = h * jnp.uint32(15485863)
    return (h & jnp.uint32(n_buckets - 1)).astype(jnp.int32)


def _grid_pass(state: ParticleState, config: SimConfig) -> ParticleState:
    """Sorted spatial-hash Jacobi collision pass (large N).

    Fixed-shape pipeline: hash -> sort -> per-particle windowed scan of the
    9/27 neighbor-cell segments (located via searchsorted). Window size is
    `config.collision_max_neighbors` per neighbor cell; overflow beyond the
    window is dropped (a capacity cap, like the reference's 16-slot render
    grid cells, main.cpp:48).
    """
    pos, vel, mass, radius = state.pos, state.vel, state.mass, state.radius
    n, dim = pos.shape
    cell_size = config.collision_cell_size
    window = config.collision_max_neighbors
    n_buckets = 1 << max(1, (2 * n - 1).bit_length())   # >= 2N, power of two

    cell = jnp.floor(pos / cell_size).astype(jnp.int32)          # [N, D]
    h = _cell_hash(cell, n_buckets)                              # [N]

    order = jnp.argsort(h)
    h_sorted = h[order]
    pos_s, vel_s = pos[order], vel[order]
    mass_s, radius_s = mass[order], radius[order]
    cell_s = cell[order]

    # Neighbor cell offsets: 9 in 2D, 27 in 3D.
    if dim == 2:
        offs = jnp.array(
            [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], jnp.int32
        )
    else:
        offs = jnp.array(
            [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             for dz in (-1, 0, 1)], jnp.int32
        )
    n_off = offs.shape[0]

    nbr_cells = cell_s[:, None, :] + offs[None, :, :]            # [N, C, D]
    nbr_hash = _cell_hash(nbr_cells, n_buckets)                  # [N, C]
    starts = jnp.searchsorted(h_sorted, nbr_hash.reshape(-1)).reshape(n, n_off)

    # Candidate indices: a fixed window from each neighbor segment start.
    win = jnp.arange(window, dtype=jnp.int32)
    cand = starts[:, :, None] + win[None, None, :]               # [N, C, W]
    cand = cand.reshape(n, n_off * window)
    in_range = cand < n
    cand = jnp.minimum(cand, n - 1)

    # A candidate is valid if it actually lives in the probed cell's hash
    # segment (hash matches) and is not the particle itself.
    cand_hash = h_sorted[cand]                                   # [N, K]
    want_hash = jnp.repeat(nbr_hash, window, axis=1)             # [N, K]
    self_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = in_range & (cand_hash == want_hash) & (cand != self_idx)

    d = pos_s[cand] - pos_s[:, None, :]                          # [N, K, D]
    v = vel_s[cand] - vel_s[:, None, :]
    m_j = mass_s[cand]
    w1 = m_j / (mass_s[:, None] + m_j)
    r = radius_s[:, None] + radius_s[cand]

    dpos, dvel = _pair_deltas(d, v, w1, r, valid, config.collision_impulse)
    new_pos_s = pos_s + jnp.sum(dpos, axis=1)
    new_vel_s = vel_s + jnp.sum(dvel, axis=1)

    # Scatter back to original order.
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(n))
    return state.replace(pos=new_pos_s[inv], vel=new_vel_s[inv])


def resolve_collisions(state: ParticleState, config: SimConfig) -> ParticleState:
    """Full collision step: broad phase + Jacobi narrow phase, iterated."""
    if not config.enable_collisions:
        return state
    one_pass = _dense_pass if state.n <= DENSE_THRESHOLD else _grid_pass
    for _ in range(max(1, config.collision_iterations)):
        state = one_pass(state, config)
    return state
