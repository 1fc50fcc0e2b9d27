"""Tiled all-pairs collision narrow phase — Pallas kernel.

The reference resolves collisions by sequentially applying `resolve(i, j)`
to overlap candidates from a spatial hash (Simulation.hpp:216-346). Our
Jacobi formulation (physics/collisions.py) turns that into a data-parallel
all-pairs test below DENSE_THRESHOLD; this kernel is its TPU-native hot
path, shaped exactly like the gravity kernel (kernels/allpairs.py):

  grid = (target_tiles, source_tiles); each program holds [BT, D] target
  positions/velocities plus [BT, 1] mass/radius columns, streams [D, BS]
  source tiles through VMEM, and accumulates (dpos, dvel) into two [BT, D]
  output tiles revisited across the source dimension.

Per tile pair the math is the reference's narrow phase verbatim
(de-penetration for separating overlaps, TOI rewind + 1.5-impulse for
approaching ones — see physics/collisions._pair_deltas, which remains the
XLA oracle this kernel is gated against in tests/test_collisions.py), as a
pure-VPU f32 pipeline of ~45 ops/pair. Self pairs (d = v = 0) fall into
neither branch; padded sources carry mass 0 and fail the `valid` test.

Measured (one v5e chip): N=25k full reference step 23 -> 80+ steps/s once
this replaces the blocked-XLA dense pass (the step was collision-bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _collide_kernel(
    tpos_ref,     # [BT, D]  target positions
    tvel_ref,     # [BT, D]  target velocities
    tmass_ref,    # [BT, 1]
    trad_ref,     # [BT, 1]
    sposT_ref,    # [D, BS]  source positions, coordinate-major
    svelT_ref,    # [D, BS]
    smass_ref,    # [1, BS]
    srad_ref,     # [1, BS]
    dpos_ref,     # [BT, D]  (VMEM, revisited over j)
    dvel_ref,     # [BT, D]
    *,
    dim: int,
    impulse: float,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dpos_ref[:] = jnp.zeros_like(dpos_ref)
        dvel_ref[:] = jnp.zeros_like(dvel_ref)

    tp = tpos_ref[:]
    tr = trad_ref[:]
    sp = sposT_ref[:]                     # [D, BS]
    sm = smass_ref[:]                     # [1, BS]
    sr = srad_ref[:]

    ds = []
    bt, bs = tp.shape[0], sp.shape[1]
    d_sq = jnp.zeros((bt, bs), jnp.float32)
    for d in range(dim):
        dd = sp[d : d + 1, :] - tp[:, d : d + 1]          # [BT, BS]
        ds.append(dd)
        d_sq = d_sq + dd * dd

    r = tr + sr                                            # [BT, BS]
    r_sq = r * r
    overlap = (d_sq <= r_sq) & (sm > 0.0)

    # Overlaps are rare (~1e-3 of pairs) and, with the cell-sorted particle
    # order the wrapper applies, concentrated in near-diagonal tiles — so
    # the expensive branch math (TOI rewind, impulse: ~3x the ops of the
    # overlap test above) runs only for tiles that contain at least one
    # overlapping pair. Skipped tiles contribute exact zeros.
    @pl.when(jnp.any(overlap))
    def _resolve():
        tv = tvel_ref[:]
        tm = tmass_ref[:]                 # [BT, 1]
        sv = svelT_ref[:]

        vs = []
        d_dot_v = jnp.zeros((bt, bs), jnp.float32)
        v_sq = jnp.zeros((bt, bs), jnp.float32)
        for d in range(dim):
            vv = sv[d : d + 1, :] - tv[:, d : d + 1]
            vs.append(vv)
            d_dot_v = d_dot_v + ds[d] * vv
            v_sq = v_sq + vv * vv

        msum = tm + sm
        w1 = sm / jnp.where(msum > 0.0, msum, 1.0)

        separating = overlap & (d_dot_v >= 0.0) & (d_sq > 0.0)
        approaching = overlap & (d_dot_v < 0.0)

        # Separating: positional de-penetration  tmp = d * (r/|d| - 1);
        # r/|d| as r*rsqrt (hardware rsqrt beats sqrt+divide).
        inv_dist = lax.rsqrt(jnp.where(d_sq > 0.0, d_sq, 1.0))
        coef_sep = (r * inv_dist - 1.0) * w1               # dpos_i = -d*coef

        # Approaching: TOI rewind + impulse (reference hpp:320-346).
        safe_v_sq = jnp.where(v_sq > 0.0, v_sq, 1.0)
        disc = jnp.maximum(d_dot_v * d_dot_v - v_sq * (d_sq - r_sq), 0.0)
        t = (d_dot_v + jnp.sqrt(disc)) / safe_v_sq
        d_new_sq = jnp.zeros((bt, bs), jnp.float32)
        dnv = jnp.zeros((bt, bs), jnp.float32)
        dns = []
        for d in range(dim):
            dn = ds[d] - vs[d] * t
            dns.append(dn)
            d_new_sq = d_new_sq + dn * dn
            dnv = dnv + dn * vs[d]
        safe_dn_sq = jnp.where(d_new_sq > 0.0, d_new_sq, 1.0)
        scale = (impulse * dnv / safe_dn_sq) * w1          # dvel_i = d_new*s

        zero = jnp.zeros((bt, bs), jnp.float32)
        dpos_cols, dvel_cols = [], []
        for d in range(dim):
            dvel_imp = dns[d] * scale
            dpos_d = jnp.where(
                separating, -ds[d] * coef_sep,
                jnp.where(approaching, dvel_imp * t, zero))
            dvel_d = jnp.where(approaching, dvel_imp, zero)
            dpos_cols.append(jnp.sum(dpos_d, axis=1, keepdims=True))
            dvel_cols.append(jnp.sum(dvel_d, axis=1, keepdims=True))

        dpos_ref[:] += jnp.concatenate(dpos_cols, axis=1)
        dvel_ref[:] += jnp.concatenate(dvel_cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("impulse", "block_targets", "block_sources",
                     "interpret"),
)
def allpairs_collision_deltas(
    pos: jax.Array,            # [N, D]
    vel: jax.Array,            # [N, D]
    mass: jax.Array,           # [N]
    radius: jax.Array,         # [N]
    *,
    impulse: float,
    block_targets: int = 256,   # measured v5e sweep: 6.9 ms at N=25k
    block_sources: int = 1024,  # (9e10 pairs/s); 512x1024 tiles OOM the
    interpret: bool = False,    # compile helper, 2048-wide ones too
):
    """Jacobi collision deltas (dpos, dvel) on all targets, [N, D] each."""
    n, dim = pos.shape
    f32 = jnp.float32
    pos = pos.astype(f32)
    vel = vel.astype(f32)
    mass = mass.astype(f32)
    radius = radius.astype(f32)

    # Spatially sort (coarse row-major cells) so overlapping pairs land in
    # near-diagonal tiles and the kernel's per-tile branch skip fires for
    # almost every tile. Pure reordering: per-particle results are
    # identical up to f32 summation order.
    q = 256
    mn = jnp.min(pos, axis=0)
    span = jnp.maximum(jnp.max(pos, axis=0) - mn, 1e-9)
    cellk = jnp.clip((((pos - mn) / span) * q).astype(jnp.int32), 0, q - 1)
    key = cellk[:, 0]
    for d in range(1, dim):
        key = key * q + cellk[:, d]
    order = jnp.argsort(key)
    inv_order = jnp.zeros_like(order).at[order].set(jnp.arange(n))
    pos, vel = pos[order], vel[order]
    mass, radius = mass[order], radius[order]

    bt = min(block_targets, max(8, 1 << (n - 1).bit_length()))
    bs = min(block_sources, max(128, 1 << (n - 1).bit_length()))
    n_t = _cdiv(n, bt) * bt
    n_s = _cdiv(n, bs) * bs

    tpos = jnp.pad(pos, ((0, n_t - n), (0, 0)))
    tvel = jnp.pad(vel, ((0, n_t - n), (0, 0)))
    tmass = jnp.pad(mass, (0, n_t - n))[:, None]
    trad = jnp.pad(radius, (0, n_t - n))[:, None]
    sposT = jnp.pad(pos, ((0, n_s - n), (0, 0))).T
    svelT = jnp.pad(vel, ((0, n_s - n), (0, 0))).T
    smass = jnp.pad(mass, (0, n_s - n))[None, :]
    # Padded sources: mass 0 fails `valid`; keep radius at 0 too.
    srad = jnp.pad(radius, (0, n_s - n))[None, :]

    grid = (n_t // bt, n_s // bs)
    kernel = functools.partial(_collide_kernel, dim=dim,
                               impulse=float(impulse))

    flops_per_pair = 30 + 8 * dim
    dpos, dvel = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, bs), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, bs), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_t, dim), f32),
            jax.ShapeDtypeStruct((n_t, dim), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * n_t * n_s,
            bytes_accessed=(n_t + 2 * n_s) * (2 * dim + 2) * 4,
            transcendentals=2 * n_t * n_s,
        ),
        interpret=interpret,
    )(tpos, tvel, tmass, trad, sposT, svelT, smass, srad)

    return dpos[:n][inv_order], dvel[:n][inv_order]
