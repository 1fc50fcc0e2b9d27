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


# ---------------------------------------------------------------------------
# Rectangular pair-correction kernel (the broad phases' exact residual)
# ---------------------------------------------------------------------------

def _rect_kernel(
    tgt_ref,      # [BT, 16]  packed targets: pos D, vel D, m, r, cell D
    srcT_ref,     # [16, BS]  packed sources, field-major
    out_ref,      # [BT, 8]   packed (dpos D, dvel D) accum, revisited
    *,
    dim: int,
    impulse: float,
    max_cheb,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    tgt = tgt_ref[:]
    src = srcT_ref[:]
    bt, bs = tgt.shape[0], src.shape[1]

    tm = tgt[:, 2 * dim: 2 * dim + 1]
    sm = src[2 * dim: 2 * dim + 1, :]
    valid = (sm > 0.0) & (tm > 0.0)
    if max_cheb is not None:
        cheb = jnp.zeros((bt, bs), jnp.float32)
        for a in range(dim):
            ca = 2 * dim + 2 + a
            cheb = jnp.maximum(
                cheb, jnp.abs(src[ca: ca + 1, :] - tgt[:, ca: ca + 1]))
        valid = valid & (cheb <= max_cheb + 0.5)

    ds = []
    d_sq = jnp.zeros((bt, bs), jnp.float32)
    for d in range(dim):
        dd = src[d: d + 1, :] - tgt[:, d: d + 1]
        ds.append(dd)
        d_sq = d_sq + dd * dd
    tr = tgt[:, 2 * dim + 1: 2 * dim + 2]
    r = tr + src[2 * dim + 1: 2 * dim + 2, :]
    r_sq = r * r
    overlap = (d_sq <= r_sq) & valid

    # Overlaps are sparse; tiles with none skip the branch entirely.
    @pl.when(jnp.any(overlap))
    def _resolve():
        vs = []
        d_dot_v = jnp.zeros((bt, bs), jnp.float32)
        v_sq = jnp.zeros((bt, bs), jnp.float32)
        for d in range(dim):
            vv = src[dim + d: dim + d + 1, :] - tgt[:, dim + d: dim + d + 1]
            vs.append(vv)
            d_dot_v = d_dot_v + ds[d] * vv
            v_sq = v_sq + vv * vv

        msum = tm + sm
        ok_m = overlap & (msum > 0.0)
        w1 = sm / jnp.where(msum > 0.0, msum, 1.0)

        separating = ok_m & (d_dot_v >= 0.0) & (d_sq > 0.0)
        approaching = ok_m & (d_dot_v < 0.0)

        inv_dist = lax.rsqrt(jnp.where(d_sq > 0.0, d_sq, 1.0))
        coef_sep = (r * inv_dist - 1.0) * w1

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
        scale = (impulse * dnv / safe_dn_sq) * w1

        zero = jnp.zeros((bt, bs), jnp.float32)
        cols = []
        for d in range(dim):
            dvel_imp = dns[d] * scale
            dpos_d = jnp.where(
                separating, -ds[d] * coef_sep,
                jnp.where(approaching, dvel_imp * t, zero))
            dvel_d = jnp.where(approaching, dvel_imp, zero)
            cols.append(jnp.sum(dpos_d, axis=1, keepdims=True))
            cols.append(jnp.sum(dvel_d, axis=1, keepdims=True))
        pad = jnp.zeros((bt, 8 - 2 * dim), jnp.float32)
        out_ref[:] += jnp.concatenate(
            [c for c in cols[::2]] + [c for c in cols[1::2]] + [pad],
            axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("dim", "impulse", "max_cheb", "interpret"),
)
def rect_pair_deltas(
    tgt,             # (pos [n,D], vel, mass [n], radius [n], cell [n,D])
    src,             # same, [m]-sized
    *,
    dim: int,
    impulse: float,
    max_cheb=1,
    interpret: bool = False,
):
    """Pallas form of physics/collisions._cheb_pair_deltas_blocked: exact
    masked pair deltas of TARGETS against a (much smaller) source set —
    the broad phases' overflow residual is everyone(N) x cap(16k), which
    the blocked-XLA form walks at ~2e10 pair-slots/s (7.7 s at the
    N=4M flagship, r4) vs ~9e10 for this tile pipeline. IO rides packed
    in 16 lanes per particle ([N, 16] pads 8x under TPU tiling — the
    per-field [N, 1]/[N, D] operand forms pad 64-128x and OOM HBM at 4M).
    Returns (dpos, dvel), [n, D] each, target side only."""
    tp, tv, tm, tr, tc = tgt
    sp, sv, sm, sr, sc = src
    n = tp.shape[0]
    m = sp.shape[0]
    f32 = jnp.float32

    bt, bs = 256, 1024
    n_p = _cdiv(n, bt) * bt
    m_p = _cdiv(m, bs) * bs

    def pack(p, v, ms, rd, c, rows):
        cols = ([p[:, d] for d in range(dim)]
                + [v[:, d] for d in range(dim)]
                + [ms, rd]
                + [c[:, d].astype(f32) for d in range(dim)])
        cols += [jnp.zeros_like(ms)] * (16 - len(cols))
        out = jnp.stack([x.astype(f32) for x in cols], axis=0)  # [16, n]
        return jnp.pad(out, ((0, 0), (0, rows - out.shape[1])))

    tgt_packed = pack(tp, tv, tm, tr, tc, n_p).T          # [n_p, 16]
    src_packed = pack(sp, sv, sm, sr, sc, m_p)            # [16, m_p]

    kernel = functools.partial(
        _rect_kernel, dim=dim, impulse=float(impulse),
        max_cheb=None if max_cheb is None else float(max_cheb))

    out = pl.pallas_call(
        kernel,
        grid=(n_p // bt, m_p // bs),
        in_specs=[
            pl.BlockSpec((bt, 16), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, bs), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, 8), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, 8), f32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(30 + 8 * dim) * n_p * m_p,
            bytes_accessed=(n_p + m_p) * 16 * 4 + n_p * 8 * 4,
            transcendentals=2 * n_p * m_p,
        ),
        interpret=interpret,
    )(tgt_packed, src_packed)
    return out[:n, :dim], out[:n, dim:2 * dim]
