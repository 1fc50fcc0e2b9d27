"""Block-window collision narrow phase — Pallas kernel.

TPU hot path of the lex-sorted block broad phase
(physics/collisions._block_pass). After the cell-lex sort, every neighbor
offset's candidate sources for a block of targets form one contiguous
window of the sorted array. The XLA dense stage materializes [T, W] pair
temps through HBM (~6-18 s/pass at N=4M, r4); this kernel runs the same
masked pair math tile-resident.

Layout (hard-won; every naive shape OOMs 16 GB HBM on TPU tiling):
  * target fields ride as [nb, 8, 128] — one block of T=1024 targets per
    sublane-exact (8, 128) tile, ZERO padding (a [n, 1] column array pads
    128x = 2 GB per field at N=4M; a [tiles, 1, 256] form pads 8x);
  * window fields ride as [nb, n_off*W/128, 128] — block (1, rows, 128)
    equals the array's trailing dims, zero padding;
  * grid = (nb,): one program per block, so every per-block window is a
    statically-mapped tile (a [nb, n_off] scalar-prefetch table overflowed
    the 1 MB SMEM at N=4M, and per-field [n,1] inputs OOMed HBM);
  * inside, a static loop over (offset, W subtiles) keeps the [1024, 128]
    pair temps ~0.5 MB each, and a per-subtile `jnp.any(overlap)` skip
    elides the expensive TOI/impulse math where nothing overlaps.

Per pair the math is the reference narrow phase (Simulation.hpp:216-346),
the same ~45-op VPU pipeline as kernels/collide.py, with the block pass's
masks: lead-axis cell keys equal target key + offset (the lex window
bounds ARE the key range, so no span mask is needed), trailing-axis keys
within +-1, both members covered (`ok` planes), no self pairs (gathered
global row vs target row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Targets per program/block (the Pallas block pass forces
# collision_block_size to this) and window subtile width.
_T_PALLAS = 1024
_BS = 128


def _block_collide_kernel(
    *refs,
    dim: int,
    n_off: int,
    w_len: int,
    impulse: float,
    lead_offs: tuple,
):
    nf = 2 * dim + 3             # pos D, vel D, mass, radius, ok
    tf = refs[:nf]               # [1, 8, 128] f32 target fields
    tk = refs[nf:nf + dim]       # [1, 8, 128] int32 target keys
    trow_ref = refs[nf + dim]    # [1, 8, 128] int32 GLOBAL target rows
    sf = refs[nf + dim + 1:2 * nf + dim + 1]      # [1, R, 128] f32 windows
    sk = refs[2 * nf + dim + 1:2 * (nf + dim) + 1]  # [1, R, 128] int32
    srow_ref = refs[2 * (nf + dim) + 1]           # [1, R, 128] int32
    outs = refs[2 * (nf + dim) + 2:]          # 2*dim x [1, 8, 128] f32

    # Pair geometry (no transposes — Mosaic rejects tile shape casts):
    # targets stay in their natural [8, 128] sublane tile, broadcast to
    # [8, 128, 1]; a window subtile is one [1, 1, 128] lane row; every
    # pair block is a [8, 128, 128] 3D broadcast (the nearfield kernel's
    # proven [K, K, C] pattern) = all 1024 targets x 128 sources.
    def tcol(ref):               # [8, 128, 1]
        return ref[0][:, :, None]

    # Global sorted row of each target arrives as an input plane (NOT
    # program_id * T: the banded multi-chip pass hands each device a
    # block band whose global offset the grid index cannot see).
    trow = tcol(trow_ref)

    tks = [tcol(tk[a]) for a in range(dim)]
    tps = [tcol(tf[d]) for d in range(dim)]
    tvs = [tcol(tf[dim + d]) for d in range(dim)]
    tm = tcol(tf[2 * dim])
    tr = tcol(tf[2 * dim + 1])
    tok = tcol(tf[2 * dim + 2]) > 0.0

    # One fori iteration per window lane-row: a static unroll keeps all
    # ~60 (2D) / 180 (3D) iterations' [8, 128, 128] temps live at once —
    # 116 MB of scoped-VMEM stack, 7x the 16 MB budget (r4 compile OOM).
    rows_per_off = w_len // 128

    def body(idx, carry):
        o = idx // rows_per_off

        def wrow(ref):           # [1, 1, 128] lane row `idx`
            return ref[:, pl.ds(idx, 1), :]

        srow = wrow(srow_ref)
        sok = wrow(sf[2 * dim + 2]) > 0.0
        valid = tok & sok & (trow != srow)
        for a in range(dim - 1):
            off_a = jnp.int32(lead_offs[0][a])
            for idx_o in range(1, n_off):
                off_a = jnp.where(o == idx_o,
                                  jnp.int32(lead_offs[idx_o][a]), off_a)
            valid = valid & (wrow(sk[a]) == tks[a] + off_a)
        dtrail = wrow(sk[dim - 1]) - tks[dim - 1]
        valid = valid & (dtrail >= -1) & (dtrail <= 1)

        sm = wrow(sf[2 * dim])
        sr = wrow(sf[2 * dim + 1])
        ds = []
        d_sq = jnp.zeros((8, 128, 128), jnp.float32)
        for d in range(dim):
            dd = wrow(sf[d]) - tps[d]
            ds.append(dd)
            d_sq = d_sq + dd * dd
        r = tr + sr
        r_sq = r * r
        overlap = (d_sq <= r_sq) & (sm > 0.0) & valid

        vs = []
        d_dot_v = jnp.zeros((8, 128, 128), jnp.float32)
        v_sq = jnp.zeros((8, 128, 128), jnp.float32)
        for d in range(dim):
            vv = wrow(sf[dim + d]) - tvs[d]
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
        disc = jnp.maximum(
            d_dot_v * d_dot_v - v_sq * (d_sq - r_sq), 0.0)
        ti = (d_dot_v + jnp.sqrt(disc)) / safe_v_sq
        d_new_sq = jnp.zeros((8, 128, 128), jnp.float32)
        dnv = jnp.zeros((8, 128, 128), jnp.float32)
        dns = []
        for d in range(dim):
            dn = ds[d] - vs[d] * ti
            dns.append(dn)
            d_new_sq = d_new_sq + dn * dn
            dnv = dnv + dn * vs[d]
        safe_dn_sq = jnp.where(d_new_sq > 0.0, d_new_sq, 1.0)
        scale = (impulse * dnv / safe_dn_sq) * w1

        zero = jnp.zeros((8, 128, 128), jnp.float32)
        out_acc = []
        for d in range(dim):
            dvel_imp = dns[d] * scale
            dpos_d = jnp.where(
                separating, -ds[d] * coef_sep,
                jnp.where(approaching, dvel_imp * ti, zero))
            dvel_d = jnp.where(approaching, dvel_imp, zero)
            out_acc.append(carry[d] + jnp.sum(dpos_d, axis=2))
            out_acc.append(carry[dim + d] + jnp.sum(dvel_d, axis=2))
        # carry layout: (dp_0..dp_{D-1}, dv_0..dv_{D-1})
        return tuple(out_acc[::2]) + tuple(out_acc[1::2])

    zeros = tuple(jnp.zeros((8, 128), jnp.float32)
                  for _ in range(2 * dim))
    accs = lax.fori_loop(0, n_off * rows_per_off, body, zeros)

    for d in range(dim):
        outs[d][:] = accs[d][None]
        outs[dim + d][:] = accs[dim + d][None]


def block_collision_deltas(
    planes_t,        # tuple: D pos, D vel, mass, radius, ok — [n_loc] f32
    keys_t,          # tuple of D int32 [n_loc] sorted cell keys
    win_planes,      # tuple matching planes_t — [nb, n_off, W] f32
    win_keys,        # tuple of D int32 [nb, n_off, W]
    win_rows,        # [nb, n_off, W] int32 gathered global rows
    *,
    impulse: float,
    interpret: bool = False,
    tgt_rows=None,   # [n_loc] int32 global sorted rows of the targets
                     # (default arange: targets are the whole array; the
                     # banded pass passes its block band's true rows)
):
    """Dense-stage deltas of the block pass, sorted order: ([n,D], [n,D]).
    Requires collision_block_size == _T_PALLAS (the pass enforces it)."""
    n_tot = planes_t[0].shape[0]
    nb, n_off, w_len = win_rows.shape
    dim = len(keys_t)
    assert n_tot == nb * _T_PALLAS and w_len % _BS == 0
    f32 = jnp.float32

    if tgt_rows is None:
        tgt_rows = jnp.arange(n_tot, dtype=jnp.int32)
    t3 = [p.reshape(nb, 8, 128)
          for p in planes_t + keys_t + (tgt_rows,)]
    wrows = n_off * w_len // 128
    w3 = [p.reshape(nb, wrows, 128)
          for p in win_planes + win_keys + (win_rows,)]

    if dim == 2:
        lead_offs = tuple((dx,) for dx in (-1, 0, 1))
    else:
        lead_offs = tuple((dx, dy) for dx in (-1, 0, 1)
                          for dy in (-1, 0, 1))
    assert len(lead_offs) == n_off

    def bmap(i):
        return (i, 0, 0)

    tspec = [pl.BlockSpec((1, 8, 128), bmap, memory_space=pltpu.VMEM)
             for _ in t3]
    wspec = [pl.BlockSpec((1, wrows, 128), bmap, memory_space=pltpu.VMEM)
             for _ in w3]
    ospec = [pl.BlockSpec((1, 8, 128), bmap, memory_space=pltpu.VMEM)
             for _ in range(2 * dim)]

    kernel = functools.partial(
        _block_collide_kernel, dim=dim, n_off=n_off, w_len=w_len,
        impulse=float(impulse), lead_offs=lead_offs)

    pairs = nb * n_off * w_len * _T_PALLAS
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=tspec + wspec,
        out_specs=ospec,
        out_shape=[jax.ShapeDtypeStruct((nb, 8, 128), f32)
                   for _ in range(2 * dim)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(30 + 8 * dim) * pairs,
            bytes_accessed=4 * (n_tot * (3 * dim + 3)
                                + nb * n_off * w_len * (3 * dim + 4)),
            transcendentals=2 * pairs,
        ),
        interpret=interpret,
    )(*t3, *w3)
    # Assemble [n, D] via axis-0 stack + transpose: a lane-axis stack of
    # [n] operands materializes [n, 1] concat inputs at 128x tile padding
    # (the r4 OOM class; see barneshut3d's space-to-depth note).
    dpos = jnp.stack([o.reshape(n_tot) for o in outs[:dim]], axis=0).T
    dvel = jnp.stack([o.reshape(n_tot) for o in outs[dim:]], axis=0).T
    return dpos, dvel
