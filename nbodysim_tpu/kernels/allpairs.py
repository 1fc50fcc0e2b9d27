"""Tiled all-pairs gravity — the hot Pallas kernel.

This is the TPU-native replacement for the reference's force path
(Barnes-Hut traversal + Quake-III rsqrt, Quadtree.hpp:113-155, fanned out
over std::async threads, Simulation.hpp:176-214). Instead of a pointer-
chasing tree walk — hostile to a vector machine — we evaluate the exact
O(N^2) softened interaction with a blocked kernel shaped like blockwise
attention:

  grid = (target_tiles, source_tiles); each program holds a [BT, D] target
  tile and a [D, BS] source tile in VMEM and accumulates into the [BT, D]
  output tile, revisited across the source-tile dimension (the standard
  Pallas accumulation pattern; Mosaic double-buffers the streaming source
  DMA behind compute).

Per tile pair, the math is a pure-VPU pipeline in full f32:

  diff_d = src_d[1, BS] - tgt_d[BT, 1]        (broadcast subtract, exact
                                               near-field — no |x|^2-2xy
                                               norm expansion, which would
                                               lose ~|x|^2*eps_f32 absolute
                                               precision at far-from-origin
                                               coordinates)
  d_sq   = sum_d diff_d^2                      (VPU fma chain)
  w      = m_src * rsqrt(d_sq + eps^2)^3       (VPU; the reference's
                                               fast_inv_sqrt licensed by
                                               -ffast-math becomes the
                                               hardware rsqrt; with eps > 0
                                               no self-mask is needed since
                                               diff = 0 zeroes the term)
  acc_d += rowsum(w * diff_d)                  (VPU multiply-reduce; an MXU
                                               dot_general here would run at
                                               bf16 input precision — ~0.4%
                                               coordinate quantization — so
                                               the reduce stays on the VPU)

~14 VPU ops/pair (2D). Measured 1.99e11 pairs/s on one v5e chip at N=64k
(bt=256, bs=2048) — 2x the 1e11 north-star target, VPU-bound as expected.
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


def _allpairs_kernel(
    tgt_ref,      # [BT, D]  target positions (VMEM)
    srcT_ref,     # [D, BS]  source positions, coordinate-major (VMEM)
    mass_ref,     # [1, BS]  source masses (VMEM)
    out_ref,      # [BT, D]  accelerations (VMEM, revisited over j)
    *,
    dim: int,
    eps_sq: float,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    tgt = tgt_ref[:]                      # [BT, D]
    src = srcT_ref[:]                     # [D, BS]
    m = mass_ref[:]                       # [1, BS]

    diffs = []
    # eps^2 seeds the accumulator instead of being added after the fma
    # chain — one VPU op/pair fewer on a ~14 op/pair kernel (the kernel
    # is VPU-op-rate-bound; see the roofline note in STATUS.md).
    d_sq = jnp.full((tgt.shape[0], src.shape[1]), eps_sq, jnp.float32)
    for d in range(dim):
        diff = src[d : d + 1, :] - tgt[:, d : d + 1]     # [BT, BS]
        diffs.append(diff)
        d_sq = d_sq + diff * diff

    inv = lax.rsqrt(d_sq)
    w = m * (inv * inv * inv)                            # [BT, BS]
    if eps_sq == 0.0:
        # Only needed unsoftened: rsqrt(0) = inf would make w*diff NaN.
        # With eps > 0, w is finite and diff = 0 already zeroes the
        # self/coincident contribution, so the mask is skipped.
        w = jnp.where(d_sq > 0.0, w, 0.0)

    # acc[t, d] = sum_s w[t, s] * diff_d[t, s] — reduced on the VPU in f32.
    # (An MXU dot_general W @ src here runs the MXU at its default bf16
    # input precision, which quantizes coordinates to ~0.4% — unacceptable
    # for far-field forces — and the f32-emulation mode costs 6 passes;
    # the VPU multiply-reduce keeps full f32 for 2 ops/pair/dim.)
    acc = jnp.concatenate(
        [jnp.sum(w * diff, axis=1, keepdims=True) for diff in diffs], axis=1
    )                                                    # [BT, D]
    # g_const is pre-folded into the source masses by the caller.
    out_ref[:] += acc


def _allpairs_wide_kernel(
    tgtT_ref,     # [D, BT]  target positions, coordinate-major (VMEM)
    src_ref,      # [BS, D]  source positions (VMEM)
    mass_ref,     # [BS, 1]  source masses, G pre-folded (VMEM)
    outT_ref,     # [D, BT]  accelerations, coordinate-major (revisited)
    *,
    dim: int,
    eps_sq: float,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        outT_ref[:] = jnp.zeros_like(outT_ref)

    tgtT = tgtT_ref[:]                    # [D, BT]
    src = src_ref[:]                      # [BS, D]
    m = mass_ref[:]                       # [BS, 1]

    # Pair matrix is [BS, BT]: sources on sublanes, targets on lanes, so
    # src[:, d:d+1] ([BS, 1]) and tgtT[d:d+1, :] ([1, BT]) broadcast in
    # their natural orientations — no VREG transposes anywhere.
    diffs = []
    d_sq = jnp.full((src.shape[0], tgtT.shape[1]), eps_sq, jnp.float32)
    for d in range(dim):
        diff = src[:, d : d + 1] - tgtT[d : d + 1, :]    # [BS, BT]
        diffs.append(diff)
        d_sq = d_sq + diff * diff

    inv = lax.rsqrt(d_sq)
    w = m * (inv * inv * inv)                            # [BS, BT]
    if eps_sq == 0.0:
        # Only needed unsoftened: rsqrt(0) = inf would make w*diff NaN.
        w = jnp.where(d_sq > 0.0, w, 0.0)

    accT = jnp.concatenate(
        [jnp.sum(w * diff, axis=0, keepdims=True) for diff in diffs],
        axis=0,
    )                                                    # [D, BT]
    outT_ref[:] += accT


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps_sq", "g_const", "block_targets", "block_sources", "interpret"
    ),
)
def allpairs_accelerations_wide(
    pos: jax.Array,            # [N, D]  target positions (the BIG side)
    src_pos: jax.Array,        # [S, D]  source positions (small)
    src_mass: jax.Array,       # [S]
    *,
    eps_sq: float,
    g_const: float = 1.0,
    block_targets: int = 2048,
    block_sources: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Rectangular all-pairs for MANY targets x FEW sources (the tree
    code's bulk<-outlier coupling), with coordinate-major Pallas IO.

    Feeding the standard kernel a [N, D] target operand constrains that
    operand to the dense {1,0} layout; on TPU a [4M, 2] f32 array in
    {1,0:T(8,128)} tile-pads 2 -> 128 lanes (a 2 GB copy, 64x expansion),
    and the constraint propagated {1,0} layouts onto every [N, 1]/[N, 2]
    temp of the surrounding tree graph — 13 such 2 GB remat copies OOMed
    the 16 GB chip at config 5 (27 GB program, 4.5% utilization; r5).
    Here targets and output cross the Pallas boundary as [D, N], which is
    bit-identical to the {0,1} layout XLA naturally assigns [N, D]
    arrays, so the boundary transposes are free bitcasts and no layout
    constraint escapes into the caller's graph.
    """
    n, dim = pos.shape
    n_src = src_pos.shape[0]
    pos = pos.astype(jnp.float32)
    src_pos = src_pos.astype(jnp.float32)
    src_mass = src_mass.astype(jnp.float32)

    bt = min(block_targets, max(128, 1 << (n - 1).bit_length()))
    bs = min(block_sources, max(8, 1 << (n_src - 1).bit_length()))

    n_t = _cdiv(n, bt) * bt
    n_s = _cdiv(n_src, bs) * bs
    tgtT = jnp.pad(pos, ((0, n_t - n), (0, 0))).T          # [D, n_t]
    src = jnp.pad(src_pos, ((0, n_s - n_src), (0, 0)))     # [n_s, D]
    m_col = (g_const * jnp.pad(src_mass, (0, n_s - n_src)))[:, None]

    grid = (n_t // bt, n_s // bs)

    kernel = functools.partial(
        _allpairs_wide_kernel, dim=dim, eps_sq=float(eps_sq)
    )

    flops_per_pair = 10 + 2 * (dim + 1)
    outT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((dim, bt), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, dim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dim, bt), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dim, n_t), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * n_t * n_s,
            bytes_accessed=(2 * n_t + n_s) * dim * 4 + n_s * 4,
            transcendentals=n_t * n_s,
        ),
        interpret=interpret,
    )(tgtT, src, m_col)

    return outT.T[:n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps_sq", "g_const", "block_targets", "block_sources", "interpret"
    ),
)
def allpairs_accelerations(
    pos: jax.Array,            # [N, D]  target positions
    mass: jax.Array,           # [N]     (source masses if src_pos is None)
    *,
    eps_sq: float,
    g_const: float = 1.0,
    block_targets: int = 256,
    block_sources: int = 2048,
    interpret: bool = False,
    src_pos: jax.Array | None = None,   # [S, D] separate sources (ring pass)
    src_mass: jax.Array | None = None,  # [S]
) -> jax.Array:
    """All-pairs softened accelerations via the Pallas kernel. [N, D].

    With `src_pos`/`src_mass`, computes accelerations on `pos` due to those
    sources only — the building block of the multi-chip ring reduction
    (parallel/sharded.py), where each device streams remote source shards;
    the positional `mass` is then unused and may be None.
    Inputs are padded to tile multiples; padded sources carry zero mass so
    they contribute nothing, and padded target rows are sliced off.
    """
    if src_pos is None:
        src_pos, src_mass = pos, mass
    elif src_mass is None:
        raise ValueError("src_mass must accompany src_pos")
    n, dim = pos.shape
    n_src = src_pos.shape[0]
    pos = pos.astype(jnp.float32)
    src_pos = src_pos.astype(jnp.float32)
    src_mass = src_mass.astype(jnp.float32)

    bt = min(block_targets, max(8, 1 << (n - 1).bit_length()))
    bs = min(block_sources, max(128, 1 << (n_src - 1).bit_length()))

    n_t = _cdiv(n, bt) * bt
    n_s = _cdiv(n_src, bs) * bs
    tgt = jnp.pad(pos, ((0, n_t - n), (0, 0)))
    srcT = jnp.pad(src_pos, ((0, n_s - n_src), (0, 0))).T  # [D, n_s]
    # G folds into the source masses (one [1, n_s] scale here) so the
    # kernel skips the per-block output scale.
    m_row = (g_const * jnp.pad(src_mass, (0, n_s - n_src)))[None, :]

    grid = (n_t // bt, n_s // bs)

    kernel = functools.partial(
        _allpairs_kernel, dim=dim, eps_sq=float(eps_sq)
    )

    flops_per_pair = 10 + 2 * (dim + 1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, bs), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, dim), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_t, dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * n_t * n_s,
            bytes_accessed=(n_t + 2 * n_s) * dim * 4 + n_s * 4,
            transcendentals=n_t * n_s,
        ),
        interpret=interpret,
    )(tgt, srcT, m_row)

    return out[:n]
