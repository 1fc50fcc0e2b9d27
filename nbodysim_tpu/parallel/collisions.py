"""Banded multi-chip collision broad phase.

Until round 3, the sharded step's collision pass was the dense masked
O(N^2-total) all-gather (`parallel/sharded.py:_gathered_collision_pass`) —
correct at any mesh but unusable at the flagship N=4M (1.6e13 pair tests per
step). This module gives the two large-N broad phases from
`physics/collisions.py` the same treatment `parallel/tree.py` gave the FMM
(VERDICT r3 item 2): shard the heavy stage across the mesh, keep the O(N)
prep replicated (the all_gather of the particle arrays is O(N) anyway),
accumulate per-device contributions into a full-length buffer, and `psum`
the disjoint pieces.

Reference capability anchor: the spatial-hash + sweep-and-prune collide()
(/root/reference/Nbodysim/headers/Simulation.hpp:216-346) runs every step at
any N; this is that capability at multi-chip scale.

Decomposition per broad phase:

* **bucket** (2D dense bucket grid): grid rows band across the mesh exactly
  like the FMM near field — each device scatters only the particles of its
  row band plus a 1-row halo into a [rb+2, res, cap] window grid (selected
  by the same compacted per-band window sort as `parallel/tree.py`, with an
  in-jit full-sort fallback when clustering overfills the capacity), runs
  the 9-offset shift stencil on its rb rows, and gathers deltas for its
  band's particles only. Slot assignment is bit-identical to the
  single-chip `_bucket_pass`: the stable argsort of the compacted set
  orders each (fully-included) cell by ascending original index, exactly
  like the stable global argsort.
* **hash** (sorted spatial hash, 3D / clustered 2D): the windowed 27/9-cell
  candidate scan — the dominant stage — runs on each device's index chunk
  of the (replicated) hash-sorted order; candidate validity masks come from
  the same global sorted arrays on every device, so pair symmetry is
  preserved verbatim.
* **big bodies**: the `everyone <- bigs` pass runs post-psum on the local
  shard (its targets are exactly the local particles); the `bigs <- smalls`
  pass partitions sources by shard and psums.
* **overflow residual** (lax.cond-gated, rare): global selection — the
  same `argsort(keep)[:_OVERFLOW_CAP]` the single chip uses, computed
  replicated so every device agrees which beyond-capacity pairs drop
  SYMMETRICALLY (a per-band selection could disagree between the two
  devices owning a pair's endpoints and inject momentum) — with the pair
  passes banded by sorted-target chunk / overflow-row chunk. The cond
  predicate (total overflow, an occupancy scatter-add) is replicated, so
  all devices take the same branch and no collective sits inside.

Exactness: every pair DIRECTION (target <- source) is computed on exactly
one device; `lax.psum` combines disjoint contributions, so the banded pass
matches the single-chip `_bucket_pass`/`_grid_pass` to roundoff
(tests/test_collisions_banded.py gates P in {2, 8} on uniform, clustered,
big-body, and overflow scenes).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.blocking import pairwise_blocked, sorted_first_occurrence
from nbodysim_tpu.parallel.tree import compact_capacity
from nbodysim_tpu.physics.collisions import (
    DENSE_THRESHOLD,
    _OVERFLOW_CAP,
    _WINDOW_CHUNK,
    _cell_hash,
    _cheb_pair_deltas_blocked,
    _pair_deltas,
)


def gathered_dense_deltas(
    pos_l, vel_l, mass_l, radius_l, config: SimConfig, axis_name: str
):
    """Jacobi collision deltas for local targets against all-gathered
    sources (dense masked test) — the small-N path: below DENSE_THRESHOLD
    the exact O(N^2/P-per-device) test beats building any grid (the same
    crossover as the single-chip `_dense_pass`)."""
    pos_g = lax.all_gather(pos_l, axis_name, tiled=True)       # [N, D]
    vel_g = lax.all_gather(vel_l, axis_name, tiled=True)
    mass_g = lax.all_gather(mass_l, axis_name, tiled=True)
    radius_g = lax.all_gather(radius_l, axis_name, tiled=True)

    dim = pos_l.shape[1]

    def kernel(tgt, src):
        tp, tv, tm, tr = tgt
        sp, sv, sm, sr = src
        d = sp[None, :, :] - tp[:, None, :]
        v = sv[None, :, :] - tv[:, None, :]
        msum = tm[:, None] + sm[None, :]
        w1 = sm[None, :] / jnp.where(msum > 0, msum, 1.0)
        r = tr[:, None] + sr[None, :]
        # Self-pairs (d = v = 0) are no-ops in the pair math; zero-padded
        # sources carry mass 0 and are inert.
        valid = sm[None, :] > 0
        dpos, dvel = _pair_deltas(
            d, v, w1, r, valid, config.collision_impulse)
        return jnp.sum(dpos, axis=1), jnp.sum(dvel, axis=1)

    return pairwise_blocked(
        kernel, (pos_l, vel_l, mass_l, radius_l),
        (pos_g, vel_g, mass_g, radius_g),
        out_dims=((dim,), (dim,)), dtype=pos_l.dtype)


def sharded_collision_deltas(
    pos_l, vel_l, mass_l, radius_l, config: SimConfig, axis_name: str
) -> Tuple[jax.Array, jax.Array]:
    """One Jacobi collision pass for the local shard: (dpos_l, dvel_l).

    Broad-phase dispatch mirrors `physics.collisions.resolve_collisions`
    so the sharded step resolves the same physics the single chip would
    (including an upstream `resolve_collision_phase_for_state` probe having
    switched bucket -> hash for clustered 2D scenes)."""
    p_dev = lax.axis_size(axis_name)
    n_l = pos_l.shape[0]
    n = n_l * p_dev
    dim = pos_l.shape[1]

    bp = config.collision_broad_phase
    if bp == "auto":
        if n <= DENSE_THRESHOLD:
            bp = "dense"
        else:
            bp = "bucket" if dim == 2 else "block"
    if bp == "bucket" and dim != 2:
        bp = "block"
    if bp == "dense":
        return gathered_dense_deltas(
            pos_l, vel_l, mass_l, radius_l, config, axis_name)

    pos = lax.all_gather(pos_l, axis_name, tiled=True)         # [N, D]
    vel = lax.all_gather(vel_l, axis_name, tiled=True)
    mass = lax.all_gather(mass_l, axis_name, tiled=True)
    radius = lax.all_gather(radius_l, axis_name, tiled=True)
    my = lax.axis_index(axis_name)

    res = config.collision_grid_res
    if bp == "bucket" and (p_dev == 1 or res % p_dev):
        # Grid rows must split evenly; otherwise compute the single-chip
        # pass replicated and slice — correct, not compute-scaled.
        return _replicated_fallback(
            pos, vel, mass, radius, config, "bucket", my, n_l)
    if bp in ("hash", "block") and p_dev == 1:
        return _replicated_fallback(
            pos, vel, mass, radius, config, bp, my, n_l)

    if bp == "bucket":
        return _banded_bucket_deltas(
            pos, vel, mass, radius, pos_l, vel_l, mass_l, radius_l,
            config, axis_name, my, n_l)
    if bp == "block":
        return _banded_block_deltas(
            pos, vel, mass, radius, config, axis_name, my, n_l)
    return _banded_hash_deltas(
        pos, vel, mass, radius, pos_l, vel_l, mass_l, radius_l,
        config, axis_name, my, n_l)


def _replicated_fallback(pos, vel, mass, radius, config, bp, my, n_l):
    """Run the single-chip pass on the gathered arrays (replicated on every
    device) and slice the local deltas."""
    from nbodysim_tpu.core.state import ParticleState
    from nbodysim_tpu.physics.collisions import (
        _block_pass, _bucket_pass, _grid_pass)

    st = ParticleState(pos=pos, vel=vel, acc=jnp.zeros_like(pos),
                       mass=mass, radius=radius,
                       frame=jnp.zeros((), jnp.int32))
    fn = {"bucket": _bucket_pass, "hash": _grid_pass,
          "block": _block_pass}[bp]
    out = fn(st, config)
    dpos = lax.dynamic_slice_in_dim(out.pos - pos, my * n_l, n_l)
    dvel = lax.dynamic_slice_in_dim(out.vel - vel, my * n_l, n_l)
    return dpos, dvel


# ---------------------------------------------------------------------------
# Banded lex-sorted block pass (the flagship-scale broad phase)
# ---------------------------------------------------------------------------

def _banded_block_deltas(pos, vel, mass, radius, config: SimConfig,
                         axis_name, my, n_l):
    """Band the lex-sorted block pass (physics/collisions._block_pass)
    across the mesh.

    Prep — big-body extraction, ONE multi-key sort, per-block lex windows
    (~30 ms of a 1.84 s pass at N=4M) — is replicated on the gathered
    arrays. The dense window stage, the dominant cost, runs on a disjoint
    band of ceil(nb/P) blocks per device; its window gathers read the
    full replicated sorted planes, so a band computes EXACTLY the pairs
    the single chip would for those targets. Per-device deltas scatter
    into a sorted-order [N, D] buffer whose bands are disjoint, `psum`
    combines them, and the capped exact corrections (bigs + overflow
    residual) run replicated post-psum — so the banded pass matches
    `_block_pass` to roundoff at any P (tests/test_collisions_banded.py).

    Reference capability anchor: Simulation.hpp:216-346 (collide() every
    step at any N), at multi-chip scale for the config-5 regime where the
    bucket grid overflows."""
    from nbodysim_tpu.core.state import ParticleState
    from nbodysim_tpu.physics import collisions as C

    n, dim = pos.shape
    p_dev = lax.axis_size(axis_name)
    s = C._block_structure(pos, radius, config)
    planes, key_cols, okf, ok_p = C._block_planes(
        pos, vel, mass, radius, s)

    nb, t_blk = s["nb"], s["t_blk"]
    nb_loc = -(-nb // p_dev)
    pad_blocks = nb_loc * p_dev - nb
    if pad_blocks:
        # Pad the per-block tables and sorted planes to whole bands.
        # Padding targets carry the strictly-last sentinel key and ok=0,
        # so the dense stage's masks produce no pairs for them (their
        # window tables point at row 0 with an empty span); padding rows
        # are never gathered as sources (real windows were computed
        # against the unpadded n_tot).
        s = dict(s)
        s["nb"] = nb + pad_blocks
        s["n_tot"] = s["nb"] * t_blk
        zpad = ((0, pad_blocks), (0, 0))
        s["start_row"] = jnp.pad(s["start_row"], zpad)
        s["w_lo"] = jnp.pad(s["w_lo"], zpad)
        s["w_hi"] = jnp.pad(s["w_hi"], zpad)
        rpad = (0, pad_blocks * t_blk)
        planes = [jnp.pad(p, rpad, constant_values=C._CELL_SENTINEL + 1)
                  if jnp.issubdtype(p.dtype, jnp.integer)
                  else jnp.pad(p, rpad) for p in planes]
        key_cols = [jnp.pad(k, rpad, constant_values=C._CELL_SENTINEL + 1)
                    for k in key_cols]
        okf = jnp.pad(okf, rpad)

    blk0 = (my * nb_loc).astype(jnp.int32)
    dp_loc, dv_loc = C._block_dense_deltas(
        planes, key_cols, okf, s, config, blk0=blk0, nb_loc=nb_loc)

    # Disjoint sorted-order assembly: rows >= n (sort padding / band
    # padding) drop; every real row is written by exactly one device.
    rows = blk0 * t_blk + jnp.arange(nb_loc * t_blk, dtype=jnp.int32)
    dp_sorted = lax.psum(
        jnp.zeros((n, dim), pos.dtype).at[rows].add(dp_loc, mode="drop"),
        axis_name)
    dv_sorted = lax.psum(
        jnp.zeros((n, dim), pos.dtype).at[rows].add(dv_loc, mode="drop"),
        axis_name)

    st = ParticleState(pos=pos, vel=vel, acc=jnp.zeros_like(pos),
                       mass=mass, radius=radius,
                       frame=jnp.zeros((), jnp.int32))
    out = C._block_corrections(st, s, dp_sorted, dv_sorted, ok_p, config)
    dpos = lax.dynamic_slice_in_dim(out.pos - pos, my * n_l, n_l)
    dvel = lax.dynamic_slice_in_dim(out.vel - vel, my * n_l, n_l)
    return dpos, dvel


# ---------------------------------------------------------------------------
# Banded bucket grid (2D)
# ---------------------------------------------------------------------------

def _banded_bucket_deltas(pos, vel, mass, radius, pos_l, vel_l, mass_l,
                          radius_l, config: SimConfig, axis_name, my, n_l):
    n = pos.shape[0]
    cap = config.collision_max_neighbors
    res = config.collision_grid_res
    p_dev = lax.axis_size(axis_name)
    rb = res // p_dev
    row0 = my * rb
    impulse = config.collision_impulse

    # ---- replicated grid geometry (identical to _bucket_pass) -----------
    mn = jnp.min(pos, axis=0)
    mx = jnp.max(pos, axis=0)
    span = jnp.maximum(jnp.max(mx - mn), 1e-3) * 1.0001
    corner = 0.5 * (mn + mx) - 0.5 * span

    k_big = min(64, n)
    top_r, top_i = lax.top_k(radius, min(k_big + 1, n))
    cell_size = jnp.maximum(span / res, 2.05 * top_r[min(k_big, n - 1)])
    big_sel = top_r[:k_big] > 0.5 * cell_size
    top_i = top_i[:k_big]
    is_big = jnp.zeros((n,), bool).at[top_i].set(big_sel)

    cell = jnp.clip(((pos - corner) / cell_size).astype(jnp.int32),
                    0, res - 1)                                    # [N, 2]
    flat = jnp.where(is_big, res * res, cell[:, 0] * res + cell[:, 1])

    # Replicated occupancy -> residual predicate, identical on every device
    # (equals the single chip's sum(~in_cap & ~big) without needing the
    # global sort on the common path).
    occ = jnp.zeros((res * res,), jnp.int32).at[flat].add(1, mode="drop")
    overflow = jnp.sum(jnp.maximum(occ - cap, 0))

    def window_stage(src, valid_s):
        """Band stencil over a sorted window set; returns full-length
        [N, 2] contributions holding this band's particle deltas."""
        ll = src.shape[0]
        srcc = jnp.minimum(src, n - 1)
        flat_s = jnp.where(valid_s, flat[srcc], res * res + n)
        first = sorted_first_occurrence(flat_s)
        slot = jnp.arange(ll, dtype=jnp.int32) - first.astype(jnp.int32)
        in_cap_s = slot < cap
        slot_w = jnp.where(in_cap_s, slot, cap)

        pos_s, vel_s = pos[srcc], vel[srcc]
        mass_s, radius_s = mass[srcc], radius[srcc]
        cell_s = cell[srcc]
        is_small = valid_s & (flat_s < res * res)
        wrow = cell_s[:, 0] - row0 + 1                   # halo row offset
        in_grid = is_small & (wrow >= 0) & (wrow < rb + 2)
        wflat = jnp.where(in_grid, wrow * res + cell_s[:, 1], (rb + 2) * res)

        def scat(v, fill=0.0):
            buf = jnp.full(((rb + 2) * res, cap), fill, pos.dtype)
            return buf.at[wflat, slot_w].set(v, mode="drop").reshape(
                rb + 2, res, cap)

        bpx, bpy = scat(pos_s[:, 0]), scat(pos_s[:, 1])
        bvx, bvy = scat(vel_s[:, 0]), scat(vel_s[:, 1])
        bm = scat(jnp.where(in_cap_s, mass_s, 0.0))
        br = scat(radius_s, fill=-1e9)   # empty slots can never overlap

        def cpad(a, fill=0.0):
            return jnp.pad(a, ((0, 0), (1, 1), (0, 0)),
                           constant_values=fill)

        bpx_p, bpy_p = cpad(bpx), cpad(bpy)
        bvx_p, bvy_p = cpad(bvx), cpad(bvy)
        bm_p, br_p = cpad(bm), cpad(br, fill=-1e9)
        tpx, tpy, tvx, tvy, tm, tr = (a[1:1 + rb]
                                      for a in (bpx, bpy, bvx, bvy, bm, br))

        offsets = jnp.array(
            [(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)], jnp.int32)
        chunk = max(1, min(rb, (1 << 24) // max(1, res * cap * cap)))
        while rb % chunk:
            chunk -= 1
        n_chunks = rb // chunk

        def body(carry, o):
            adx, ady, avx, avy = carry
            start = (1 + o[0], 1 + o[1], 0)
            spx = lax.dynamic_slice(bpx_p, start, (rb, res, cap))
            spy = lax.dynamic_slice(bpy_p, start, (rb, res, cap))
            svx = lax.dynamic_slice(bvx_p, start, (rb, res, cap))
            svy = lax.dynamic_slice(bvy_p, start, (rb, res, cap))
            sm = lax.dynamic_slice(bm_p, start, (rb, res, cap))
            sr = lax.dynamic_slice(br_p, start, (rb, res, cap))

            def chunk_fn(args):
                cpx_t, cpy_t, cvx_t, cvy_t, cm_t, cr_t, \
                    cpx, cpy, cvx, cvy, cm, cr = args
                d = jnp.stack(
                    [cpx[:, :, None, :] - cpx_t[:, :, :, None],
                     cpy[:, :, None, :] - cpy_t[:, :, :, None]], axis=-1)
                v = jnp.stack(
                    [cvx[:, :, None, :] - cvx_t[:, :, :, None],
                     cvy[:, :, None, :] - cvy_t[:, :, :, None]], axis=-1)
                msum = cm_t[:, :, :, None] + cm[:, :, None, :]
                w1 = cm[:, :, None, :] / jnp.where(msum > 0, msum, 1.0)
                r = cr_t[:, :, :, None] + cr[:, :, None, :]
                valid = (cm[:, :, None, :] > 0) & (cm_t[:, :, :, None] > 0)
                dpos, dvel = _pair_deltas(d, v, w1, r, valid, impulse)
                return (jnp.sum(dpos[..., 0], axis=-1),
                        jnp.sum(dpos[..., 1], axis=-1),
                        jnp.sum(dvel[..., 0], axis=-1),
                        jnp.sum(dvel[..., 1], axis=-1))

            def chop(a):
                return a.reshape(n_chunks, chunk, res, cap)

            dx, dy, dvx_, dvy_ = lax.map(
                chunk_fn,
                tuple(chop(a) for a in
                      (tpx, tpy, tvx, tvy, tm, tr,
                       spx, spy, svx, svy, sm, sr)))
            return (adx + dx.reshape(rb, res, cap),
                    ady + dy.reshape(rb, res, cap),
                    avx + dvx_.reshape(rb, res, cap),
                    avy + dvy_.reshape(rb, res, cap)), None

        zeros = jnp.zeros((rb, res, cap), pos.dtype)
        (adx, ady, avx, avy), _ = lax.scan(
            body, (zeros, zeros, zeros, zeros), offsets)

        slot_c = jnp.minimum(slot, cap - 1)
        brow_s = cell_s[:, 0] - row0
        g_mask = in_grid & (brow_s >= 0) & (brow_s < rb) & in_cap_s
        gidx = jnp.clip(brow_s, 0, rb - 1) * res + cell_s[:, 1]

        def gath(buf):
            return jnp.where(
                g_mask, buf.reshape(rb * res, cap)[gidx, slot_c], 0.0)

        dpos_w = jnp.stack([gath(adx), gath(ady)], axis=-1)
        dvel_w = jnp.stack([gath(avx), gath(avy)], axis=-1)
        sidx = jnp.where(valid_s, src, n)
        dp = (jnp.zeros((n, 2), pos.dtype)
              .at[sidx].add(dpos_w, mode="drop"))
        dv = (jnp.zeros((n, 2), pos.dtype)
              .at[sidx].add(dvel_w, mode="drop"))
        return dp, dv

    # ---- compacted per-band window (parallel/tree.py design) ------------
    brow_u = cell[:, 0] - row0
    in_win_u = ~is_big & (brow_u >= -1) & (brow_u < rb + 1)
    c_cap = compact_capacity(n, rb + 2, res)
    all_valid = jnp.ones((n,), bool)
    if c_cap >= n:
        dp, dv = window_stage(jnp.argsort(flat), all_valid)
    else:
        rank = jnp.cumsum(in_win_u) - 1
        n_win = jnp.sum(in_win_u)
        widx = (jnp.full((c_cap,), n, jnp.int32)
                .at[jnp.where(in_win_u & (rank < c_cap), rank, c_cap)]
                .set(jnp.arange(n, dtype=jnp.int32), mode="drop"))

        def compact_stage(_):
            keys = jnp.where(widx < n, flat[jnp.minimum(widx, n - 1)],
                             res * res + n)
            oc = jnp.argsort(keys)
            return window_stage(widx[oc], widx[oc] < n)

        def full_stage(_):
            return window_stage(jnp.argsort(flat), all_valid)

        dp, dv = lax.cond(n_win <= c_cap, compact_stage, full_stage, 0)

    # ---- big bodies: bigs <- local-shard smalls (sources partitioned) ---
    big_src = (pos[top_i], vel[top_i],
               jnp.where(big_sel, mass[top_i], 0.0),
               radius[top_i], cell[top_i])
    cell_l = lax.dynamic_slice_in_dim(cell, my * n_l, n_l)
    is_big_l = lax.dynamic_slice_in_dim(is_big, my * n_l, n_l)
    small_local = (pos_l, vel_l, jnp.where(is_big_l, 0.0, mass_l),
                   radius_l, cell_l)
    dp_b2, dv_b2 = _cheb_pair_deltas_blocked(
        big_src, small_local, 2, impulse, max_cheb=None)
    dp = dp.at[top_i].add(jnp.where(big_sel[:, None], dp_b2, 0.0))
    dv = dv.at[top_i].add(jnp.where(big_sel[:, None], dv_b2, 0.0))

    # ---- overflow residual (global selection, banded application) -------
    def residual(args):
        return _banded_residual(
            args, pos, vel, mass, radius, cell, flat, is_big, cap,
            impulse, my, n_l, p_dev)

    dp, dv = lax.cond(overflow > 0, residual, lambda a: a, (dp, dv))

    # ---- combine ---------------------------------------------------------
    dp = lax.psum(dp, axis_name)
    dv = lax.psum(dv, axis_name)
    dp_l = lax.dynamic_slice_in_dim(dp, my * n_l, n_l)
    dv_l = lax.dynamic_slice_in_dim(dv, my * n_l, n_l)

    # everyone <- bigs: post-psum on the local shard (each target is local
    # to exactly one device).
    tgt_l = (pos_l, vel_l, mass_l, radius_l, cell_l)
    dp_b1, dv_b1 = _cheb_pair_deltas_blocked(
        tgt_l, big_src, 2, impulse, max_cheb=None)
    return dp_l + dp_b1, dv_l + dv_b1


def _banded_residual(args, pos, vel, mass, radius, cell, sort_key, is_big,
                     cap, impulse, my, n_l, p_dev, in_keep=None, order=None):
    """Beyond-capacity residual, banded: the SELECTION is global (the same
    stable `argsort(keep)[:_OVERFLOW_CAP]` as the single chip, computed
    replicated so beyond-capacity pairs drop symmetrically on every
    device); the two exact pair passes are sharded — (b) by sorted-target
    chunk, (c) by overflow-row chunk — so each pair direction is computed
    on exactly one device and the psum of contributions stays disjoint.

    `in_keep`/`order` let the hash pass supply its existing sorted order
    and window mask; the bucket pass passes None and the slot ranks are
    derived from the (cond-gated, rare-path) global sort here.
    """
    dp, dv = args
    n = pos.shape[0]
    dim = pos.shape[1]
    m_cap = min(n, _OVERFLOW_CAP)

    if order is None:
        order = jnp.argsort(sort_key)
    key_srt = sort_key[order]
    big_srt = is_big[order]
    if in_keep is None:
        first = sorted_first_occurrence(key_srt)
        slot = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
        in_cap_g = (slot < cap) & ~big_srt
    else:
        in_cap_g = in_keep
    keep = in_cap_g | big_srt
    o_idx = jnp.argsort(keep)[:m_cap]
    o_valid = ~keep[o_idx]

    pos_srt, vel_srt = pos[order], vel[order]
    mass_srt, radius_srt = mass[order], radius[order]
    cell_srt = cell[order]
    o = (pos_srt[o_idx], vel_srt[o_idx],
         jnp.where(o_valid, mass_srt[o_idx], 0.0),
         radius_srt[o_idx], cell_srt[o_idx])
    sel_over = jnp.zeros((n,), bool).at[o_idx].set(o_valid)

    # (b): my sorted-target chunk <- overflow sources (cheb <= 1). Big
    # targets are excluded (they already got overflow smalls through the
    # bigs<-smalls pass); unselected overflow targets drop symmetrically.
    t0 = my * n_l
    tgt = tuple(lax.dynamic_slice_in_dim(a, t0, n_l) for a in
                (pos_srt, vel_srt, mass_srt, radius_srt, cell_srt))
    dp_b, dv_b = _cheb_pair_deltas_blocked(tgt, o, dim, impulse)
    in_cap_t = lax.dynamic_slice_in_dim(in_cap_g, t0, n_l)
    big_t = lax.dynamic_slice_in_dim(big_srt, t0, n_l)
    sel_t = lax.dynamic_slice_in_dim(sel_over, t0, n_l)
    tgt_ok = (~big_t & (in_cap_t | sel_t))[:, None]
    orig_t = lax.dynamic_slice_in_dim(order, t0, n_l)
    dp = dp.at[orig_t].add(jnp.where(tgt_ok, dp_b, 0.0))
    dv = dv.at[orig_t].add(jnp.where(tgt_ok, dv_b, 0.0))

    # (c): my chunk of overflow targets <- in-capacity sources (cheb <= 1).
    oc = -(-m_cap // p_dev)
    idx = my * oc + jnp.arange(oc, dtype=jnp.int32)
    valid_r = idx < m_cap
    idx_c = jnp.minimum(idx, m_cap - 1)
    o_t = tuple(a[idx_c] for a in o)
    in_cap_src = (pos_srt, vel_srt, jnp.where(in_cap_g, mass_srt, 0.0),
                  radius_srt, cell_srt)
    dp_c, dv_c = _cheb_pair_deltas_blocked(o_t, in_cap_src, dim, impulse)
    ok_c = (valid_r & o_valid[idx_c])[:, None]
    orig_o = order[o_idx[idx_c]]
    dp = dp.at[jnp.where(ok_c[:, 0], orig_o, n)].add(
        jnp.where(ok_c, dp_c, 0.0), mode="drop")
    dv = dv.at[jnp.where(ok_c[:, 0], orig_o, n)].add(
        jnp.where(ok_c, dv_c, 0.0), mode="drop")
    return dp, dv


# ---------------------------------------------------------------------------
# Banded sorted spatial hash (3D / clustered 2D)
# ---------------------------------------------------------------------------

def _banded_hash_deltas(pos, vel, mass, radius, pos_l, vel_l, mass_l,
                        radius_l, config: SimConfig, axis_name, my, n_l):
    n, dim = pos.shape
    p_dev = lax.axis_size(axis_name)
    window = config.collision_max_neighbors
    impulse = config.collision_impulse
    n_buckets = 1 << max(1, (2 * n - 1).bit_length())

    # ---- replicated geometry + sort (identical to _grid_pass) -----------
    k_big = min(64, n)
    top_r, top_i = lax.top_k(radius, min(k_big + 1, n))
    base = max(float(config.collision_cell_size), 0.0)
    cell_size = jnp.maximum(jnp.asarray(base, pos.dtype),
                            jnp.maximum(2.05 * top_r[min(k_big, n - 1)],
                                        1e-6))
    big_sel = top_r[:k_big] > 0.5 * cell_size
    top_i = top_i[:k_big]
    is_big = jnp.zeros((n,), bool).at[top_i].set(big_sel)

    cell = jnp.floor(pos / cell_size).astype(jnp.int32)          # [N, D]
    h = _cell_hash(cell, n_buckets)                              # [N]

    order = jnp.argsort(h)
    h_sorted = h[order]
    pos_s, vel_s = pos[order], vel[order]
    mass_s, radius_s = mass[order], radius[order]
    cell_s = cell[order]
    big_s = is_big[order]

    first = sorted_first_occurrence(h_sorted)
    rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    in_win = (rank < window) & ~big_s
    overflow = jnp.sum(~in_win & ~big_s)

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

    def window_scan(tgt):
        """Windowed candidate scan for a block of sorted target rows —
        same masks as _grid_pass (sources/validity from the replicated
        sorted arrays, so symmetric-window pairing is preserved)."""
        cell_t, pos_t, vel_t, mass_t, radius_t, inwin_t, sidx_t = tgt
        b = sidx_t.shape[0]
        nbr_cells = cell_t[:, None, :] + offs[None, :, :]        # [B, C, D]
        nbr_hash = _cell_hash(nbr_cells, n_buckets)              # [B, C]
        starts = jnp.searchsorted(
            h_sorted, nbr_hash.reshape(-1)).reshape(b, n_off)

        win = jnp.arange(window, dtype=jnp.int32)
        cand = starts[:, :, None] + win[None, None, :]           # [B, C, W]
        cand = cand.reshape(b, n_off * window)
        in_range = cand < n
        cand = jnp.minimum(cand, n - 1)

        cand_hash = h_sorted[cand]                               # [B, K]
        want_hash = jnp.repeat(nbr_hash, window, axis=1)         # [B, K]
        want_cell = jnp.repeat(nbr_cells, window, axis=1)        # [B, K, D]
        cand_cell = cell_s[cand]                                 # [B, K, D]
        cell_match = jnp.all(cand_cell == want_cell, axis=-1)
        valid = (in_range & (cand_hash == want_hash) & cell_match
                 & (cand != sidx_t[:, None])
                 & inwin_t[:, None] & in_win[cand])

        d = pos_s[cand] - pos_t[:, None, :]                      # [B, K, D]
        v = vel_s[cand] - vel_t[:, None, :]
        m_j = mass_s[cand]
        msum = mass_t[:, None] + m_j
        valid = valid & (msum > 0)
        w1 = jnp.where(valid, m_j / jnp.where(msum > 0, msum, 1.0), 0.0)
        r = radius_t[:, None] + radius_s[cand]

        dpos, dvel = _pair_deltas(d, v, w1, r, valid, impulse)
        return jnp.sum(dpos, axis=1), jnp.sum(dvel, axis=1)

    # ---- banded: my index chunk of the sorted targets --------------------
    t0 = my * n_l
    sidx = t0 + jnp.arange(n_l, dtype=jnp.int32)
    tgt_chunk = (
        lax.dynamic_slice_in_dim(cell_s, t0, n_l),
        lax.dynamic_slice_in_dim(pos_s, t0, n_l),
        lax.dynamic_slice_in_dim(vel_s, t0, n_l),
        lax.dynamic_slice_in_dim(mass_s, t0, n_l),
        lax.dynamic_slice_in_dim(radius_s, t0, n_l),
        lax.dynamic_slice_in_dim(in_win, t0, n_l),
        sidx,
    )
    if n_l > _WINDOW_CHUNK:
        pad = (-n_l) % _WINDOW_CHUNK

        def prep(a):
            if pad:
                a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            return a.reshape(-1, _WINDOW_CHUNK, *a.shape[1:])

        dpos_c, dvel_c = lax.map(window_scan,
                                 tuple(prep(a) for a in tgt_chunk))
        dpos_c = dpos_c.reshape(-1, dim)[:n_l]
        dvel_c = dvel_c.reshape(-1, dim)[:n_l]
    else:
        dpos_c, dvel_c = window_scan(tgt_chunk)

    orig_t = lax.dynamic_slice_in_dim(order, t0, n_l)
    dp = jnp.zeros((n, dim), pos.dtype).at[orig_t].add(dpos_c)
    dv = jnp.zeros((n, dim), pos.dtype).at[orig_t].add(dvel_c)

    # ---- big bodies: bigs <- local-shard smalls --------------------------
    big_src = (pos[top_i], vel[top_i],
               jnp.where(big_sel, mass[top_i], 0.0),
               radius[top_i], cell[top_i])
    cell_l = lax.dynamic_slice_in_dim(cell, my * n_l, n_l)
    is_big_l = lax.dynamic_slice_in_dim(is_big, my * n_l, n_l)
    small_local = (pos_l, vel_l, jnp.where(is_big_l, 0.0, mass_l),
                   radius_l, cell_l)
    dp_b2, dv_b2 = _cheb_pair_deltas_blocked(
        big_src, small_local, dim, impulse, max_cheb=None)
    dp = dp.at[top_i].add(jnp.where(big_sel[:, None], dp_b2, 0.0))
    dv = dv.at[top_i].add(jnp.where(big_sel[:, None], dv_b2, 0.0))

    # ---- overflow residual ------------------------------------------------
    def residual(args):
        return _banded_residual(
            args, pos, vel, mass, radius, cell, h, is_big, window,
            impulse, my, n_l, p_dev, in_keep=in_win, order=order)

    dp, dv = lax.cond(overflow > 0, residual, lambda a: a, (dp, dv))

    # ---- combine ----------------------------------------------------------
    dp = lax.psum(dp, axis_name)
    dv = lax.psum(dv, axis_name)
    dp_l = lax.dynamic_slice_in_dim(dp, my * n_l, n_l)
    dv_l = lax.dynamic_slice_in_dim(dv, my * n_l, n_l)

    tgt_l = (pos_l, vel_l, mass_l, radius_l, cell_l)
    dp_b1, dv_b1 = _cheb_pair_deltas_blocked(
        tgt_l, big_src, dim, impulse, max_cheb=None)
    return dp_l + dp_b1, dv_l + dv_b1
