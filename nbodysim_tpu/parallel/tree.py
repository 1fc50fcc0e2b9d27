"""Banded multi-chip FMM: the stencil tree code sharded by grid rows.

Round 1's multi-chip tree (`parallel/sharded.py:replicated_tree_
accelerations`) all-gathered the particles and rebuilt the whole pyramid on
every device — correct at any mesh size, zero compute scaling. This module
distributes the tree the TPU way: every pyramid level's rows are statically
banded across the 1-D mesh, each device runs the heavy stencils (M2L
V-list, near-field K x K buckets) only on its own band, the (2R-1)-row
boundary halo moves between ring neighbors by `lax.ppermute` per level, and
the tiny coarse levels are all-gathered and computed replicated. Per-device
stencil FLOPs drop P x. (The reference's only analogue is its std::async
fan-out over body chunks, Simulation.hpp:176-214 — a shared-memory
work-split; banding the multipole grid is that idea taken to its
distributed-memory TPU conclusion.)

Why static row bands load-balance even clustered scenes: the M2L and
near-field stencils are dense over the GRID — their cost per row is fixed
by (res, cap, R), independent of particle placement. Clustering moves
particles between cells, not compute between rows. The formerly
replicated O(N log N) cell sort and the O(N) bucket scatter / L2P / near
gathers now run on a COMPACTED per-band window set (see `_field_stage`):
an O(N) cumsum+scatter selects the band+halo window particles into a
static capacity-C buffer (C ~ _BAND_SLACK * N * rows_w / res) and only
those are sorted, scattered, and gathered. Per-device cost model:
O(N) bandwidth-bound prep (cell indices, masks, moment scatter — the
all_gather is O(N) anyway) + O(N/P log N/P) sort + O(N/P) field stages +
O(coarse) replicated levels. When clustering overfills the capacity, a
lax.cond falls back to the full-length sort — correct at any
distribution, just not compute-scaled on that device.

Exactness: each pairwise/cell contribution is computed on exactly one
device, accumulated into a full-length [N, D] buffer, and `lax.psum`
combines the disjoint pieces — every other device contributes exact zeros
— so the banded result matches the single-chip tree to roundoff
(scatter-add and blocked-residual orderings differ slightly; gated by
tests/test_tree_banded.py against `bh_accelerations`).

Decomposition of `physics/barneshut._bh_accelerations` across the mesh:

  heavy coupling        -> local input-shard rows           (post-psum)
  acc_from_out          -> local input-shard rows           (post-psum)
  acc_out (on outliers) -> outlier-index range per device   (in psum)
  far field (M2L+L2L+L2P) -> grid-row band per device       (in psum)
  near-field buckets    -> grid-row band (+halo sources)    (in psum)
  overflow residual     -> per-band window overflow sets    (in psum)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.physics.barneshut import (
    NEAR_CAP,
    _OVERFLOW_CAP,
    _bounding_square,
    _bucket_stencil_dispatch,
    _deep_near_aggregates,
    _extract_heavy_outliers,
    _l2l_upsample,
    _m2l_conv,
    _m2l_level,
    _m2l_stencil,
    _moment_payload,
    _near_masked_blocked,
    _nf_use_pallas,
    _resolve_deep_levels,
    _resolve_levels,
    _resolve_radius,
    _resolve_tile_params,
    _taylor_eval,
    _tile_select,
    heavy_coupling,
)


# Window-compaction slack: per-band sorted-set capacity is
# ceil(_BAND_SLACK * N * rows_w / res) — covers a 4x particle imbalance
# between bands before the in-jit lax.cond falls back to the full-length
# sort (correct at any distribution, just not compute-scaled).
_BAND_SLACK = 4


def compact_capacity(n: int, rows_w: int, res: int,
                     slack: int | None = None) -> int:
    """Static per-band sorted-window capacity C (the banded tree's
    per-device sort/scatter/gather length): C = ceil(slack * n * rows_w /
    res) + 1, rounded up to a 1024 multiple, clamped to n. C >= n means
    the compaction cannot pay for itself and the static full-length sort
    is used instead. This is the op-count model of the banded field
    stages: per-device work is O(n) prep + O(C log C) sort + O(C) field
    gathers, with C -> slack * n * rows_w / res = O(n / P) as res grows
    (rows_w = rb + 2*rr = res/P + 2*(radius-1))."""
    if slack is None:
        slack = _BAND_SLACK
    cap = min(n, -(-slack * n * rows_w // res) + 1)
    return min(n, -(-cap // 1024) * 1024)


def banded_tree_accelerations(
    pos_l: jax.Array,      # [N/P, 2] local targets (inside shard_map)
    mass_l: jax.Array,     # [N/P]
    config: SimConfig,
    axis_name: str = "shards",
) -> jax.Array:
    """Multi-chip FMM accelerations for the local shard (see module doc)."""
    p_dev = lax.axis_size(axis_name)
    n_l = pos_l.shape[0]
    n = n_l * p_dev
    levels = _resolve_levels(config, n)
    radius = _resolve_radius(config)
    res = 1 << levels
    p_halo = 2 * radius - 1
    # Banding needs a power-of-two mesh whose finest band still holds the
    # full halo; otherwise (odd meshes, tiny grids) fall back to the
    # replicated build — correct, just not compute-scaled.
    if p_dev == 1 or (p_dev & (p_dev - 1)) or res // p_dev < p_halo:
        from nbodysim_tpu.parallel.sharded import (
            replicated_tree_accelerations)

        return replicated_tree_accelerations(pos_l, mass_l, config,
                                             axis_name)

    pos = lax.all_gather(pos_l, axis_name, tiled=True)     # [N, 2]
    mass = lax.all_gather(mass_l, axis_name, tiled=True)   # [N]
    return _banded_eval(
        pos, mass, pos_l, levels=levels, radius=radius,
        eps_sq=float(config.eps_sq), g_const=float(config.g_const),
        near_cap=NEAR_CAP, p_dev=p_dev, n_l=n_l, axis_name=axis_name,
        nf_pallas=_nf_use_pallas(config), interpret=config.pallas_interpret,
        deep_levels=_resolve_deep_levels(config, levels),
        tile_params=_resolve_tile_params(
            config, _resolve_deep_levels(config, levels), radius))


def _halo_window(band, p: int, p_dev: int, axis_name: str):
    """Assemble an M2L row window from a band grid tuple.

    band: k arrays [rb, r]. Returns k arrays [rb + 2p, r + 2p]: the band
    plus p halo rows from the up/down ring neighbors (zeros at the global
    boundary — non-participating ppermute edges deliver zeros, exactly the
    zero padding the single-chip stencil uses) and p zero columns.
    """
    down_perm = [(i, i + 1) for i in range(p_dev - 1)]  # recv from my-1
    up_perm = [(i + 1, i) for i in range(p_dev - 1)]    # recv from my+1

    stacked = jnp.stack(band)                            # [k, rb, r]
    top = lax.ppermute(stacked[:, -p:, :], axis_name, down_perm)
    bot = lax.ppermute(stacked[:, :p, :], axis_name, up_perm)
    win = jnp.concatenate([top, stacked, bot], axis=1)   # [k, rb+2p, r]
    win = jnp.pad(win, ((0, 0), (0, 0), (p, p)))
    return tuple(win[i] for i in range(stacked.shape[0]))


def _banded_eval(pos, mass, pos_l, *, levels, radius, eps_sq, g_const,
                 near_cap, p_dev, n_l, axis_name,
                 nf_pallas=False, interpret=False, deep_levels=0,
                 tile_params=(0, 0, 0)):
    from nbodysim_tpu.core.blocking import sorted_first_occurrence
    from nbodysim_tpu.physics.forces import direct_accelerations

    n = pos.shape[0]
    my = lax.axis_index(axis_name)
    res = 1 << levels
    rb = res // p_dev              # finest bucket-level band rows
    p = 2 * radius - 1             # M2L halo rows
    rr = radius - 1                # near-field halo rows
    row0 = my * rb
    # Deep-overflow chain (barneshut._bh_accelerations deep mode) under
    # banding: the pyramid extends past the bucket level; the deep levels
    # band exactly like the bucket levels (their rows are rows too, with
    # P x more of them), and hot-window targets take the deep path.
    deep = deep_levels if deep_levels > levels else 0
    build_levels = deep if deep else levels
    res_b = 1 << build_levels      # finest build resolution
    rb_b = res_b // p_dev
    row0_b = my * rb_b

    ext = _extract_heavy_outliers(pos, mass)
    is_out, out_i, out_sel = ext["is_out"], ext["out_i"], ext["out_sel"]
    tree_mass, bulk_pos = ext["tree_mass"], ext["bulk_pos"]

    corner, size = _bounding_square(bulk_pos)
    u = (bulk_pos - corner) / size
    ci_f = jnp.clip((u * res_b).astype(jnp.int32), 0, res_b - 1)  # [N, 2]
    ci = ci_f >> (build_levels - levels) if deep else ci_f
    flat = ci[:, 0] * res + ci[:, 1]

    # ---------------- pyramid: banded build + coarse replication --------
    # Scatter the 6 raw moment fields of ALL particles into my band's rows
    # at the finest BUILD level as one fused [N, 6]-payload scatter
    # (out-of-band indices drop); pool up while the band can still host a
    # halo; all_gather the coarsest sharded level (tiny) and pool the
    # replicated remainder.
    wrow = ci_f[:, 0] - row0_b
    in_rows = (wrow >= 0) & (wrow < rb_b)
    bflat = jnp.where(in_rows, wrow * res_b + ci_f[:, 1],
                      rb_b * res_b)                          # OOB drops

    shard_levels = [l for l in range(2, build_levels + 1)
                    if (1 << l) % p_dev == 0 and (1 << l) // p_dev >= p]
    ls = min(shard_levels)         # contiguous {ls..build} by monotonicity

    if deep:
        # Deep-mode build: 3-channel scatter + synthesized quadrupoles at
        # the finest level, matching barneshut._build_pyramid(synth_quad).
        from nbodysim_tpu.physics.barneshut import _synth_quad_channels

        g3 = (jnp.zeros((rb_b * res_b, 3), pos.dtype)
              .at[bflat].add(_moment_payload(bulk_pos, tree_mass)[:, :3],
                             mode="drop")
              .reshape(rb_b, res_b, 3))
        g6 = _synth_quad_channels(g3)
    else:
        g6 = (jnp.zeros((rb_b * res_b, 6), pos.dtype)
              .at[bflat].add(_moment_payload(bulk_pos, tree_mass),
                             mode="drop")
              .reshape(rb_b, res_b, 6))
    band_grids = {build_levels: tuple(g6[:, :, i] for i in range(6))}
    for l in range(build_levels - 1, ls - 1, -1):
        r_l = 1 << l
        rb_l = r_l // p_dev
        band_grids[l] = tuple(
            g.reshape(rb_l, 2, r_l, 2).sum((1, 3)) for g in band_grids[l + 1])

    full_grids = {}
    if ls > 2:
        full = tuple(lax.all_gather(g, axis_name, tiled=True)
                     for g in band_grids[ls])             # [2^ls, 2^ls]
        for l in range(ls - 1, 1, -1):
            r_l = 1 << l
            full = tuple(g.reshape(r_l, 2, r_l, 2).sum((1, 3)) for g in full)
            full_grids[l] = full

    # ---------------- downward pass: M2L + L2L --------------------------
    local = None
    for l in range(2, ls):                       # replicated coarse levels
        terms = _m2l_level(full_grids[l], corner, size, eps_sq, radius)
        if local is None:
            local = terms
        else:
            up = _l2l_upsample(local, size / (1 << l))
            local = tuple(u + t for u, t in zip(up, terms))

    local_bucket = None
    for l in range(ls, build_levels + 1):        # banded levels
        r_l = 1 << l
        rb_l = r_l // p_dev
        row0_l = my * rb_l
        window = _halo_window(band_grids[l], p, p_dev, axis_name)
        if rb_l % 2 == 0:
            # MXU contraction form (same math as the single-chip
            # _m2l_level, so banded == single-chip to roundoff): strip
            # the column halo, keep 2(R-1) of the p row-halo rows.
            qh = radius - 1
            gx = jnp.stack(
                [w[p - 2 * qh: p + rb_l + 2 * qh, p: p + r_l]
                 for w in window], axis=-1)
            terms = _m2l_conv(gx, corner, size, r_l, eps_sq, radius,
                              row0=row0_l, rows=rb_l)
        else:
            terms = _m2l_stencil(window, corner, size, r_l, eps_sq,
                                 radius, row0=row0_l, rows=rb_l)
        if local is None:                        # ls == 2: no coarse prefix
            local = terms
        elif l == ls:
            # Transition: slice my band's parent rows out of the replicated
            # level-(ls-1) expansion, then re-center to the band's children.
            rb_par = rb_l // 2
            par = tuple(
                lax.dynamic_slice_in_dim(x, my * rb_par, rb_par, axis=0)
                for x in local)
            up = _l2l_upsample(par, size / r_l)
            local = tuple(u + t for u, t in zip(up, terms))
        else:
            up = _l2l_upsample(local, size / r_l)
            local = tuple(u + t for u, t in zip(up, terms))
        if l == levels:
            local_bucket = local                 # snapshot the bucket level
    local_deep = local if deep else None
    local = local_bucket

    # ---------------- far + near field over the sorted window set -------
    # The global cell argsort was the banded path's largest replicated
    # O(N log N) stage (round-2 review: replicated O(N) stages cap strong
    # scaling). `_field_stage` evaluates the far-field L2P, the bucket
    # scatter/stencil/gather, and the overflow residual over a SORTED
    # WINDOW SET of length L — by default the compacted band+halo window
    # particles (an O(N) cumsum + scatter picks them; only those C ~
    # slack * N * rows_w / res get sorted, O(C log C)). A lax.cond falls
    # back to the full-length sort when clustering overfills the window
    # capacity; both branches return the same [N, 2] band contribution
    # and each (target, source) direction is still computed on exactly
    # one device, so exactness holds at ANY distribution. Slot
    # assignment matches the single-chip path bit-for-bit: the stable
    # argsort of the compacted set preserves ascending original index
    # within each cell, exactly like the stable global argsort.
    s_l = size / res
    rows_w = rb + 2 * rr
    flat_nf = jnp.where(is_out, res * res + jnp.arange(n), flat)
    loc9 = jnp.stack(local, axis=0).reshape(9, rb * res)

    def _field_stage(src, valid_s):
        ll = src.shape[0]
        srcc = jnp.minimum(src, n - 1)
        flat_s = jnp.where(valid_s, flat_nf[srcc],
                           jnp.int32(res * res) + n)
        first = sorted_first_occurrence(flat_s)
        slot = jnp.arange(ll, dtype=jnp.int32) - first.astype(jnp.int32)
        in_cap = slot < near_cap
        slot_w = jnp.where(in_cap, slot, near_cap)

        pos_s = pos[srcc]
        mass_s = tree_mass[srcc]
        ci_s = ci[srcc]
        is_bulk_s = valid_s & (flat_s < res * res)

        wrow_nf = ci_s[:, 0] - row0 + rr
        in_win = is_bulk_s & (wrow_nf >= 0) & (wrow_nf < rows_w)
        wflat = jnp.where(in_win, wrow_nf * res + ci_s[:, 1],
                          rows_w * res)

        zero_m = jnp.where(in_cap, mass_s, 0.0)
        brow = ci_s[:, 0] - row0
        g_mask = is_bulk_s & (brow >= 0) & (brow < rb) & in_cap
        slot_c = jnp.minimum(slot, near_cap - 1)
        col_s = ci_s[:, 1]
        if nf_pallas and rr >= 1:
            # Scatter straight into the kernel's slot-major flat layout
            # (barneshut._near_field_buckets — same fast path, band-sized).
            from nbodysim_tpu.kernels.nearfield import (
                _FlatLayout, bucket_stencil_pallas_flat)

            layout = _FlatLayout(rb, res, near_cap, rr, 1024)
            pf = jnp.where(in_win, layout.flat_index(wrow_nf, col_s),
                           layout.f_len)

            def scat_f(v):
                return (jnp.zeros((near_cap, layout.f_len), pos.dtype)
                        .at[slot_w, pf].set(v, mode="drop"))

            outx, outy = bucket_stencil_pallas_flat(
                scat_f(pos_s[:, 0]), scat_f(pos_s[:, 1]), scat_f(zero_m),
                layout, eps_sq=eps_sq, interpret=interpret)
            opos = jnp.minimum(
                jnp.where(g_mask,
                          layout.out_index(jnp.clip(brow, 0, rb - 1),
                                           col_s), 0),
                outx.shape[1] - 1)
            ax_s = jnp.where(g_mask, outx[slot_c, opos], 0.0)
            ay_s = jnp.where(g_mask, outy[slot_c, opos], 0.0)
        else:
            def nf_scat(vals):
                return (jnp.zeros((rows_w * res, near_cap), pos.dtype)
                        .at[wflat, slot_w].set(vals, mode="drop")
                        .reshape(rows_w, res, near_cap))

            accx, accy = _bucket_stencil_dispatch(
                nf_scat(pos_s[:, 0]), nf_scat(pos_s[:, 1]),
                nf_scat(zero_m),
                rr, eps_sq, rb, False, interpret)          # [rb, res, K]
            gidx = jnp.clip(brow, 0, rb - 1) * res + col_s
            ax_s = jnp.where(
                g_mask, accx.reshape(rb * res, near_cap)[gidx, slot_c],
                0.0)
            ay_s = jnp.where(
                g_mask, accy.reshape(rb * res, near_cap)[gidx, slot_c],
                0.0)
        acc_s = jnp.stack([ax_s, ay_s], axis=-1)              # sorted

        # ---- per-band overflow residual --------------------------------
        # Same structure as the single-chip residual (barneshut.py), band-
        # decomposed so every (target, overflow-source) DIRECTION is
        # computed on exactly one device: (b) my-band targets <- window
        # overflow sources; (c) my-band overflow targets <- all in-cap
        # sources (the cheb <= rr cell mask keeps both to true near
        # pairs). Capacity is per band, so the banded tree tolerates P x
        # more clustering than the single chip before degrading.
        m_cap = min(ll, _OVERFLOW_CAP)
        over_w = (~in_cap) & in_win
        n_over = jnp.sum(over_w)
        tgt_band = is_bulk_s & (brow >= 0) & (brow < rb)

        def residual(acc_s):
            o_idx = jnp.argsort(~over_w)[:m_cap]  # window overflow first
            o_valid = over_w[o_idx]
            o_pos = pos_s[o_idx]
            o_mass = jnp.where(o_valid, mass_s[o_idx], 0.0)
            o_cell = ci_s[o_idx]
            # (b): my band's targets gain the window-overflow part.
            dp = _near_masked_blocked(pos_s, ci_s, o_pos, o_mass, o_cell,
                                      eps_sq, rr)
            acc_s = acc_s + jnp.where(tgt_band[:, None], dp, 0.0)
            # (c): my band's overflow targets gain the in-cap part.
            o_band = (o_valid & (o_cell[:, 0] >= row0)
                      & (o_cell[:, 0] < row0 + rb))
            cap_mass = jnp.where(in_cap & is_bulk_s, mass_s, 0.0)
            o_acc = _near_masked_blocked(o_pos, o_cell, pos_s, cap_mass,
                                         ci_s, eps_sq, rr)
            return acc_s.at[o_idx].add(
                jnp.where(o_band[:, None], o_acc, 0.0))

        if not deep:   # the deep path covers overflow targets instead
            acc_s = lax.cond(n_over > 0, residual, lambda a: a, acc_s)

        # ---- far-field L2P on band rows of the window set --------------
        cellx, celly = ci_s[:, 0], ci_s[:, 1]
        in_band_s = tgt_band
        lr = jnp.clip(brow, 0, rb - 1)
        centx = corner[0] + (cellx.astype(pos.dtype) + 0.5) * s_l
        centy = corner[1] + (celly.astype(pos.dtype) + 0.5) * s_l
        dxp = pos_s[:, 0] - centx
        dyp = pos_s[:, 1] - centy
        g = loc9[:, lr * res + celly]                       # [9, L]
        far_x, far_y = _taylor_eval(tuple(g[i] for i in range(9)),
                                    dxp, dyp)
        far = jnp.stack([far_x, far_y], axis=-1)
        total = g_const * (jnp.where(in_band_s[:, None], far, 0.0)
                           + acc_s)
        return (jnp.zeros((n, 2), pos.dtype)
                .at[jnp.where(valid_s, src, n)]
                .add(jnp.where(valid_s[:, None], total, 0.0),
                     mode="drop"))

    in_win_u = ((~is_out) & (ci[:, 0] - row0 >= -rr)
                & (ci[:, 0] - row0 < rb + rr))
    c_cap = compact_capacity(n, rows_w, res)
    all_valid = jnp.ones((n,), bool)
    # Deep mode runs the same bucket field stage (its residual branch is
    # statically skipped; deep targets are overwritten below), so the
    # compact window applies there too — the flagship clustered config
    # keeps the O(N/P log N/P) sort.
    if c_cap >= n:
        contrib = _field_stage(jnp.argsort(flat_nf), all_valid)
    else:
        rank = jnp.cumsum(in_win_u) - 1
        n_win = jnp.sum(in_win_u)
        widx = (jnp.full((c_cap,), n, jnp.int32)
                .at[jnp.where(in_win_u & (rank < c_cap), rank, c_cap)]
                .set(jnp.arange(n, dtype=jnp.int32), mode="drop"))

        def compact_stage(_):
            keys = jnp.where(widx < n,
                             flat_nf[jnp.minimum(widx, n - 1)],
                             jnp.int32(res * res) + n)
            oc = jnp.argsort(keys)
            return _field_stage(widx[oc], widx[oc] < n)

        def full_stage(_):
            return _field_stage(jnp.argsort(flat_nf), all_valid)

        contrib = lax.cond(n_win <= c_cap, compact_stage, full_stage, 0)

    lrow = ci[:, 0] - row0
    in_band = (lrow >= 0) & (lrow < rb) & ~is_out

    # ---------------- deep-overflow path (banded) -----------------------
    # Identical target selection to the single chip (occupancy over the
    # full bucket grid is replicated O(res^2) bookkeeping); the deep L2P
    # and the smoothed (2rr+1)^2 deep-cell aggregates run on band rows
    # only, with an rr-row ppermute halo for the aggregate window.
    if deep:
        occ = jnp.zeros((res * res,), jnp.int32).at[flat_nf].add(
            1, mode="drop")
        hot = (occ > near_cap).reshape(res, res)
        hotp = jnp.pad(hot, rr)
        bmask = jnp.zeros((res, res), bool)
        for ox in range(2 * rr + 1):
            for oy in range(2 * rr + 1):
                bmask = bmask | hotp[ox:ox + res, oy:oy + res]
        # ~is_out: COM-parked outliers never take the tile/deep path
        # (their rows are discarded), but they used to inflate tile
        # SCORES — up to 4096 phantom targets could displace a
        # genuinely hot tile from the top-T set (r3 review).
        b_par = bmask.reshape(-1)[flat] & ~is_out              # [N]

        # Fold the cheb>=2 aggregate ring into the deep locals (dense
        # banded stencil; barneshut._fold_aggregate_ring) — the tile path
        # below must slice the UN-folded local_deep.
        from nbodysim_tpu.physics.barneshut import _fold_aggregate_ring

        rrd = radius - 1
        wring = _halo_window(band_grids[build_levels], rrd, p_dev,
                             axis_name)
        local_agg = _fold_aggregate_ring(
            local_deep, wring, corner, size, res_b, eps_sq, radius,
            row0=row0_b, rows=rb_b)

        # Deep L2P + smoothed aggregates on band particles (band rows at
        # the deep level align with the bucket-level bands: row_deep >>
        # (deep-levels) = row). These are per-particle gather/VPU stages,
        # so they run over a COMPACTED per-band target set (r3; same
        # design as _field_stage — only my band's targets take my deep
        # values, so ~slack*N/P rows replace the replicated full-N pass),
        # with an in-jit fallback when clustering overfills the band.
        # Collectives (halo windows, the ring fold) stay outside the cond.
        s_d = size / res_b
        rin = min(rrd, 1)
        win3 = _halo_window(band_grids[build_levels][:3], rin, p_dev,
                            axis_name)
        gp = jnp.stack(win3, axis=-1)    # [rb_b + 2rin, res_b + 2rin, 3]
        payload = _moment_payload(pos, tree_mass)
        locd = jnp.stack(local_agg, axis=0).reshape(9, rb_b * res_b)

        def deep_eval(pos_s, pay3_s, ci_f_s):
            """g_const * (deep L2P + inner-3x3 aggregates), subset rows."""
            lrow_d = jnp.clip(ci_f_s[:, 0] - row0_b, 0, rb_b - 1)
            centx_d = corner[0] + (ci_f_s[:, 0].astype(pos.dtype)
                                   + 0.5) * s_d
            centy_d = corner[1] + (ci_f_s[:, 1].astype(pos.dtype)
                                   + 0.5) * s_d
            dxd = pos_s[:, 0] - centx_d
            dyd = pos_s[:, 1] - centy_d
            gd = locd[:, lrow_d * res_b + ci_f_s[:, 1]]        # [9, C]
            fdx, fdy = _taylor_eval(tuple(gd[i] for i in range(9)),
                                    dxd, dyd)
            far_d = jnp.stack([fdx, fdy], axis=-1)
            near_d = _deep_near_aggregates(pos_s, pay3_s, gp, ci_f_s,
                                           eps_sq, s_d, rin, row0=row0_b)
            return g_const * (far_d + near_d)

        c_deep = compact_capacity(n, rb, res)
        if c_deep >= n:
            deep_part = jnp.where(
                in_band[:, None], deep_eval(pos, payload[:, :3], ci_f),
                0.0)
            contrib = jnp.where((b_par & in_band)[:, None], deep_part,
                                contrib)
        else:
            rank_d = jnp.cumsum(in_band) - 1
            n_band = jnp.sum(in_band)
            didx = (jnp.full((c_deep,), n, jnp.int32)
                    .at[jnp.where(in_band & (rank_d < c_deep), rank_d,
                                  c_deep)]
                    .set(jnp.arange(n, dtype=jnp.int32), mode="drop"))

            def compact_deep(contrib):
                valid = didx < n
                si = jnp.minimum(didx, n - 1)
                vals = deep_eval(pos[si], payload[si, :3], ci_f[si])
                sel = valid & b_par[si]    # in_band[si] true where valid
                # Unique rows (each particle appears once): .set == the
                # full branch's where-replacement.
                return contrib.at[jnp.where(sel, si, n)].set(
                    vals, mode="drop")

            def full_deep(contrib):
                deep_part = jnp.where(
                    in_band[:, None],
                    deep_eval(pos, payload[:, :3], ci_f), 0.0)
                return jnp.where((b_par & in_band)[:, None], deep_part,
                                 contrib)

            contrib = lax.cond(n_band <= c_deep, compact_deep, full_deep,
                               contrib)

        # ---- hot-zone tile refinement under banding --------------------
        # Tile selection and the per-tile sub-level chain are replicated
        # (tiny grids); the level-D local WINDOW is banded state — each
        # device contributes its band's rows of every tile window (zeros
        # elsewhere) and one psum of the [T, W, W, 9] stack assembles
        # what the single chip slices from the full grid. The PER-PARTICLE
        # stages band (r3): each device scatters only its band's
        # particles into the tile grids (one small psum assembles the
        # [T, Wf, Wf, 3] moments — every particle scatters from exactly
        # its owner band, so coverage is exact) and evaluates refined
        # targets over the same compacted band set as the deep stage.
        # Application is band-masked so the final psum of contrib stays
        # disjoint.
        tk, tt, tc = tile_params
        if tk:
            from nbodysim_tpu.physics.barneshut import (
                _tile_apply, _tile_chain, _tile_scatter)

            hh = radius
            ww = tt + 2 * hh
            tid, tile_slot, orig = _tile_select(ci_f, b_par, build_levels,
                                                tt, tc, radius)
            locb = jnp.stack(local_deep, axis=-1)       # [rb_b, res_b, 9]
            locbp = jnp.pad(locb, ((ww, ww), (hh, hh), (0, 0)))

            def slice_band(o):
                st = jnp.clip(o[0] - row0_b + ww, 0, rb_b + ww)
                return lax.dynamic_slice(locbp, (st, o[1] + hh, 0),
                                         (ww, ww, 9))

            local_w = lax.psum(jax.vmap(slice_band)(orig), axis_name)

            tile_kw = dict(corner=corner, size=size, deep=build_levels,
                           radius=radius, k=tk, t=tt, T=tc)
            if c_deep >= n:
                # No compaction possible: keep the replicated full-length
                # scatter (identical on every device — no psum needed).
                g3k = _tile_scatter(
                    payload, bulk_pos, ci_f, tile_slot, orig,
                    corner, size, build_levels, radius, tk, tt, tc)
                local_w = _tile_chain(local_w, g3k, orig, corner, size,
                                      build_levels, radius, eps_sq,
                                      tk, tt, tc)
                refined, far_ref, near_ref = _tile_apply(
                    pos, payload, bulk_pos, ci_f, b_par, local_w, g3k,
                    tile_slot, orig, eps_sq=eps_sq, **tile_kw)
                ref_part = jnp.where(in_band[:, None],
                                     g_const * (far_ref + near_ref), 0.0)
                contrib = jnp.where((refined & in_band)[:, None],
                                    ref_part, contrib)
            else:
                valid_d = didx < n
                si = jnp.minimum(didx, n - 1)
                # Out-of-capacity bands fall back to full-length inputs
                # masked to the band: the scatter psum must stay exact,
                # so the fallback happens per-device via the same cond
                # predicate as the deep stage (collective psum stays
                # OUTSIDE the cond — both branches produce the partial
                # tile grids, psum combines them after).
                pay_band = jnp.where(in_band[:, None], payload, 0.0)

                def compact_grids(_):
                    pay_s = jnp.where(valid_d[:, None], payload[si], 0.0)
                    return _tile_scatter(
                        pay_s, bulk_pos[si], ci_f[si], tile_slot, orig,
                        corner, size, build_levels, radius, tk, tt, tc,
                        src_mask=valid_d)

                def full_grids(_):
                    return _tile_scatter(
                        pay_band, bulk_pos, ci_f, tile_slot, orig,
                        corner, size, build_levels, radius, tk, tt, tc,
                        src_mask=in_band)

                g3k = lax.psum(
                    lax.cond(n_band <= c_deep, compact_grids, full_grids,
                             0), axis_name)
                local_w = _tile_chain(local_w, g3k, orig, corner, size,
                                      build_levels, radius, eps_sq,
                                      tk, tt, tc)

                def compact_apply(contrib):
                    refined_s, far_s, near_s = _tile_apply(
                        pos[si], payload[si], bulk_pos[si], ci_f[si],
                        b_par[si], local_w, g3k, tile_slot, orig,
                        eps_sq=eps_sq, **tile_kw)
                    sel = valid_d & refined_s
                    vals = g_const * (far_s + near_s)
                    return contrib.at[jnp.where(sel, si, n)].set(
                        vals, mode="drop")

                def full_apply(contrib):
                    refined, far_ref, near_ref = _tile_apply(
                        pos, payload, bulk_pos, ci_f, b_par, local_w,
                        g3k, tile_slot, orig, eps_sq=eps_sq, **tile_kw)
                    ref_part = jnp.where(
                        in_band[:, None],
                        g_const * (far_ref + near_ref), 0.0)
                    return jnp.where((refined & in_band)[:, None],
                                     ref_part, contrib)

                contrib = lax.cond(n_band <= c_deep, compact_apply,
                                   full_apply, contrib)

    # ---------------- exact forces ON outliers (index-range sharded) ----
    k_out = out_i.shape[0]
    ko_p = -(-k_out // p_dev)
    idx = my * ko_p + jnp.arange(ko_p)
    valid = idx < k_out
    idx_c = jnp.minimum(idx, k_out - 1)
    oi = out_i[idx_c]
    non_heavy_mass = jnp.where(ext["is_heavy"], 0.0, mass)
    acc_out = direct_accelerations(
        pos[oi], None, eps_sq, g_const, src_pos=pos,
        src_mass=non_heavy_mass)
    sel = valid & out_sel[idx_c]
    contrib = contrib.at[oi].add(jnp.where(sel[:, None], acc_out, 0.0))

    # ---------------- combine: psum disjoint pieces + local terms -------
    acc_g = lax.psum(contrib, axis_name)
    acc_l = lax.dynamic_slice_in_dim(acc_g, my * n_l, n_l, axis=0)

    is_out_l = lax.dynamic_slice_in_dim(is_out, my * n_l, n_l, axis=0)
    out_src_mass = jnp.where(out_sel & ~ext["is_heavy"][out_i],
                             mass[out_i], 0.0)
    acc_from_out_l = direct_accelerations(
        pos_l, None, eps_sq, g_const, src_pos=pos[out_i],
        src_mass=out_src_mass)
    acc_heavy_l = heavy_coupling(pos_l, ext["h_pos"], ext["h_mass"],
                                 eps_sq, g_const)
    return (acc_l
            + jnp.where(is_out_l[:, None], 0.0, acc_from_out_l)
            + acc_heavy_l)
