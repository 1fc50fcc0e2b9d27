"""Banded multi-chip octree FMM: the 3D tree code sharded by x-slabs.

The 3D analogue of `parallel/tree.py` (grid-row-banded 2D FMM): every
pyramid level's x-slabs are statically banded across the 1-D mesh, each
device runs the heavy stencils (M2L V-list, near-field K x K buckets) only
on its own band, the boundary halo ((2R-1) slabs for M2L, (R-1) for the
near field) moves between ring neighbors by `lax.ppermute` per level, and
the tiny coarse levels are all-gathered and computed replicated. Per-device
stencil FLOPs drop P x. (Reference analogue: the std::async fan-out over
body chunks, Simulation.hpp:176-214, taken to its distributed-memory TPU
conclusion; the reference itself has no distributed tree.)

Load balance, exactness, and the psum-of-disjoint-pieces combination scheme
are identical to the 2D module (see parallel/tree.py docstring); gated
against the single-chip octree by tests/test_tree_banded.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.parallel.tree import compact_capacity
from nbodysim_tpu.physics.barneshut import (
    NEAR_CAP,
    _OVERFLOW_CAP,
    _extract_heavy_outliers,
    _near_masked_blocked,
    heavy_coupling,
)
from nbodysim_tpu.physics.barneshut3d import (
    _bounding_cube,
    _bucket_stencil3,
    _deep_near_aggregates3,
    _fold_aggregate_ring3,
    _l2l_upsample3,
    _m2l_conv3,
    _m2l_level3,
    _m2l_stencil3,
    _moment_payload3,
    _pool2x3,
    _resolve_deep_levels3,
    _resolve_levels3,
    _resolve_radius3,
    _resolve_tile_params3,
    _taylor_eval3,
    _tile_select3,
)


def banded_tree3_accelerations(
    pos_l: jax.Array,      # [N/P, 3] local targets (inside shard_map)
    mass_l: jax.Array,     # [N/P]
    config: SimConfig,
    axis_name: str = "shards",
) -> jax.Array:
    """Multi-chip octree accelerations for the local shard."""
    p_dev = lax.axis_size(axis_name)
    n_l = pos_l.shape[0]
    n = n_l * p_dev
    levels = _resolve_levels3(config, n)
    radius = _resolve_radius3(config)
    res = 1 << levels
    p_halo = 2 * radius - 1
    # Banding needs a power-of-two mesh whose finest band still holds the
    # full halo; otherwise fall back to the replicated build.
    if p_dev == 1 or (p_dev & (p_dev - 1)) or res // p_dev < p_halo:
        from nbodysim_tpu.parallel.sharded import (
            replicated_tree_accelerations)

        return replicated_tree_accelerations(pos_l, mass_l, config,
                                             axis_name)

    from nbodysim_tpu.physics.barneshut import _nf_use_pallas

    pos = lax.all_gather(pos_l, axis_name, tiled=True)     # [N, 3]
    mass = lax.all_gather(mass_l, axis_name, tiled=True)   # [N]
    return _banded_eval3(
        pos, mass, pos_l, levels=levels, radius=radius,
        eps_sq=float(config.eps_sq), g_const=float(config.g_const),
        near_cap=NEAR_CAP, p_dev=p_dev, n_l=n_l, axis_name=axis_name,
        nf_pallas=_nf_use_pallas(config),
        interpret=config.pallas_interpret,
        deep_levels=_resolve_deep_levels3(config, levels),
        tile_params=_resolve_tile_params3(
            config, _resolve_deep_levels3(config, levels), radius))


def _halo_window3(band, p: int, p_dev: int, axis_name: str):
    """Assemble an M2L x-slab window from a band grid tuple.

    band: k arrays [rb, r, r]. Returns k arrays [rb + 2p, r + 2p, r + 2p]:
    the band plus p halo slabs from the up/down ring neighbors (zeros at
    the global boundary — non-participating ppermute edges deliver zeros,
    exactly the zero padding the single-chip stencil uses) and p zero
    y/z faces."""
    down_perm = [(i, i + 1) for i in range(p_dev - 1)]  # recv from my-1
    up_perm = [(i + 1, i) for i in range(p_dev - 1)]    # recv from my+1

    stacked = jnp.stack(band)                            # [k, rb, r, r]
    top = lax.ppermute(stacked[:, -p:], axis_name, down_perm)
    bot = lax.ppermute(stacked[:, :p], axis_name, up_perm)
    win = jnp.concatenate([top, stacked, bot], axis=1)   # [k, rb+2p, r, r]
    win = jnp.pad(win, ((0, 0), (0, 0), (p, p), (p, p)))
    return tuple(win[i] for i in range(stacked.shape[0]))


def _banded_eval3(pos, mass, pos_l, *, levels, radius, eps_sq, g_const,
                  near_cap, p_dev, n_l, axis_name,
                  nf_pallas=False, interpret=False, deep_levels=0,
                  tile_params=(0, 0, 0)):
    from nbodysim_tpu.core.blocking import sorted_first_occurrence
    from nbodysim_tpu.physics.forces import direct_accelerations

    n = pos.shape[0]
    my = lax.axis_index(axis_name)
    res = 1 << levels
    rb = res // p_dev              # finest bucket-level band x-slabs
    p = 2 * radius - 1             # M2L halo slabs
    rr = radius - 1                # near-field halo slabs
    row0 = my * rb
    # Deep-overflow chain under banding (3D instance of parallel/tree.py's
    # scheme): the octree pyramid extends past the bucket level; the deep
    # levels band exactly like the bucket levels, and hot-window targets
    # take the deep path.
    deep = deep_levels if deep_levels > levels else 0
    build_levels = deep if deep else levels
    res_b = 1 << build_levels      # finest build resolution
    rb_b = res_b // p_dev
    row0_b = my * rb_b

    ext = _extract_heavy_outliers(pos, mass)
    is_out, out_i, out_sel = ext["is_out"], ext["out_i"], ext["out_sel"]
    tree_mass, bulk_pos = ext["tree_mass"], ext["bulk_pos"]

    corner, size = _bounding_cube(bulk_pos)
    u = (bulk_pos - corner) / size
    ci_f = jnp.clip((u * res_b).astype(jnp.int32), 0, res_b - 1)  # [N, 3]
    ci = ci_f >> (build_levels - levels) if deep else ci_f
    flat = (ci[:, 0] * res + ci[:, 1]) * res + ci[:, 2]

    # ---------------- pyramid: banded build + coarse replication --------
    # One fused [N, 10]-payload scatter of ALL particles into my band's
    # slabs at the finest BUILD level (out-of-band indices drop); pool up
    # while the band can still host a halo; all_gather the coarsest
    # sharded level (tiny) and pool the replicated remainder.
    wrow = ci_f[:, 0] - row0_b
    in_rows = (wrow >= 0) & (wrow < rb_b)
    bflat = jnp.where(in_rows,
                      (wrow * res_b + ci_f[:, 1]) * res_b + ci_f[:, 2],
                      rb_b * res_b * res_b)                  # OOB drops

    shard_levels = [l for l in range(2, build_levels + 1)
                    if (1 << l) % p_dev == 0 and (1 << l) // p_dev >= p]
    ls = min(shard_levels)         # contiguous {ls..build} by monotonicity

    # Per-channel grids throughout (channel-last [.., 10] storage pads
    # 12.8x under TPU tiling; see barneshut3d._synth_quad_tuple3): one
    # fused [N, C] scatter, column-sliced per channel, strided pooling.
    c_ch = 4 if deep else 10
    gflat = (jnp.zeros((rb_b * res_b * res_b, c_ch), pos.dtype)
             .at[bflat].add(_moment_payload3(bulk_pos, tree_mass)[:, :c_ch],
                            mode="drop"))
    chans = tuple(gflat[:, i].reshape(rb_b, res_b, res_b)
                  for i in range(c_ch))
    if deep:
        # Deep-mode build: 4-channel scatter + synthesized quadrupoles
        # (matches barneshut3d._build_pyramid3(synth_quad)).
        from nbodysim_tpu.physics.barneshut3d import _synth_quad_tuple3

        chans = _synth_quad_tuple3(chans)
    band_grids = {build_levels: chans}
    for l in range(build_levels - 1, ls - 1, -1):
        band_grids[l] = tuple(_pool2x3(g) for g in band_grids[l + 1])

    full_grids = {}
    if ls > 2:
        full = tuple(lax.all_gather(g, axis_name, tiled=True)
                     for g in band_grids[ls])          # [2^ls, 2^ls, 2^ls]
        for l in range(ls - 1, 1, -1):
            full = tuple(_pool2x3(g) for g in full)
            full_grids[l] = full

    # ---------------- downward pass: M2L + L2L --------------------------
    local = None
    for l in range(2, ls):                       # replicated coarse levels
        terms = _m2l_level3(full_grids[l], corner, size, eps_sq, radius)
        if local is None:
            local = terms
        else:
            up = _l2l_upsample3(local, size / (1 << l))
            local = tuple(u + t for u, t in zip(up, terms))

    local_bucket = None
    for l in range(ls, build_levels + 1):        # banded levels
        r_l = 1 << l
        rb_l = r_l // p_dev
        row0_l = my * rb_l
        window = _halo_window3(band_grids[l], p, p_dev, axis_name)
        if rb_l % 2 == 0:
            # MXU contraction form (same math as the single-chip
            # _m2l_level3, so banded == single-chip to roundoff): strip
            # the y/z halo, keep 2(R-1) of the p x-halo slabs.
            qh = radius - 1
            gxt = tuple(
                w[p - 2 * qh: p + rb_l + 2 * qh, p: p + r_l, p: p + r_l]
                for w in window)
            terms = _m2l_conv3(gxt, corner, size, r_l, eps_sq, radius,
                               row0=row0_l, rows=rb_l)
        else:
            terms = _m2l_stencil3(window, corner, size, r_l, eps_sq,
                                  radius, row0=row0_l, rows=rb_l)
        if local is None:                        # ls == 2: no coarse prefix
            local = terms
        elif l == ls:
            # Transition: slice my band's parent slabs out of the
            # replicated level-(ls-1) expansion, then re-center.
            rb_par = rb_l // 2
            par = tuple(
                lax.dynamic_slice_in_dim(x, my * rb_par, rb_par, axis=0)
                for x in local)
            up = _l2l_upsample3(par, size / r_l)
            local = tuple(u + t for u, t in zip(up, terms))
        else:
            up = _l2l_upsample3(local, size / r_l)
            local = tuple(u + t for u, t in zip(up, terms))
        if l == levels:
            local_bucket = local                 # snapshot the bucket level
    local_deep = local if deep else None
    local = local_bucket

    # ---------------- far + near field over the sorted window set -------
    # Same compacted-window design as the 2D banded tree (parallel/
    # tree.py:_field_stage, which documents the per-device cost model and
    # the slot-parity argument): the global cell argsort, bucket scatter,
    # L2P and near gathers run on a static capacity-C compaction of the
    # band+halo slab particles (O(N) cumsum+scatter to pick them,
    # O(C log C) to sort); a lax.cond falls back to the full-length sort
    # when clustering overfills the capacity. Both branches return the
    # same [N, 3] band contribution — exact at any distribution.
    s_l = size / res
    rows_w = rb + 2 * rr
    flat_nf = jnp.where(is_out, res**3 + jnp.arange(n), flat)
    loc19 = jnp.stack(local, axis=0).reshape(19, rb * res * res)

    def _field_stage(src, valid_s):
        ll = src.shape[0]
        srcc = jnp.minimum(src, n - 1)
        flat_s = jnp.where(valid_s, flat_nf[srcc],
                           jnp.int32(res**3) + n)
        first = sorted_first_occurrence(flat_s)
        slot = jnp.arange(ll, dtype=jnp.int32) - first.astype(jnp.int32)
        in_cap = slot < near_cap
        slot_w = jnp.where(in_cap, slot, near_cap)

        pos_s = pos[srcc]
        mass_s = tree_mass[srcc]
        ci_s = ci[srcc]
        is_bulk_s = valid_s & (flat_s < res**3)

        wrow_nf = ci_s[:, 0] - row0 + rr
        in_win = is_bulk_s & (wrow_nf >= 0) & (wrow_nf < rows_w)
        wflat = jnp.where(in_win,
                          (wrow_nf * res + ci_s[:, 1]) * res + ci_s[:, 2],
                          rows_w * res * res)

        zero_m = jnp.where(in_cap, mass_s, 0.0)
        brow = ci_s[:, 0] - row0
        g_mask = is_bulk_s & (brow >= 0) & (brow < rb) & in_cap
        slot_c = jnp.minimum(slot, near_cap - 1)

        if nf_pallas and rr >= 1:
            # Scatter straight into the kernel's slot-major flat layout
            # (barneshut3d._near_field_buckets3 — same fast path,
            # band-sized).
            from nbodysim_tpu.kernels.nearfield import (
                _FlatLayout3, bucket_stencil3_pallas_flat)

            layout = _FlatLayout3(rb, res, near_cap, rr, 512)
            cy, cz = ci_s[:, 1], ci_s[:, 2]
            pf = jnp.where(in_win, layout.flat_index(wrow_nf, cy, cz),
                           layout.f_len)

            def scat_f(v):
                return (jnp.zeros((near_cap, layout.f_len), pos.dtype)
                        .at[slot_w, pf].set(v, mode="drop"))

            outx, outy, outz = bucket_stencil3_pallas_flat(
                scat_f(pos_s[:, 0]), scat_f(pos_s[:, 1]),
                scat_f(pos_s[:, 2]),
                scat_f(zero_m), layout, eps_sq=eps_sq,
                interpret=interpret)
            opos = jnp.minimum(
                jnp.where(g_mask,
                          layout.out_index(jnp.clip(brow, 0, rb - 1),
                                           cy, cz),
                          0),
                outx.shape[1] - 1)
            ax_s = jnp.where(g_mask, outx[slot_c, opos], 0.0)
            ay_s = jnp.where(g_mask, outy[slot_c, opos], 0.0)
            az_s = jnp.where(g_mask, outz[slot_c, opos], 0.0)
        else:
            def nf_scat(vals):
                return (jnp.zeros((rows_w * res * res, near_cap),
                                  pos.dtype)
                        .at[wflat, slot_w].set(vals, mode="drop")
                        .reshape(rows_w, res, res, near_cap))

            accx, accy, accz = _bucket_stencil3(
                nf_scat(pos_s[:, 0]), nf_scat(pos_s[:, 1]),
                nf_scat(pos_s[:, 2]), nf_scat(zero_m), rr, eps_sq,
                center_rows=rb)                       # [rb, res, res, K]
            gidx = ((jnp.clip(brow, 0, rb - 1) * res + ci_s[:, 1]) * res
                    + ci_s[:, 2])
            flatten = (rb * res * res, near_cap)
            ax_s = jnp.where(g_mask, accx.reshape(flatten)[gidx, slot_c],
                             0.0)
            ay_s = jnp.where(g_mask, accy.reshape(flatten)[gidx, slot_c],
                             0.0)
            az_s = jnp.where(g_mask, accz.reshape(flatten)[gidx, slot_c],
                             0.0)
        acc_s = jnp.stack([ax_s, ay_s, az_s], axis=-1)    # sorted order

        # ---- per-band overflow residual --------------------------------
        # Band-decomposed exactly like the 2D version (parallel/tree.py):
        # every (target, overflow-source) direction is computed on exactly
        # one device; capacity is per band, so the banded tree tolerates
        # P x more clustering than the single chip before degrading.
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

        # ---- far-field L2P on band slabs of the window set -------------
        cellx, celly, cellz = ci_s[:, 0], ci_s[:, 1], ci_s[:, 2]
        lr = jnp.clip(brow, 0, rb - 1)
        centx = corner[0] + (cellx.astype(pos.dtype) + 0.5) * s_l
        centy = corner[1] + (celly.astype(pos.dtype) + 0.5) * s_l
        centz = corner[2] + (cellz.astype(pos.dtype) + 0.5) * s_l
        dxp = pos_s[:, 0] - centx
        dyp = pos_s[:, 1] - centy
        dzp = pos_s[:, 2] - centz
        g = loc19[:, (lr * res + celly) * res + cellz]      # [19, L]
        ev = _taylor_eval3(tuple(g[i] for i in range(19)), dxp, dyp, dzp)
        far = jnp.stack(ev[:3], axis=-1)
        total = g_const * (jnp.where(tgt_band[:, None], far, 0.0)
                           + acc_s)
        return (jnp.zeros((n, 3), pos.dtype)
                .at[jnp.where(valid_s, src, n)]
                .add(jnp.where(valid_s[:, None], total, 0.0),
                     mode="drop"))

    in_win_u = ((~is_out) & (ci[:, 0] - row0 >= -rr)
                & (ci[:, 0] - row0 < rb + rr))
    c_cap = compact_capacity(n, rows_w, res)
    all_valid = jnp.ones((n,), bool)
    # Deep mode runs the same slab field stage (residual statically
    # skipped; deep targets overwritten below), so the compact window
    # applies there too (see parallel/tree.py).
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
                             jnp.int32(res**3) + n)
            oc = jnp.argsort(keys)
            return _field_stage(widx[oc], widx[oc] < n)

        def full_stage(_):
            return _field_stage(jnp.argsort(flat_nf), all_valid)

        contrib = lax.cond(n_win <= c_cap, compact_stage, full_stage, 0)

    lrow = ci[:, 0] - row0
    in_band = (lrow >= 0) & (lrow < rb) & ~is_out

    # ---------------- deep-overflow path (banded) -----------------------
    # Identical target selection to the single chip (occupancy over the
    # full bucket grid is replicated bookkeeping); the deep L2P and the
    # smoothed (2rr+1)^3 deep-cell aggregates run on band slabs only, with
    # an rr-slab ppermute halo for the aggregate window.
    if deep:
        occ = jnp.zeros((res * res * res,), jnp.int32).at[flat_nf].add(
            1, mode="drop")
        hot = (occ > near_cap).reshape(res, res, res)
        hotp = jnp.pad(hot, rr)
        bmask = jnp.zeros((res, res, res), bool)
        for ox in range(2 * rr + 1):
            for oy in range(2 * rr + 1):
                for oz in range(2 * rr + 1):
                    bmask = bmask | hotp[ox:ox + res, oy:oy + res,
                                         oz:oz + res]
        # ~is_out: COM-parked outliers never take the tile/deep path
        # (their rows are discarded), but they used to inflate tile
        # SCORES — up to 4096 phantom targets could displace a
        # genuinely hot tile from the top-T set (r3 review).
        b_par = bmask.reshape(-1)[flat] & ~is_out              # [N]

        # Fold the cheb>=2 aggregate shell into the deep locals (dense
        # banded stencil) — the tile path below must slice the UN-folded
        # local_deep. radius is static: skip the halo collectives + the
        # padded 10-channel window entirely at the 3D default R=2, where
        # the fold is a no-op (r3 review — XLA DCE of collective-permute
        # is not worth trusting on 20-90 s remote compiles).
        rrd = radius - 1
        if rrd >= 2:
            wring = _halo_window3(band_grids[build_levels], rrd, p_dev,
                                  axis_name)
            local_agg = _fold_aggregate_ring3(
                local_deep, wring, corner, size, res_b, eps_sq, radius,
                row0=row0_b, rows=rb_b)
        else:
            local_agg = local_deep

        # Deep L2P + smoothed aggregates on band particles (deep bands
        # align with bucket bands). Per-particle gather/VPU stages run
        # over a COMPACTED per-band target set (r3; see parallel/tree.py)
        # with an in-jit fallback; collectives (halo windows, the shell
        # fold) stay outside the cond.
        s_d = size / res_b
        rin = min(rrd, 1)
        win4 = _halo_window3(band_grids[build_levels][:4], rin, p_dev,
                             axis_name)
        gpw = jnp.stack(win4, axis=-1)   # [rb_b+2rin, res_b+2rin, .., 4]
        payload = _moment_payload3(pos, tree_mass)
        locd = jnp.stack(local_agg, axis=0).reshape(19, rb_b * res_b**2)

        def deep_eval(pos_s, pay4_s, ci_f_s):
            lrow_d = jnp.clip(ci_f_s[:, 0] - row0_b, 0, rb_b - 1)
            centx_d = corner[0] + (ci_f_s[:, 0].astype(pos.dtype)
                                   + 0.5) * s_d
            centy_d = corner[1] + (ci_f_s[:, 1].astype(pos.dtype)
                                   + 0.5) * s_d
            centz_d = corner[2] + (ci_f_s[:, 2].astype(pos.dtype)
                                   + 0.5) * s_d
            gdi = (lrow_d * res_b + ci_f_s[:, 1]) * res_b + ci_f_s[:, 2]
            gd = locd[:, gdi]                                  # [19, C]
            evd = _taylor_eval3(tuple(gd[i] for i in range(19)),
                                pos_s[:, 0] - centx_d,
                                pos_s[:, 1] - centy_d,
                                pos_s[:, 2] - centz_d)
            far_d = jnp.stack(evd[:3], axis=-1)
            near_d = _deep_near_aggregates3(pos_s, pay4_s, gpw, ci_f_s,
                                            eps_sq, s_d, rin, row0=row0_b)
            return g_const * (far_d + near_d)

        c_deep = compact_capacity(n, rb, res)
        if c_deep >= n:
            deep_part = jnp.where(
                in_band[:, None], deep_eval(pos, payload[:, :4], ci_f),
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
                vals = deep_eval(pos[si], payload[si, :4], ci_f[si])
                sel = valid & b_par[si]
                return contrib.at[jnp.where(sel, si, n)].set(
                    vals, mode="drop")

            def full_deep(contrib):
                deep_part = jnp.where(
                    in_band[:, None],
                    deep_eval(pos, payload[:, :4], ci_f), 0.0)
                return jnp.where((b_par & in_band)[:, None], deep_part,
                                 contrib)

            contrib = lax.cond(n_band <= c_deep, compact_deep, full_deep,
                               contrib)

        # ---- hot-zone tile refinement under banding (3D) ---------------
        # Same scheme as parallel/tree.py: replicated tile selection +
        # chain; the level-D local WINDOW is banded state (band-slice +
        # one small psum); the PER-PARTICLE stages band (r3): each device
        # scatters only its slab's particles into the tile grids (one
        # psum of the [T, Wf^3, 4] moments — every particle scatters from
        # exactly its owner slab) and evaluates refined targets over the
        # same compacted slab set as the deep stage. Application is
        # band-masked so the final psum of contrib stays disjoint.
        tk, tt, tc = tile_params
        if tk:
            from nbodysim_tpu.physics.barneshut3d import (
                _tile_apply3, _tile_chain3, _tile_scatter3)

            hh = radius
            ww = tt + 2 * hh
            tid, tile_slot, orig = _tile_select3(
                ci_f, b_par, build_levels, tt, tc, radius)
            # Per-channel pad + slice (see barneshut3d._tile_refine3: a
            # stacked [rb_b, res_b, res_b, 19] band pads 6.7x under TPU
            # tiling; only the [ww, ww, ww] windows get stacked).
            locbp = tuple(
                jnp.pad(g, ((ww, ww), (hh, hh), (hh, hh)))
                for g in local_deep)

            def slice_band(o):
                st = jnp.clip(o[0] - row0_b + ww, 0, rb_b + ww)
                return jnp.stack(
                    [lax.dynamic_slice(g, (st, o[1] + hh, o[2] + hh),
                                       (ww, ww, ww)) for g in locbp],
                    axis=-1)

            local_w = lax.psum(jax.vmap(slice_band)(orig), axis_name)

            tile_kw = dict(corner=corner, size=size, deep=build_levels,
                           radius=radius, k=tk, t=tt, T=tc)
            if c_deep >= n:
                # No compaction possible: keep the replicated full-length
                # scatter (identical on every device — no psum needed).
                g4k = _tile_scatter3(
                    payload, bulk_pos, ci_f, tile_slot, orig,
                    corner, size, build_levels, radius, tk, tt, tc)
                local_w = _tile_chain3(local_w, g4k, orig, corner, size,
                                       build_levels, radius, eps_sq,
                                       tk, tt, tc)
                refined, far_ref, near_ref = _tile_apply3(
                    pos, payload, bulk_pos, ci_f, b_par, local_w, g4k,
                    tile_slot, orig, eps_sq=eps_sq, **tile_kw)
                ref_part = jnp.where(in_band[:, None],
                                     g_const * (far_ref + near_ref), 0.0)
                contrib = jnp.where((refined & in_band)[:, None],
                                    ref_part, contrib)
            else:
                valid_d = didx < n
                si = jnp.minimum(didx, n - 1)
                pay_band = jnp.where(in_band[:, None], payload, 0.0)

                def compact_grids(_):
                    pay_s = jnp.where(valid_d[:, None], payload[si], 0.0)
                    return _tile_scatter3(
                        pay_s, bulk_pos[si], ci_f[si], tile_slot, orig,
                        corner, size, build_levels, radius, tk, tt, tc,
                        src_mask=valid_d)

                def full_grids(_):
                    return _tile_scatter3(
                        pay_band, bulk_pos, ci_f, tile_slot, orig,
                        corner, size, build_levels, radius, tk, tt, tc,
                        src_mask=in_band)

                g4k = lax.psum(
                    lax.cond(n_band <= c_deep, compact_grids, full_grids,
                             0), axis_name)
                local_w = _tile_chain3(local_w, g4k, orig, corner, size,
                                       build_levels, radius, eps_sq,
                                       tk, tt, tc)

                def compact_apply(contrib):
                    refined_s, far_s, near_s = _tile_apply3(
                        pos[si], payload[si], bulk_pos[si], ci_f[si],
                        b_par[si], local_w, g4k, tile_slot, orig,
                        eps_sq=eps_sq, **tile_kw)
                    sel = valid_d & refined_s
                    vals = g_const * (far_s + near_s)
                    return contrib.at[jnp.where(sel, si, n)].set(
                        vals, mode="drop")

                def full_apply(contrib):
                    refined, far_ref, near_ref = _tile_apply3(
                        pos, payload, bulk_pos, ci_f, b_par, local_w,
                        g4k, tile_slot, orig, eps_sq=eps_sq, **tile_kw)
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
