"""Barnes-Hut/FMM on TPU: a stencil-based multilevel tree code (O(N)).

The reference's Barnes-Hut (Quadtree.hpp) is a pointer-chasing vector tree
with per-insert mutexes — hostile to a vector machine, and a naive
gather-based traversal is HBM-gather-bound on TPU. This implementation is a
full re-design as a kernel-independent FMM over the complete quadtree of a
2^L x 2^L grid, built so that every heavy stage is either a dense
elementwise stencil (static shifts — no gathers) or a single per-particle
gather:

  upward (M2M):  scatter particle mass / mass-weighted positions into the
                 finest grid, 2x2 sum-pool up the pyramid. Cell monopoles
                 sit at the cell COM, so the dipole term vanishes.
  M2L:           per level, for each static V-list offset o (Chebyshev
                 distance in [R, 2R-1]), shift the (mass, COM) grids by o
                 (pad+slice) and accumulate a p=2 local expansion at each
                 target cell center: force F [2], Jacobian J [3], and force
                 Hessian H [4]. Offsets at distance 2R-1 are gated by the
                 parity mask "parent-of-source within parent's near set",
                 which makes cell coverage exactly-once (FMM V-list).
  L2L:           local expansions re-center down the pyramid:
                 F' = F + J d + (1/2) d^T H d,  J' = J + H d,  H' = H.
  L2P:           one gather per particle of (F, J, H) at its finest cell +
                 second-order evaluation at the particle position; the
                 remaining error is the source quadrupole, O((cell/d)^2)
                 relative per accepted cell.
  near field:    the (2R-1)^2 finest-cell neighborhood is resolved
                 particle-particle on a dense bucket grid [r, r, K]
                 (K slots per cell, built from the cell-sorted order):
                 for each static neighbor offset, a broadcast K x K
                 pairwise block — pure VPU work, empty slots carry zero
                 mass so they vanish without masks.

Acceptance radius R (config.bh_accept_radius): R=2 corresponds to the
reference's theta ~= 1 (Simulation.hpp:59), R=3 to theta ~= 0.5. The
derived default is floored at R=3 (accuracy-leaning; see _resolve_radius).

Two exactness safeguards on top of the plain FMM:
  * heavy-hitter extraction — the top-k masses above 0.1% of total mass
    (black holes, galaxy nuclei) are pulled out of the tree and coupled to
    every particle by exact [N, k] direct interaction; a dominant point
    source otherwise amplifies the local-expansion truncation by its force
    magnitude.
  * overflow residual — cells holding more than NEAR_CAP particles spill
    into a compact set handled by an exact near-masked pairwise pass
    (runtime-gated by lax.cond, blocked on both axes), so clustered scenes
    do not silently lose near-field mass.

Accuracy (vs exact direct sum, p=2 local + quadrupole sources): uniform
cloud median 1.1e-2 (R=2) / ~4e-3 (R=3, default, N=1M; level choice and
mass spread barely move it — the truncation error is set by R); disc and
galaxy-merger scenes ~1e-6 (heavy extraction carries the dominant force
exactly). Measured on one v5e chip at N=1M (R=3, auto L=9, Pallas near
field): 269 ms/eval vs 5.04 s for the exact all-pairs kernel — 19x, a
pairs-equivalent rate of 4.1e12/s.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from nbodysim_tpu.config import SimConfig

NEAR_CAP = 16       # bucket slots per finest cell (measured: 366 ms near field
                    # at N=1M vs 580 at K=32; overflow repaired exactly)
_OVERFLOW_CAP = 16384   # compact-residual set size for overflowing cells
_OVERFLOW_SMALL = 1024  # cheap residual tier for mild overflow
_OUTLIER_CAP = 4096     # most-distant particles extracted for exact handling


def _bounding_square(pos: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(corner, size) of a square containing all particles, slightly padded."""
    mn = jnp.min(pos, axis=0)
    mx = jnp.max(pos, axis=0)
    center = 0.5 * (mn + mx)
    size = jnp.max(mx - mn) * 1.0001 + 1e-6
    return center - 0.5 * size, size


def _moment_payload(pos, mass):
    """[N, 6] raw-moment rows: monopole + first + second moments
    (quadrupole about the COM is derived in M2L as Q_ij = r_ij - m c_i c_j;
    raw moments pool additively)."""
    px, py = pos[:, 0], pos[:, 1]
    return jnp.stack(
        (mass, mass * px, mass * py,
         mass * px * px, mass * px * py, mass * py * py), axis=-1)


def _synth_quad_channels(g3):
    """(m, sx, sy) -> 6 raw-moment channels with point-at-COM quadrupoles
    (rxx = sx^2/m, ... — exact for single-particle cells; the COM-centered
    quadrupole of a synthesized cell is identically zero)."""
    m, sx, sy = g3[..., 0], g3[..., 1], g3[..., 2]
    inv = jnp.where(m > 0, 1.0 / jnp.where(m > 0, m, 1.0), 0.0)
    return jnp.stack((m, sx, sy, sx * sx * inv, sx * sy * inv,
                      sy * sy * inv), axis=-1)


def _build_pyramid(pos, mass, levels: int, synth_quad: bool = False):
    """Mass + mass-weighted-position grids for levels L..0 (fine to coarse).

    The 6 moment fields scatter as ONE [N, 6]-payload scatter-add and pool
    as one stacked op per level (6 separate 1M-particle scatters were the
    round-1 build's dominant cost).

    synth_quad=True (deep mode): scatter only (m, sx, sy) — halving the
    scatter, the build's dominant cost at deep grids (0.37 s at N=4M,
    4096^2) — and synthesize the quadrupole channels at the finest level
    as point-at-COM raw moments. At deep-grid occupancy (~0.25
    particles/cell at config 5) most cells hold one particle, where the
    synthesis is exact; pooled upward it represents each finest cell as a
    point at its COM, dropping only the sub-deep-cell spread."""
    corner, size = _bounding_square(pos)
    res = 1 << levels
    u = (pos - corner) / size
    ci = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)     # [N, 2]
    flat = ci[:, 0] * res + ci[:, 1]

    if synth_quad:
        g3 = jnp.zeros((res * res, 3), pos.dtype).at[flat].add(
            _moment_payload(pos, mass)[:, :3]).reshape(res, res, 3)
        g6 = _synth_quad_channels(g3)
    else:
        g6 = jnp.zeros((res * res, 6), pos.dtype).at[flat].add(
            _moment_payload(pos, mass)).reshape(res, res, 6)
    grids = {levels: tuple(g6[:, :, i] for i in range(6))}
    for l in range(levels - 1, -1, -1):
        r = 1 << l
        g6 = g6.reshape(r, 2, r, 2, 6).sum((1, 3))
        grids[l] = tuple(g6[:, :, i] for i in range(6))
    return grids, corner, size, ci, flat


def _m2l_level(grids_l, corner, size, eps_sq, radius: int):
    """V-list pass at one full level -> p=2 local terms (F, J, H).

    Even grids (every real level) run as the parent-level MXU contraction
    (`_m2l_conv`); the scan stencil remains as the oracle / odd-size
    fallback."""
    r = grids_l[0].shape[0]
    if r % 2 == 0 and r >= 2:
        qh = radius - 1
        gx = jnp.pad(jnp.stack(grids_l, axis=-1),
                     ((2 * qh, 2 * qh), (0, 0), (0, 0)))
        return _m2l_conv(gx, corner, size, r, eps_sq, radius,
                         row0=jnp.int32(0), rows=r)
    p = 2 * radius - 1
    window = tuple(jnp.pad(g, p) for g in grids_l)
    return _m2l_stencil(window, corner, size, r, eps_sq, radius,
                        row0=jnp.int32(0), rows=r)


def _m2l_stencil(window, corner, size, r_full: int, eps_sq, radius: int,
                 row0, rows: int, offsets=None, gate_parity: bool = True,
                 pad: int | None = None):
    """V-list stencil over a row window -> p=2 local terms (F, J, H) with
    quadrupole source moments folded into F.

    `window`: the 6 raw moment grids, [rows + 2p, r_full + 2p] each
    (p = 2*radius - 1, or `pad` when given), holding the `rows` target
    rows plus p halo rows on each side (real neighbor data or zeros at the
    global boundary) and p zero columns. `row0` is the global grid row of
    the first target row (traced; the banded multi-chip path passes
    my_band * rows). Output terms are [rows, r_full]. The single-chip
    `_m2l_level` is the rows=r_full, row0=0 instance.

    `offsets`/`gate_parity`/`pad` generalize the stencil beyond the
    V-list: the deep-aggregate RING FOLD passes the outer aggregate-window
    offsets with parity gating off and eps_sq pre-widened by the
    Plummer-cloud smoothing term, turning 16 of the 25 per-particle
    aggregate gathers into this dense stencil (profiled r3: the gathers
    were the dominant config-5 stage at 1.6 s/eval).
    """
    m_w, wx_w, wy_w, rxx_w, rxy_w, ryy_w = window
    s_l = size / r_full
    safe_m = jnp.where(m_w > 0, m_w, 1.0)
    comx = wx_w / safe_m
    comy = wy_w / safe_m
    # Quadrupole about the COM (dipole vanishes by construction).
    qxx = rxx_w - m_w * comx * comx
    qxy = rxy_w - m_w * comx * comy
    qyy = ryy_w - m_w * comy * comy

    dtype = m_w.dtype
    # Target-cell centers in world coordinates (global row = row0 + i).
    ix = (lax.broadcasted_iota(jnp.int32, (rows, r_full), 0)
          + row0).astype(dtype)
    iy = lax.broadcasted_iota(jnp.int32, (rows, r_full), 1).astype(dtype)
    cx = corner[0] + (ix + 0.5) * s_l
    cy = corner[1] + (iy + 0.5) * s_l
    parx = ((lax.broadcasted_iota(jnp.int32, (rows, r_full), 0) + row0) & 1)
    pary = (lax.broadcasted_iota(jnp.int32, (rows, r_full), 1) & 1)

    R = radius
    if offsets is None:
        # Static V-list offsets (Chebyshev distance in [R, 2R-1]), iterated
        # with a lax.scan + dynamic_slice shift so the compiled body is
        # shared across offsets (a fully unrolled stencil made XLA compile
        # for minutes).
        offsets = [(ox, oy)
                   for ox in range(-(2 * R - 1), 2 * R)
                   for oy in range(-(2 * R - 1), 2 * R)
                   if max(abs(ox), abs(oy)) >= R]
    offsets = jnp.array(offsets, jnp.int32)
    p = 2 * R - 1 if pad is None else pad
    m_p = m_w
    sx_p = comx
    sy_p = comy
    qxx_p = qxx
    qxy_p = qxy
    qyy_p = qyy

    def body(carry, o):
        fx, fy, jxx, jxy, jyy, hxxx, hxxy, hxyy, hyyy = carry
        ox, oy = o[0], o[1]
        start = (p + ox, p + oy)
        shape = (rows, r_full)
        ms = lax.dynamic_slice(m_p, start, shape)
        sx = lax.dynamic_slice(sx_p, start, shape)
        sy = lax.dynamic_slice(sy_p, start, shape)
        sqxx = lax.dynamic_slice(qxx_p, start, shape)
        sqxy = lax.dynamic_slice(qxy_p, start, shape)
        sqyy = lax.dynamic_slice(qyy_p, start, shape)
        if gate_parity:
            # Boundary ring (cheb == 2R-1): only when the source's parent
            # lies in the parent's near set (exactly-once coverage).
            # Depends only on cell parity — a 2x2 pattern.
            cheb = jnp.maximum(jnp.abs(ox), jnp.abs(oy))
            pxo = (ox + parx) >> 1       # floor((ox + parity)/2)
            pyo = (oy + pary) >> 1
            pm_ok = (jnp.abs(pxo) <= R - 1) & (jnp.abs(pyo) <= R - 1)
            keep = (cheb < 2 * R - 1) | pm_ok
            ms = jnp.where(keep, ms, 0.0)
            sqxx = jnp.where(keep, sqxx, 0.0)
            sqxy = jnp.where(keep, sqxy, 0.0)
            sqyy = jnp.where(keep, sqyy, 0.0)

        dx = sx - cx
        dy = sy - cy
        q = dx * dx + dy * dy + eps_sq
        inv = lax.rsqrt(q)
        inv3 = inv * inv * inv
        inv5 = inv3 * inv * inv
        inv7 = inv5 * inv * inv
        w3 = ms * inv3
        w5 = 3.0 * ms * inv5
        # Second force derivatives (p=2 local term):
        # H_ijk = m [15 d_i d_j d_k q^{-7/2}
        #            - 3 (d_ij d_k + d_ik d_j + d_jk d_i) q^{-5/2}]
        # Unit-mass third-derivative tensors (shared by H accumulation and
        # the quadrupole contraction): T_ijk = 15 d_i d_j d_k q^{-7/2}
        #   - 3 (delta_ij d_k + delta_ik d_j + delta_jk d_i) q^{-5/2}
        u7 = 15.0 * inv7
        u5 = 3.0 * inv5
        txxx = u7 * dx * dx * dx - 3.0 * u5 * dx
        txxy = u7 * dx * dx * dy - u5 * dy
        txyy = u7 * dx * dy * dy - u5 * dx
        tyyy = u7 * dy * dy * dy - 3.0 * u5 * dy
        # Quadrupole source term (Taylor of the kernel about the COM; the
        # dipole vanishes): F_i += 1/2 Q_jk T_ijk.
        fq_x = 0.5 * (sqxx * txxx + 2.0 * sqxy * txxy + sqyy * txyy)
        fq_y = 0.5 * (sqxx * txxy + 2.0 * sqxy * txyy + sqyy * tyyy)
        return (fx + w3 * dx + fq_x, fy + w3 * dy + fq_y,
                jxx + w5 * dx * dx - w3,
                jxy + w5 * dx * dy,
                jyy + w5 * dy * dy - w3,
                hxxx + ms * txxx,
                hxxy + ms * txxy,
                hxyy + ms * txyy,
                hyyy + ms * tyyy), None

    zeros = jnp.zeros((rows, r_full), dtype)
    out, _ = lax.scan(body, (zeros,) * 9, offsets)
    return out


# ---------------------------------------------------------------------------
# M2L as one MXU contraction — the 2D instance of the design documented at
# length in barneshut3d.py (_m2l_conv3): cell-center moments make the
# V-list translation-invariant, and the space-to-depth (parent-level) view
# makes the parity-gated ring exact with taps at |PO|_inf <= R_parent - 1.
# 2D shapes: 6 moment channels (m, d_x, d_y, Q_xx, Q_xy, Q_yy) x 4
# children = 24 in, 9 local terms x 4 children = 36 out, (2Rp-1)^2 taps.
# ---------------------------------------------------------------------------


def _m2l_conv_weights(radius: int, r_parent: int, eps_sq_hat, dtype):
    """[(2Rp-1)^2, 24, 36] tap weights W[PO, f*6+c_in, e*9+t_out].

    Scale-free (offsets in cell units, eps_sq_hat = eps_sq / s_l^2; the
    caller scales outputs by s_l^-(2,3,4) per term class) — see
    barneshut3d._m2l_conv_weights3. Includes the rank-4 tensor couplings
    (dipole->H, quadrupole->J) that the COM form carries implicitly."""
    import numpy as np

    from nbodysim_tpu.physics.barneshut3d import _m2l_conv_taps

    po, el, fl, O = _m2l_conv_taps(radius, r_parent, 2)
    r = jnp.asarray(O).astype(dtype)                           # [T, 2]
    rx, ry = r[:, 0], r[:, 1]
    q = rx * rx + ry * ry + eps_sq_hat
    inv = lax.rsqrt(q)
    inv3 = inv * inv * inv
    inv5 = inv3 * inv * inv
    inv7 = inv5 * inv * inv
    inv9 = inv7 * inv * inv
    x2, y2 = rx * rx, ry * ry

    txxx = 15.0 * x2 * rx * inv7 - 9.0 * rx * inv5
    txxy = 15.0 * x2 * ry * inv7 - 3.0 * ry * inv5
    txyy = 15.0 * rx * y2 * inv7 - 3.0 * rx * inv5
    tyyy = 15.0 * y2 * ry * inv7 - 9.0 * ry * inv5
    uxxxx = -105.0 * x2 * x2 * inv9 + 90.0 * x2 * inv7 - 9.0 * inv5
    uyyyy = -105.0 * y2 * y2 * inv9 + 90.0 * y2 * inv7 - 9.0 * inv5
    uxxxy = -105.0 * x2 * rx * ry * inv9 + 45.0 * rx * ry * inv7
    uxyyy = -105.0 * y2 * rx * ry * inv9 + 45.0 * rx * ry * inv7
    uxxyy = -105.0 * x2 * y2 * inv9 + 15.0 * (x2 + y2) * inv7 - 3.0 * inv5

    def row(f2, j3, h4):
        return jnp.stack(tuple(f2) + tuple(j3) + tuple(h4), axis=-1)

    row_m = row(
        (inv3 * rx, inv3 * ry),
        (3.0 * x2 * inv5 - inv3, 3.0 * rx * ry * inv5,
         3.0 * y2 * inv5 - inv3),
        (txxx, txxy, txyy, tyyy))
    row_dx = row(
        (inv3 - 3.0 * x2 * inv5, -3.0 * rx * ry * inv5),
        (-txxx, -txxy, -txyy),
        (uxxxx, uxxxy, uxxyy, uxyyy))
    row_dy = row(
        (-3.0 * rx * ry * inv5, inv3 - 3.0 * y2 * inv5),
        (-txxy, -txyy, -tyyy),
        (uxxxy, uxxyy, uxyyy, uyyyy))
    zero = jnp.zeros_like(rx)
    zeros4 = (zero,) * 4

    def qrow(mult, t2, u3):
        h = 0.5 * mult
        return row((h * t2[0], h * t2[1]),
                   tuple(-h * u for u in u3), zeros4)

    row_qxx = qrow(1.0, (txxx, txxy), (uxxxx, uxxxy, uxxyy))
    row_qxy = qrow(2.0, (txxy, txyy), (uxxxy, uxxyy, uxyyy))
    row_qyy = qrow(1.0, (txyy, tyyy), (uxxyy, uxyyy, uyyyy))

    B = jnp.stack((row_m, row_dx, row_dy, row_qxx, row_qxy, row_qyy),
                  axis=1)                                       # [T, 6, 9]
    k2 = (2 * r_parent - 1) ** 2
    ci = fl[:, None, None] * 6 + np.arange(6)[None, :, None]
    ti = el[:, None, None] * 9 + np.arange(9)[None, None, :]
    pb = np.broadcast_to(po[:, None, None], ci.shape)
    return jnp.zeros((k2, 24, 36), dtype).at[pb, ci, ti].set(B)


def _center_channels(g6, corner, size, r_full: int, x0):
    """Raw origin moments [X, r, 6] -> moments about each cell's own
    center in CELL UNITS: (m, d/s_l, Q/s_l^2). x0 = global row of row 0."""
    dtype = g6.dtype
    s_l = size / r_full
    inv_s = 1.0 / s_l
    shape = g6.shape[:2]
    cx = corner[0] + (lax.broadcasted_iota(jnp.int32, shape, 0) + x0
                      ).astype(dtype) * s_l + 0.5 * s_l
    cy = corner[1] + (lax.broadcasted_iota(jnp.int32, shape, 1)
                      ).astype(dtype) * s_l + 0.5 * s_l
    m = g6[..., 0]
    sx, sy = g6[..., 1], g6[..., 2]
    inv2 = inv_s * inv_s
    return jnp.stack(
        (m,
         (sx - m * cx) * inv_s,
         (sy - m * cy) * inv_s,
         (g6[..., 3] - 2.0 * cx * sx + m * cx * cx) * inv2,
         (g6[..., 4] - cx * sy - cy * sx + m * cx * cy) * inv2,
         (g6[..., 5] - 2.0 * cy * sy + m * cy * cy) * inv2), axis=-1)


def _m2l_conv(gx, corner, size, r_full: int, eps_sq, radius: int,
              row0, rows: int, r_parent: int | None = None):
    """One 2D M2L level as the parent-level MXU contraction.

    gx: [rows + 4(Rp-1), r_full, 6] raw moment row-window whose first and
    last 2(Rp-1) rows are halo (zeros beyond the grid); its row 0 is
    global row row0 - 2(Rp-1). row0 and rows must be even. Returns the 9
    local terms, [rows, r_full] each."""
    R = radius
    Rp = radius if r_parent is None else r_parent
    qh = Rp - 1
    h = r_full // 2
    hb = rows // 2
    dtype = gx.dtype

    ch = _center_channels(gx, corner, size, r_full, row0 - 2 * qh)
    X = rows + 4 * qh
    m4 = (ch.reshape(X // 2, 2, h, 2, 6)
          .transpose(0, 2, 1, 3, 4)
          .reshape(X // 2, h, 24))
    m4 = jnp.pad(m4, ((0, 0), (qh, qh), (0, 0)))
    s_l = size / r_full
    W = _m2l_conv_weights(R, Rp, eps_sq / (s_l * s_l), dtype)

    k = 2 * Rp - 1
    # One k x k VALID convolution instead of a scan of k^2 shifted
    # dot_generals: the scan re-reads the full parent-level window from
    # HBM per tap (bandwidth-bound at the 4096^2 deep level — measured
    # 0.265 s/eval scan vs 0.228 s conv at r=4096, R=3, HIGHEST; err
    # 8e-7, scripts/exp_m2l_conv.py). Deep levels (r >= 1024) run the
    # contraction at HIGH (bf16x3): 0.189 vs 0.227 s/eval at 4096^2 for
    # 2.2e-5 relative error on the local terms — two decades below the
    # level's PM-smoothing/truncation budget (r4, exp_m2l_conv.py C).
    # Shallow levels keep HIGHEST (cheap there; they carry the
    # large-scale force the drift gate integrates).
    prec = (lax.Precision.HIGH if r_full >= 1024
            else lax.Precision.HIGHEST)
    out = lax.conv_general_dilated(
        m4[None], W.reshape(k, k, 24, 36), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec)[0].reshape(hb * h, 36)
    inv_s = 1.0 / s_l
    s2 = inv_s * inv_s
    scales = (s2, s2, s2 * inv_s, s2 * inv_s, s2 * inv_s,
              s2 * s2, s2 * s2, s2 * s2, s2 * s2)
    # De-space-to-depth PER TERM with 2D interleaves. The previous
    # one-shot [hb, h, 2, 2, 9] transpose + [rows, r_full, 1] slices made
    # XLA pick T(8,128) layouts whose tiny minor dims pad up to 128x —
    # measured as an 8 GB HLO temp at the 4096^2 deep level (the r3
    # config-5 HBM OOM). Column slices of the channel-minor accumulator +
    # [hb, h]-shaped stacks keep every temp at its unpadded size.
    terms = []
    for t in range(9):
        a = [[out[:, (2 * c + d) * 9 + t].reshape(hb, h) for d in (0, 1)]
             for c in (0, 1)]
        r0 = jnp.stack([a[0][0], a[0][1]], axis=-1).reshape(hb, r_full)
        r1 = jnp.stack([a[1][0], a[1][1]], axis=-1).reshape(hb, r_full)
        terms.append(jnp.stack([r0, r1], axis=1).reshape(rows, r_full)
                     * scales[t])
    return tuple(terms)


def _l2l_upsample(local, s_child):
    """Shift parent local expansions to the 4 child centers and upsample.

    p=2 re-centering: F' = F + J d + (1/2) d^T H d, J' = J + H d, H' = H.

    Handles rectangular grids too: the banded multi-chip tree upsamples a
    [rows, cols] row band (parallel/tree.py); the parity trick needs the
    band's first global row to be even, which banding guarantees (bands
    start at my * rb with rb even).
    """
    fx, fy, jxx, jxy, jyy, hxxx, hxxy, hxyy, hyyy = local
    r0, r1 = fx.shape

    def up(a):
        return jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1)

    fxu, fyu = up(fx), up(fy)
    jxxu, jxyu, jyyu = up(jxx), up(jxy), up(jyy)
    hxxxu, hxxyu, hxyyu, hyyyu = up(hxxx), up(hxxy), up(hxyy), up(hyyy)
    # Child-center offset from parent center: (+-1/2) s_child by parity.
    shape2 = (2 * r0, 2 * r1)
    ex = ((lax.broadcasted_iota(jnp.int32, shape2, 0) & 1)
          .astype(fx.dtype) - 0.5) * s_child
    ey = ((lax.broadcasted_iota(jnp.int32, shape2, 1) & 1)
          .astype(fx.dtype) - 0.5) * s_child
    fxc = (fxu + jxxu * ex + jxyu * ey
           + 0.5 * (hxxxu * ex * ex + 2 * hxxyu * ex * ey + hxyyu * ey * ey))
    fyc = (fyu + jxyu * ex + jyyu * ey
           + 0.5 * (hxxyu * ex * ex + 2 * hxyyu * ex * ey + hyyyu * ey * ey))
    jxxc = jxxu + hxxxu * ex + hxxyu * ey
    jxyc = jxyu + hxxyu * ex + hxyyu * ey
    jyyc = jyyu + hxyyu * ex + hyyyu * ey
    return fxc, fyc, jxxc, jxyc, jyyc, hxxxu, hxxyu, hxyyu, hyyyu


def _taylor_eval(g9, dxp, dyp):
    """p=2 Taylor evaluation of the 9 local terms (F, J, H) at in-cell
    offsets (dxp, dyp): a = F + J d + (1/2) d^T H d per component. The
    single shared implementation for every L2P-style evaluation
    (bucket/deep L2P, tile apply, banded field stages) — the 2D analogue
    of barneshut3d._taylor_eval3."""
    fx, fy, jxx, jxy, jyy, hxxx, hxxy, hxyy, hyyy = g9
    ax = (fx + jxx * dxp + jxy * dyp
          + 0.5 * (hxxx * dxp * dxp + 2 * hxxy * dxp * dyp
                   + hxyy * dyp * dyp))
    ay = (fy + jxy * dxp + jyy * dyp
          + 0.5 * (hxxy * dxp * dxp + 2 * hxyy * dxp * dyp
                   + hyyy * dyp * dyp))
    return ax, ay


def _near_masked_blocked(tgt_pos, tgt_cell, src_pos, src_mass, src_cell,
                         eps_sq, rr1: int):
    """Near-cell-masked pairwise accs (cheb(cells) <= rr1), blocked over
    BOTH axes so the pair temp stays [<=2048, <=2048] regardless of set
    sizes. Shared by the single-chip overflow residual, the banded
    multi-chip one (parallel/tree.py), and the 3D octree (barneshut3d.py) —
    dim-agnostic."""
    from nbodysim_tpu.core.blocking import pairwise_blocked

    def kernel(tgt, src):
        tpb, tcb = tgt
        spb, smb, scb = src
        d = spb[None, :, :] - tpb[:, None, :]
        d_sq = jnp.sum(d * d, axis=-1)
        cheb = jnp.max(
            jnp.abs(scb[None, :, :] - tcb[:, None, :]), axis=-1)
        inv = lax.rsqrt(d_sq + eps_sq)
        w = smb[None, :] * (inv * inv * inv)
        # Zero-padded source rows carry mass 0 and are inert.
        w = jnp.where((cheb <= rr1) & (d_sq > 0.0), w, 0.0)
        return (jnp.einsum("ts,tsd->td", w, d),)

    (acc,) = pairwise_blocked(
        kernel, (tgt_pos, tgt_cell), (src_pos, src_mass, src_cell),
        out_dims=((tgt_pos.shape[1],),), dtype=tgt_pos.dtype,
        bs_t=2048, bs_s=2048)
    return acc


def _bucket_stencil(bx, by, bm, rr: int, eps_sq, center_rows: int):
    """K x K pair stencil over a dense bucket grid with rr halo rows.

    bx/by/bm: [center_rows + 2*rr, res, cap]. Target cells are the center
    row slice [rr : rr + center_rows]; the halo rows (zeros at the global
    boundary / single chip, neighbor-band bucket data in the banded
    multi-chip path, parallel/tree.py) act as sources only. For each of the
    (2rr+1)^2 static neighbor offsets, a broadcast K x K pairwise block —
    pure VPU work, empty slots carry zero mass so they vanish without
    masks. Returns (accx, accy), [center_rows, res, cap] each (unscaled by
    g_const).
    """
    rows_w, res, cap = bx.shape
    dtype = bx.dtype
    tx = lax.slice_in_dim(bx, rr, rr + center_rows)
    ty = lax.slice_in_dim(by, rr, rr + center_rows)

    offsets = jnp.array(
        [(ox, oy) for ox in range(-rr, rr + 1) for oy in range(-rr, rr + 1)],
        jnp.int32,
    )
    bx_p = jnp.pad(bx, ((0, 0), (rr, rr), (0, 0)))
    by_p = jnp.pad(by, ((0, 0), (rr, rr), (0, 0)))
    bm_p = jnp.pad(bm, ((0, 0), (rr, rr), (0, 0)))

    # Row-chunked K x K pair blocks: a full [rows, res, K, K] temp is
    # O(rows * res * K^2) (17 GB at r=2048, K=32) — chunk rows so temps
    # stay ~100 MB.
    chunk = max(1, min(center_rows, (1 << 26) // max(1, res * cap * cap)))
    while center_rows % chunk:
        chunk -= 1
    n_chunks = center_rows // chunk

    def body(carry, o):
        accx, accy = carry
        start = (rr + o[0], rr + o[1], 0)
        sxg = lax.dynamic_slice(bx_p, start, (center_rows, res, cap))
        syg = lax.dynamic_slice(by_p, start, (center_rows, res, cap))
        smg = lax.dynamic_slice(bm_p, start, (center_rows, res, cap))

        def chunk_fn(args):
            bxc, byc, sxc, syc, smc = args        # [chunk, res, cap]
            dx = sxc[:, :, None, :] - bxc[:, :, :, None]
            dy = syc[:, :, None, :] - byc[:, :, :, None]
            d_sq = dx * dx + dy * dy
            inv = lax.rsqrt(d_sq + eps_sq)
            w = smc[:, :, None, :] * (inv * inv * inv)
            if eps_sq == 0.0:
                w = jnp.where(d_sq > 0.0, w, 0.0)
            return jnp.sum(w * dx, axis=-1), jnp.sum(w * dy, axis=-1)

        def chop(a):
            return a.reshape(n_chunks, chunk, res, cap)

        ax, ay = lax.map(
            chunk_fn, (chop(tx), chop(ty), chop(sxg), chop(syg), chop(smg)))
        return (accx + ax.reshape(center_rows, res, cap),
                accy + ay.reshape(center_rows, res, cap)), None

    zeros = jnp.zeros((center_rows, res, cap), dtype)
    (accx, accy), _ = lax.scan(body, (zeros, zeros), offsets)
    return accx, accy


def _bucket_stencil_dispatch(bx, by, bm, rr, eps_sq, center_rows,
                             use_pallas: bool, interpret: bool):
    """XLA stencil (the oracle / CPU path) or the Pallas slab kernel
    (kernels/nearfield.py, the TPU hot path) — same contract."""
    if use_pallas and rr >= 1:
        from nbodysim_tpu.kernels.nearfield import bucket_stencil_pallas

        return bucket_stencil_pallas(
            bx, by, bm, rr=rr, eps_sq=eps_sq, center_rows=center_rows,
            interpret=interpret)
    return _bucket_stencil(bx, by, bm, rr, eps_sq, center_rows)


def _near_field_buckets(pos, mass, ci, flat, levels: int, eps_sq, g_const,
                        cap: int, radius: int,
                        use_pallas: bool = False, interpret: bool = False,
                        skip_residual: bool = False):
    """Particle-particle near field on a dense [r, r, cap] bucket grid.

    skip_residual=True drops the overflow-residual passes entirely (the
    deep-overflow multipole path covers overflow targets instead).
    Returns (acc [N, 2], overflow_count)."""
    n = pos.shape[0]
    res = 1 << levels

    order = jnp.argsort(flat)
    flat_s = flat[order]
    # Slot of each particle inside its cell = rank - first-rank-of-cell.
    from nbodysim_tpu.core.blocking import sorted_first_occurrence

    first = sorted_first_occurrence(flat_s)
    slot = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    overflow = jnp.sum(slot >= cap)
    in_cap = slot < cap
    slot_c = jnp.minimum(slot, cap - 1)

    pos_s = pos[order]
    mass_s = mass[order]
    zero_m = jnp.where(in_cap, mass_s, 0.0)

    # Unique (cell, slot) destinations: no scatter conflicts. Overflow
    # particles scatter out of bounds (slot=cap) and are dropped — never
    # clobbering the last in-cap slot.
    slot_w = jnp.where(in_cap, slot, cap)
    rr = radius - 1
    if use_pallas and rr >= 1:
        # TPU hot path: scatter STRAIGHT into the kernel's slot-major flat
        # layout [K, F] (no [rows, res, K] grid, no transpose; minor dims
        # stay large so TPU tiling doesn't blow up).
        from nbodysim_tpu.kernels.nearfield import (
            _FlatLayout, bucket_stencil_pallas_flat)

        layout = _FlatLayout(res, res, cap, rr, 1024)
        row = flat_s // res
        col = flat_s % res
        ok = flat_s < res * res
        pf = jnp.where(ok, layout.flat_index(row + rr, col), layout.f_len)

        def scat_f(v):
            return (jnp.zeros((cap, layout.f_len), pos.dtype)
                    .at[slot_w, pf].set(v, mode="drop"))

        outx, outy = bucket_stencil_pallas_flat(
            scat_f(pos_s[:, 0]), scat_f(pos_s[:, 1]), scat_f(zero_m),
            layout, eps_sq=eps_sq, interpret=interpret)
        opos = jnp.minimum(jnp.where(ok, layout.out_index(row, col), 0),
                           outx.shape[1] - 1)
        keep = in_cap & ok
        ax_s = jnp.where(keep, outx[slot_c, opos], 0.0)
        ay_s = jnp.where(keep, outy[slot_c, opos], 0.0)
    else:
        def scat(v):
            return (jnp.zeros((res * res, cap), pos.dtype)
                    .at[flat_s, slot_w].set(v, mode="drop")
                    .reshape(res, res, cap))

        bx = scat(pos_s[:, 0])
        by = scat(pos_s[:, 1])
        bm = scat(zero_m)
        bx_w = jnp.pad(bx, ((rr, rr), (0, 0), (0, 0)))
        by_w = jnp.pad(by, ((rr, rr), (0, 0), (0, 0)))
        bm_w = jnp.pad(bm, ((rr, rr), (0, 0), (0, 0)))
        accx, accy = _bucket_stencil(bx_w, by_w, bm_w, rr, eps_sq, res)
        accx = accx.reshape(res * res, cap)
        accy = accy.reshape(res * res, cap)
        ax_s = jnp.where(in_cap, accx[flat_s, slot_c], 0.0)
        ay_s = jnp.where(in_cap, accy[flat_s, slot_c], 0.0)
    acc_s = jnp.stack([ax_s, ay_s], axis=-1)

    # --- exact residual for bucket overflow (clustered cells) ----------
    # The bucket pass used only in-cap particles as sources and targets.
    # Gather the overflow set O compactly (static cap) and add:
    #   (b) all targets <- O sources, near-cell-masked
    #   (c) O targets  <- in-cap sources, near-cell-masked
    # O's far-field is already exact (the pyramid holds every particle).
    # Skipped at runtime via lax.cond when nothing overflowed.
    m_cap = min(n, _OVERFLOW_CAP)
    ci_s = ci[order]
    rr1 = radius - 1

    def near_masked_blocked(tgt_pos, tgt_cell, src_pos, src_mass, src_cell):
        return _near_masked_blocked(tgt_pos, tgt_cell, src_pos, src_mass,
                                    src_cell, eps_sq, rr1)

    def residual(cap_k: int):
        def apply(acc_s):
            over = ~in_cap
            o_idx = jnp.argsort(in_cap)[:cap_k]  # overflow-first order
            o_valid = over[o_idx]
            o_pos = pos_s[o_idx]
            o_mass = jnp.where(o_valid, mass_s[o_idx], 0.0)
            o_cell = ci_s[o_idx]
            # (b): every sorted particle gains O's near contribution.
            acc_s = acc_s + near_masked_blocked(
                pos_s, ci_s, o_pos, o_mass, o_cell)
            # (c): O targets gain the in-cap sources' contribution.
            cap_mass = jnp.where(in_cap, mass_s, 0.0)
            o_acc = near_masked_blocked(o_pos, o_cell, pos_s, cap_mass, ci_s)
            return acc_s.at[o_idx].add(
                jnp.where(o_valid[:, None], o_acc, 0.0))

        return apply

    # Two residual tiers: the blocked masked pass costs O(N * cap), so a
    # mild overflow (a few clustered cells) should not pay the full
    # 16384-wide pass (measured 730 ms at N=1M) — lax.cond picks the
    # smallest tier that holds the actual overflow.
    m_small = min(n, _OVERFLOW_SMALL)
    if skip_residual:
        pass
    elif m_small < m_cap:
        acc_s = lax.cond(
            overflow > m_small, residual(m_cap),
            lambda a: lax.cond(overflow > 0, residual(m_small),
                               lambda b: b, a),
            acc_s)
    else:
        acc_s = lax.cond(overflow > 0, residual(m_cap), lambda a: a, acc_s)

    inv_order = jnp.zeros_like(order).at[order].set(jnp.arange(n))
    acc = g_const * acc_s[inv_order]
    return acc, overflow


_HEAVY_K = 64  # max heavy bodies handled by exact direct interaction


def _extract_heavy_outliers(pos, mass):
    """Shared heavy-hitter + outlier extraction (used by the force path,
    the occupancy diagnostic, and the banded multi-chip tree — one
    implementation so the three can never desynchronize).

    Heavy-hitter extraction: dominant point masses (black holes, galaxy
    nuclei) wreck the cell-centered local expansion — their (cell/d)^2
    truncation term scales with their huge force. The top-k masses above
    0.1% of the total leave the tree and couple to everything exactly
    ([N, K] direct pairs, trivial cost). The remaining field is smooth,
    which is what an FMM is good at.

    Outlier extraction: centrally concentrated scenes (Plummer spheres
    have sampled radii out to ~1000 scale lengths) would otherwise set a
    bounding box 100-1000x larger than the bulk, collapsing the core
    into a handful of cells and swamping the near-field buckets. The
    k_out most distant particles (Chebyshev distance from the field COM)
    leave the tree: the grid is built over the remaining bulk, and
    outliers get exact forces from everything. Distant HEAVY bodies also
    leave the grid (an ejected black hole would otherwise inflate the
    bounding square); they keep exact treatment either way.

    Returns a dict with: is_heavy [N], h_pos [K,2], h_mass [K] (zeroed
    where unselected), field_mass [N] (heavies zeroed), is_out [N],
    out_i [k_out], out_sel [k_out], com [2], tree_mass [N] (heavies and
    outliers zeroed — what the pyramid sees), bulk_pos [N,2] (outliers
    parked at the COM so they cannot stretch the bounding square).
    """
    n = pos.shape[0]
    k = min(_HEAVY_K, n)
    top_m, top_i = lax.top_k(mass, k)
    heavy_sel = top_m >= 1e-3 * jnp.sum(mass)
    h_mass = jnp.where(heavy_sel, top_m, 0.0)
    h_pos = pos[top_i]
    is_heavy = jnp.zeros((n,), bool).at[top_i].set(heavy_sel)
    field_mass = jnp.where(is_heavy, 0.0, mass)

    k_out = min(_OUTLIER_CAP, max(n // 16, 1))
    total_fm = jnp.maximum(jnp.sum(field_mass), 1e-30)
    com = jnp.sum(field_mass[:, None] * pos, axis=0) / total_fm
    cheb_dist = jnp.max(jnp.abs(pos - com), axis=1)
    _, out_i = lax.top_k(cheb_dist, k_out)
    is_out = jnp.zeros((n,), bool).at[out_i].set(True)
    out_sel = is_out[out_i]

    tree_mass = jnp.where(is_out, 0.0, field_mass)
    bulk_pos = jnp.where(is_out[:, None], com[None, :], pos)
    return dict(
        is_heavy=is_heavy, h_pos=h_pos, h_mass=h_mass,
        field_mass=field_mass, is_out=is_out, out_i=out_i, out_sel=out_sel,
        com=com, tree_mass=tree_mass, bulk_pos=bulk_pos,
    )


def heavy_coupling(tgt_pos, h_pos, h_mass, eps_sq, g_const):
    """Exact [T, K] direct interaction of targets with the extracted heavy
    bodies (self-pairs vanish via the d_sq > 0 guard)."""
    d_h = h_pos[None, :, :] - tgt_pos[:, None, :]          # [T, K, 2]
    d_sq_h = jnp.sum(d_h * d_h, axis=-1)
    inv_h = lax.rsqrt(d_sq_h + eps_sq)
    w_h = h_mass[None, :] * (inv_h * inv_h * inv_h)
    w_h = jnp.where(d_sq_h > 0.0, w_h, 0.0)
    return g_const * jnp.einsum("nk,nkd->nd", w_h, d_h)


_DEEP_SMOOTH = 0.09   # (0.3 s_d)^2: near-window cells act as Plummer
                      # clouds of width ~0.3 cell — see docstring


def _compact_indices(mask, cap: int):
    """Static-capacity compaction of the True rows of `mask`: returns
    (sidx [cap] int32, count). sidx holds the indices of the first `cap`
    True rows in order, sentinel n beyond; `count` is the true total —
    callers lax.cond a full-length fallback when count > cap (the same
    scheme as the banded trees' per-band window compaction,
    parallel/tree.py)."""
    n = mask.shape[0]
    rank = jnp.cumsum(mask) - 1
    sidx = (jnp.full((cap,), n, jnp.int32)
            .at[jnp.where(mask & (rank < cap), rank, cap)]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop"))
    return sidx, jnp.sum(mask)


def _deep_rows_cap(n: int) -> int:
    """Static row capacity for the compacted deep L2P + aggregate pass
    when tiles are on (rows the tile stage will NOT refine: ~71% on the
    flagship N=4M merger, so 3n/4 holds; lax.cond falls back to the full
    pass beyond it)."""
    return max((3 * n) // 4, 4096)


def _refined_cap(n: int) -> int:
    """Static row capacity for the compacted tile-apply pass. The refined
    set is the deep-path targets inside the T selected tiles — measured
    15.3% of N on the flagship N=4M merger (config 5, r5 probe), so n//4
    holds it with ~60% margin; beyond the cap an in-jit lax.cond falls
    back to the full-length apply (correct, just unshaved)."""
    return max(n // 4, 4096)


def _scatter_cap(n: int) -> int:
    """Static row capacity for the compacted tile-scatter sources (the
    selected-tile members plus the selected-adjacent edge band — a
    slightly larger set than _refined_cap's targets)."""
    return max((3 * n) // 8, 4096)


def _tile_src_mask(ci_f, tile_slot, deep: int, radius: int, t: int,
                   T: int):
    """Rows that can contribute moments to any selected tile window:
    home-tile members plus particles within H of a tile edge whose
    shifted neighbor tile is selected (the same candidate geometry as
    _tile_scatter's cand(); kept boolean-only so the compacted scatter
    can cut its source rows before paying the full-length scatter)."""
    rD = 1 << deep
    nt = rD // t
    H = radius
    tx = ci_f[:, 0] // t
    ty = ci_f[:, 1] // t
    mx = ci_f[:, 0] % t
    my = ci_f[:, 1] % t
    sx = jnp.where(mx < H, -1, jnp.where(mx >= t - H, 1, 0))
    sy = jnp.where(my < H, -1, jnp.where(my >= t - H, 1, 0))

    def sel(ctx, cty, ok):
        ok = ok & ((ctx >= 0) & (ctx < nt) & (cty >= 0) & (cty < nt))
        return ok & (tile_slot[jnp.where(ok, ctx * nt + cty,
                                         nt * nt)] < T)

    true = jnp.ones(tx.shape, bool)
    return (sel(tx, ty, true)
            | sel(tx + sx, ty, sx != 0)
            | sel(tx, ty + sy, sy != 0)
            | sel(tx + sx, ty + sy, (sx != 0) & (sy != 0)))


def _deep_near_aggregates(pos, payload, gp, ci_deep, eps_sq, s_d,
                          rr: int, row0=0):
    """Smoothed-aggregate near field of the deep-overflow path: the
    (2rr+1)^2 deepest-level cell aggregates evaluated at each particle.

    gp: [rows + 2rr, cols + 2rr, 6] PRE-PADDED raw moment window at the
    deep level — the full grid padded with rr zeros on the single chip, or
    a row band whose rr halo rows hold real ring-neighbor data in the
    banded multi-chip path (parallel/tree.py). `row0` is the global deep
    row of the window's first REAL (non-halo) row; out-of-window targets
    gather clipped rows and must be masked by the caller. payload:
    [N, 6] each particle's own raw moment row (subtracted from its home
    cell so a particle never feels its own moment). Each cell is a
    monopole-at-COM + quadrupole source — evaluated with the softening
    widened to eps^2 + (0.3 s_d)^2 (s_d = deep cell size), i.e. the cell's
    mass acts as a Plummer CLOUD of the cell's own width rather than a
    point. A point aggregate is catastrophically wrong from INSIDE a
    dense cell (the true contributions of a symmetric cloud around the
    target nearly cancel; a point at the COM does not) — the widened
    kernel is smooth through the cell interior and restores the
    cancellation, exactly the particle-mesh near-field model. 0.3 s_d
    matches a Plummer sphere's half-mass radius to a uniform cell's.
    Returns [N, 2] (un-multiplied by g_const)."""
    eps_sq = eps_sq + _DEEP_SMOOTH * s_d * s_d
    rows = gp.shape[0] - 2 * rr
    stride = gp.shape[1]
    gp = gp.reshape(-1, gp.shape[-1])
    row = jnp.clip(ci_deep[:, 0] - row0, 0, rows - 1) + rr
    col = ci_deep[:, 1] + rr
    base = row * stride + col
    return _aggregate_window_eval(gp, base, stride, payload, pos, eps_sq,
                                  rr)


def _deep_near_aggregates_packed(pos, payload, g3_pad, ci_deep, eps_sq,
                                 s_d):
    """Fully packed variant of _deep_near_aggregates for the single-chip
    rin=1 window (see barneshut3d._deep_near_aggregates3_packed for the
    lane-utilization rationale): pack all 9 3x3-window monopole cells
    into 27-lane rows with two dense concats, cutting the per-particle
    gathers from 9 (r4) / 3 (early r5) to ONE — TPU gathers are
    row-rate-bound (~20-25M rows/s measured), so gather count, not
    gathered bytes, is the cost. g3_pad: [r+2, r+2, 3] rin=1-padded
    (m, sx, sy) grids; the [r, r, 27] packed grid is 3x the y-packed
    temp (1.8 GB at the flagship's r=4096 — measured to fit beside the
    4M step). Accumulation order matches _aggregate_window_eval (ox, oy)
    bitwise."""
    eps_sq = eps_sq + _DEEP_SMOOTH * s_d * s_d
    side = g3_pad.shape[0]
    r = side - 2
    gy = jnp.concatenate([g3_pad[:, :-2, :], g3_pad[:, 1:-1, :],
                          g3_pad[:, 2:, :]], axis=-1)       # [r+2, r, 9]
    gxy = jnp.concatenate([gy[:-2], gy[1:-1], gy[2:]],
                          axis=-1)                          # [r, r, 27]
    base = ci_deep[:, 0] * r + ci_deep[:, 1]
    return _packed_mono_window(gxy.reshape(-1, 27), base, payload, pos,
                               eps_sq)


def _packed_mono_window(g27, base, payload, pos, eps_sq):
    """1-gather fully packed 3x3 monopole window kick. g27: [M, 27] rows
    holding all 9 (ox, oy)-neighbor (m, sx, sy) cells, lane block
    9*(ox+1) + 3*(oy+1); base: [N] home row in the UNPADDED r x r
    layout. eps_sq arrives ALREADY widened. Accumulation order matches
    _aggregate_window_eval (ox, oy) bitwise."""
    px, py = pos[:, 0], pos[:, 1]
    ax = jnp.zeros_like(px)
    ay = jnp.zeros_like(py)
    rows = g27[base]                                        # [N, 27]
    for jx in range(3):
        for jy in range(3):
            o = 9 * jx + 3 * jy
            ch = rows[:, o:o + 3]
            if jx == 1 and jy == 1:
                ch = ch - payload
            m = ch[:, 0]
            safe_m = jnp.where(m > 0, m, 1.0)
            dx = ch[:, 1] / safe_m - px
            dy = ch[:, 2] / safe_m - py
            q = dx * dx + dy * dy + eps_sq
            inv = lax.rsqrt(q)
            w3 = m * (inv * inv * inv)
            ax = ax + w3 * dx
            ay = ay + w3 * dy
    return jnp.stack([ax, ay], axis=-1)


def _aggregate_window_eval(gp_flat, base, stride, payload, pos, eps_sq,
                           rr: int):
    """(2rr+1)^2 smoothed cell-aggregate kick shared by the full-grid deep
    path and the tile-refined path. gp_flat: [M, 6] flattened padded
    moment cells — or [M, 3] (m, sx, sy) rows, in which case each cell is
    a pure monopole at its COM (the synthesized-quadrupole build's
    COM-centered quadrupole is identically zero, so nothing is dropped;
    gather volume and VPU work halve — the aggregate gathers were config
    5's dominant stage). base: [N] flat index of each particle's home
    cell in that layout; stride: row stride; payload channel count
    matches gp_flat. eps_sq arrives ALREADY widened by the Plummer-cloud
    term. Returns [N, 2] (un-multiplied by g_const)."""
    mono = gp_flat.shape[1] == 3
    px, py = pos[:, 0], pos[:, 1]
    ax = jnp.zeros_like(px)
    ay = jnp.zeros_like(py)
    for ox in range(-rr, rr + 1):
        for oy in range(-rr, rr + 1):
            ch = gp_flat[base + (ox * stride + oy)]       # [N, 6 or 3]
            if ox == 0 and oy == 0:
                ch = ch - payload
            m = ch[:, 0]
            safe_m = jnp.where(m > 0, m, 1.0)
            comx = ch[:, 1] / safe_m
            comy = ch[:, 2] / safe_m
            dx = comx - px
            dy = comy - py
            q = dx * dx + dy * dy + eps_sq
            inv = lax.rsqrt(q)
            inv3 = inv * inv * inv
            w3 = m * inv3
            ax = ax + w3 * dx
            ay = ay + w3 * dy
            if mono:
                continue
            qxx = ch[:, 3] - m * comx * comx
            qxy = ch[:, 4] - m * comx * comy
            qyy = ch[:, 5] - m * comy * comy
            inv5 = inv3 * inv * inv
            inv7 = inv5 * inv * inv
            u7 = 15.0 * inv7
            u5 = 3.0 * inv5
            txxx = u7 * dx * dx * dx - 3.0 * u5 * dx
            txxy = u7 * dx * dx * dy - u5 * dy
            txyy = u7 * dx * dy * dy - u5 * dx
            tyyy = u7 * dy * dy * dy - 3.0 * u5 * dy
            ax = ax + 0.5 * (qxx * txxx + 2.0 * qxy * txxy + qyy * txyy)
            ay = ay + 0.5 * (qxx * txxy + 2.0 * qxy * txyy + qyy * tyyy)
    return jnp.stack([ax, ay], axis=-1)


_TILE_SIZE_2D = 32    # tile side in deep-level cells (t >= 2R required)
_TILE_COUNT = 8       # max refined tiles per eval (graceful beyond)


def _fold_aggregate_ring(local, window, corner, size, r_full: int, eps_sq,
                         radius: int, row0, rows: int):
    """Fold the OUTER ring (Chebyshev >= 2) of the smoothed aggregate
    window into the local expansion as a dense stencil, so the per-particle
    aggregate pass shrinks to the inner 3x3 (25 -> 9 gathers at R=3 —
    profiled r3: the gathers were config 5's dominant stage, 1.6 s of the
    5.4 s step). The folded cells are evaluated by the p=2 Taylor of the
    WIDENED (Plummer-cloud) kernel about the cell center — cheb >= 2 keeps
    the expansion ratio ~0.47, the same regime as M2L at R=2 (~4e-3 per
    folded cell, at a distance where the aggregate is a small fraction of
    the force). `window`: 6 moment grids pre-padded by rr = radius - 1
    (zeros on the single chip, ring-neighbor halo rows in the banded
    path). No-op when rr < 2 (the window IS the inner 3x3)."""
    rr = radius - 1
    if rr < 2:
        return local
    s_d = size / r_full
    eps_w = eps_sq + _DEEP_SMOOTH * s_d * s_d
    ring = [(ox, oy)
            for ox in range(-rr, rr + 1)
            for oy in range(-rr, rr + 1)
            if max(abs(ox), abs(oy)) >= 2]
    terms = _m2l_stencil(window, corner, size, r_full, eps_w, radius,
                         row0=row0, rows=rows, offsets=ring,
                         gate_parity=False, pad=rr)
    return tuple(a + b for a, b in zip(local, terms))


def _tile_refine(pos, payload, bulk_pos, ci_f, b_par, local_deep,
                 corner, size, deep: int, radius: int, eps_sq,
                 k: int, t: int, T: int):
    """Hot-zone sub-box refinement: continue the deep chain k more levels
    inside the T hottest t x t-cell tiles of the deepest global level.

    The deep chain's PM smoothing scale is set by the deepest GLOBAL grid
    the HBM can hold (0.3 * s_deep). Dense cores occupy a tiny fraction of
    the domain, so refining only there is nearly free: each selected tile
    gets a window of (t + 2R) deep cells (R cells of halo cover every
    sub-level's V-list and the deepest aggregate window), particle moments
    scatter into tile-local grids at 2^k x finer resolution, the M2L/L2L
    chain continues per tile (vmapped MXU contractions; window origins are
    even at every sub-level, so the V-list parity gating stays aligned
    with the true 2:1 hierarchy), and refined targets evaluate the
    sub-level-k local expansion + smoothed aggregates — the smoothing
    scale drops 2^k in exactly the cells where it matters. Targets whose
    home tile is not selected keep the global deep path (graceful, never
    lossy). Same telescoping identity as the bucket->deep chain, so the
    refinement is exact but for the (smaller) smoothing.

    Returns (refined [N] bool, far_ref [N,2], near_ref [N,2]); outputs
    un-multiplied by g_const and garbage where ~refined (callers mask).
    """
    H = radius
    tid, tile_slot, orig = _tile_select(ci_f, b_par, deep, t, T, radius)

    # Window slice of the level-D locals, padded by H zeros.
    locD = jnp.stack(local_deep, axis=-1)                   # [rD, rD, 9]
    locDp = jnp.pad(locD, ((H, H), (H, H), (0, 0)))

    def slice_tile(o):
        return lax.dynamic_slice(locDp, (o[0] + H, o[1] + H, 0),
                                 (t + 2 * H, t + 2 * H, 9))

    local_w = jax.vmap(slice_tile)(orig)                    # [T, W, W, 9]
    return _tile_eval(pos, payload, bulk_pos, ci_f, b_par, local_w,
                      tid, tile_slot, orig, corner, size, deep, radius,
                      eps_sq, k=k, t=t, T=T)


def _tile_select(ci_f, b_par, deep: int, t: int, T: int, radius: int):
    """Top-T tiles by deep-path-target count. Returns (tid [N] home-tile
    id, tile_slot [nt^2+1] tile-id -> slot (T = unselected), orig [T, 2]
    window origin in deep cells, = tile corner - H)."""
    rD = 1 << deep
    nt = rD // t
    tx = ci_f[:, 0] // t
    ty = ci_f[:, 1] // t
    tid = tx * nt + ty
    scores = (jnp.zeros((nt * nt,), jnp.int32)
              .at[tid].add(b_par.astype(jnp.int32)))
    top_s, top_i = lax.top_k(scores, T)
    valid_tile = top_s > 0
    # Invalid (score-0) tiles scatter to nt*nt+1 — truly out of bounds,
    # so mode="drop" drops them and the documented sentinel row at
    # nt*nt stays T (r3 review: scattering them to nt*nt corrupted the
    # sentinel whenever fewer than T tiles had targets).
    tile_slot = (jnp.full((nt * nt + 1,), T, jnp.int32)
                 .at[jnp.where(valid_tile, top_i, nt * nt + 1)]
                 .set(jnp.arange(T, dtype=jnp.int32), mode="drop"))
    orig = (jnp.stack([top_i // nt, top_i % nt], axis=-1) * t
            - radius)                                           # [T, 2]
    return tid, tile_slot, orig


def _tile_scatter(payload, bulk_pos, ci_f, tile_slot, orig, corner, size,
                  deep: int, radius: int, k: int, t: int, T: int,
                  src_mask=None):
    """Moment scatter into the selected tile windows at sub-resolution
    -> g3k [T, Wf, Wf, 3]. A particle's deep cell can sit in up to 4
    selected windows (its home tile plus x/y/corner neighbors when within
    H of a tile edge). Split out of the tile stage so the banded tree can
    scatter per-band particle subsets and psum the (small) tile grids.

    Monopole + dipole channels only: the scatter is the tile stage's
    dominant cost (profiled r3: 1.02 of 1.27 s at N=4M), so halve its
    row width and synthesize the quadrupole channels per LEVEL from
    (m, sx, sy) as point-at-COM raw moments (rxx = sx^2/m, ...) — exact
    for single-particle cells, and the dropped intra-cell quadrupole at
    the tiny tile scale is far below the PM smoothing term. The three
    non-home (halo) candidates scatter only a COMPACT boundary subset
    (particles within H of a tile edge, ~1/3 of a tile) instead of all
    input rows; beyond the static cap, halo sources drop gracefully (edge
    cells lose a little neighbor mass — never their own tile's)."""
    n = bulk_pos.shape[0]
    dtype = bulk_pos.dtype
    rD = 1 << deep
    H = radius
    W = t + 2 * H
    f = 1 << k
    Wf = W * f
    nt = rD // t
    tx = ci_f[:, 0] // t
    ty = ci_f[:, 1] // t
    u = (bulk_pos - corner) / size
    ci_sub = jnp.clip((u * (rD * f)).astype(jnp.int32), 0, rD * f - 1)
    mx = ci_f[:, 0] % t
    my = ci_f[:, 1] % t
    sx = jnp.where(mx < H, -1, jnp.where(mx >= t - H, 1, 0))
    sy = jnp.where(my < H, -1, jnp.where(my >= t - H, 1, 0))
    pay3 = payload[:, :3]

    def cand(cx, cy, tx_, ty_, sx_, sy_, ci_sub_):
        ctx = tx_ + (sx_ if cx else 0)
        cty = ty_ + (sy_ if cy else 0)
        ok = (ctx >= 0) & (ctx < nt) & (cty >= 0) & (cty < nt)
        if cx:
            ok = ok & (sx_ != 0)
        if cy:
            ok = ok & (sy_ != 0)
        slot = tile_slot[jnp.where(ok, ctx * nt + cty, nt * nt)]
        ok = ok & (slot < T)
        rel = ci_sub_ - orig[jnp.minimum(slot, T - 1)] * f
        return jnp.where(ok, (slot * Wf + rel[:, 0]) * Wf + rel[:, 1],
                         T * Wf * Wf)

    g3t = (jnp.zeros((T * Wf * Wf, 3), dtype)
           .at[cand(0, 0, tx, ty, sx, sy, ci_sub)]
           .add(pay3, mode="drop"))

    b_cap = min(n, max(n // 4, 65536))

    def neigh_selected(cx, cy):
        ctx = tx + (sx if cx else 0)
        cty = ty + (sy if cy else 0)
        ok = (ctx >= 0) & (ctx < nt) & (cty >= 0) & (cty < nt)
        if cx:
            ok = ok & (sx != 0)
        if cy:
            ok = ok & (sy != 0)
        return ok & (tile_slot[jnp.where(ok, ctx * nt + cty,
                                         nt * nt)] < T)

    # Edge-compaction cut keyed on RELEVANT edges only: a particle on
    # the edge of a tile whose neighbor is not selected would scatter to
    # the drop index anyway, so it must not claim a slot at the static
    # cap (at merger scale the raw edge band can exceed b_cap while the
    # selected-adjacent subset is far smaller).
    on_edge = (neigh_selected(1, 0) | neigh_selected(0, 1)
               | neigh_selected(1, 1))
    if src_mask is not None:
        # Banded callers pass masked (zero-payload) rows for particles
        # outside their band; keep those out of the edge-compaction cut
        # so they cannot displace real halo sources at the static cap.
        on_edge = on_edge & src_mask
    bidx = jnp.argsort(~on_edge)[:b_cap]
    b_ok = on_edge[bidx]
    pay_b = jnp.where(b_ok[:, None], pay3[bidx], 0.0)
    tx_b, ty_b = tx[bidx], ty[bidx]
    sx_b, sy_b = sx[bidx], sy[bidx]
    sub_b = ci_sub[bidx]
    for cx, cy in ((1, 0), (0, 1), (1, 1)):
        g3t = g3t.at[cand(cx, cy, tx_b, ty_b, sx_b, sy_b, sub_b)].add(
            pay_b, mode="drop")
    return g3t.reshape(T, Wf, Wf, 3)


def _tile_chain(local_w, g3k, orig, corner, size, deep: int, radius: int,
                eps_sq, k: int, t: int, T: int):
    """Per-tile sub-level chain: upsample the window locals and add the
    sub-level M2L terms, then fold the tile aggregate ring. Replicated
    arithmetic over the (small) tile grids — identical on every device
    in the banded tree. Returns local_w [T, Wf, Wf, 9]."""
    dtype = g3k.dtype
    rD = 1 << deep
    H = radius
    W = t + 2 * H
    f = 1 << k
    Wf = W * f

    g6k = _synth_quad_channels(g3k)

    pooled3 = {k: g3k}
    for j in range(k - 1, 0, -1):
        w_j = W * (1 << j)
        pooled3[j] = (pooled3[j + 1]
                      .reshape(T, w_j, 2, w_j, 2, 3).sum((2, 4)))
    sub_grids = {j: _synth_quad_channels(pooled3[j])
                 for j in range(1, k + 1)}

    s_D = size / rD
    corner_t = corner[None, :] + orig.astype(dtype) * s_D   # [T, 2]
    size_w = W * s_D

    def m2l_tile(g6_j, c_t):
        return _m2l_level(tuple(g6_j[..., i] for i in range(6)),
                          c_t, size_w, eps_sq, radius)

    for j in range(1, k + 1):
        s_child = s_D / (1 << j)
        loc_t = tuple(local_w[..., i] for i in range(9))
        up = jax.vmap(_l2l_upsample, in_axes=(0, None))(loc_t, s_child)
        terms = jax.vmap(m2l_tile)(sub_grids[j], corner_t)
        local_w = jnp.stack(tuple(a + b for a, b in zip(up, terms)),
                            axis=-1)                 # [T, W*2^j, ..., 9]

    rr_full = radius - 1
    if rr_full >= 2:
        def fold_tile(lw, g6_j, c_t):
            window = tuple(jnp.pad(g6_j[..., i], rr_full) for i in range(6))
            out = _fold_aggregate_ring(
                tuple(lw[..., i] for i in range(9)), window, c_t, size_w,
                Wf, eps_sq, radius, jnp.int32(0), Wf)
            return jnp.stack(out, axis=-1)

        local_w = jax.vmap(fold_tile)(local_w, g6k, corner_t)
    return local_w


def _tile_apply(pos, payload, bulk_pos, ci_f, b_par, local_w, g3k,
                tile_slot, orig, corner, size, deep: int, radius: int,
                eps_sq, k: int, t: int, T: int):
    """Refined per-particle evaluation against the chained tile locals +
    tile aggregates. Pure gather/VPU work over its input rows — the
    banded tree calls it on a compacted per-band target subset."""
    dtype = pos.dtype
    rD = 1 << deep
    H = radius
    W = t + 2 * H
    f = 1 << k
    Wf = W * f
    nt = rD // t
    tx = ci_f[:, 0] // t
    ty = ci_f[:, 1] // t
    tid = tx * nt + ty
    u = (bulk_pos - corner) / size
    ci_sub = jnp.clip((u * (rD * f)).astype(jnp.int32), 0, rD * f - 1)
    s_D = size / rD

    slot_home = tile_slot[tid]
    refined = (slot_home < T) & b_par
    sc = jnp.minimum(slot_home, T - 1)
    rel = jnp.clip(ci_sub - orig[sc] * f, 0, Wf - 1)

    s_k = s_D / f
    centx = corner[0] + (ci_sub[:, 0].astype(dtype) + 0.5) * s_k
    centy = corner[1] + (ci_sub[:, 1].astype(dtype) + 0.5) * s_k
    dxp = pos[:, 0] - centx
    dyp = pos[:, 1] - centy
    loc_flat = local_w.reshape(T * Wf * Wf, 9)
    g9 = loc_flat[(sc * Wf + rel[:, 0]) * Wf + rel[:, 1]]    # [N, 9]
    far_x, far_y = _taylor_eval(tuple(g9[:, i] for i in range(9)),
                                dxp, dyp)
    far_ref = jnp.stack([far_x, far_y], axis=-1)

    rin = min(radius - 1, 1)   # inner 3x3; the ring folded into local_w
    g3kp = jnp.pad(g3k, ((0, 0), (rin, rin), (rin, rin), (0, 0)))
    stride = Wf + 2 * rin
    if rin == 1:
        # Fully packed 1-gather window (r5): same lane-utilization shave
        # as _deep_near_aggregates_packed; the [T, Wf, Wf, 27] packed
        # tile grids are small.
        gy = jnp.concatenate([g3kp[..., :-2, :], g3kp[..., 1:-1, :],
                              g3kp[..., 2:, :]], axis=-1)
        gxy = jnp.concatenate([gy[:, :-2], gy[:, 1:-1], gy[:, 2:]],
                              axis=-1)                 # [T, Wf, Wf, 27]
        base_p = (sc * Wf + rel[:, 0]) * Wf + rel[:, 1]
        near_ref = _packed_mono_window(
            gxy.reshape(-1, 27), base_p, payload[:, :3], pos,
            eps_sq + _DEEP_SMOOTH * s_k * s_k)
    else:
        base = (sc * stride + rel[:, 0] + rin) * stride + rel[:, 1] + rin
        near_ref = _aggregate_window_eval(
            g3kp.reshape(-1, 3), base, stride, payload[:, :3], pos,
            eps_sq + _DEEP_SMOOTH * s_k * s_k, rin)
    return refined, far_ref, near_ref


def _tile_eval(pos, payload, bulk_pos, ci_f, b_par, local_w,
               tid, tile_slot, orig, corner, size, deep: int, radius: int,
               eps_sq, k: int, t: int, T: int):
    """Per-tile chain + refined per-particle evaluation given the window
    slice of the level-D locals (see _tile_refine; split into
    _tile_scatter / _tile_chain / _tile_apply so the banded multi-chip
    tree can scatter per-band subsets + psum and apply on band targets).

    The apply runs on a COMPACTED candidate set (refined targets =
    (tile_slot[tid] < T) & b_par, computable before the expensive
    gather+Taylor+window work) — the full-length apply evaluated all N
    rows and discarded ~85% of them on the flagship merger (r5 probe:
    frac_ref 15.3% at N=4M). lax.cond falls back to the full pass when
    the candidate count overflows the static cap.

    The scatter sources compact the same way (r5): only selected-tile
    members + the selected-adjacent edge band contribute moments, so the
    full-length scatter wasted most of its rows on drop-indexed
    particles (the banded tree's compact_grids pattern,
    parallel/tree.py)."""
    n = pos.shape[0]
    s_cap = _scatter_cap(n)
    if s_cap >= n:
        g3k = _tile_scatter(payload, bulk_pos, ci_f, tile_slot, orig,
                            corner, size, deep, radius, k, t, T)
    else:
        src = _tile_src_mask(ci_f, tile_slot, deep, radius, t, T)
        sidx_s, n_src = _compact_indices(src, s_cap)

        def compact_scatter(_):
            valid_s = sidx_s < n
            ss = jnp.minimum(sidx_s, n - 1)
            pay_s = jnp.where(valid_s[:, None], payload[ss], 0.0)
            return _tile_scatter(pay_s, bulk_pos[ss], ci_f[ss], tile_slot,
                                 orig, corner, size, deep, radius, k, t,
                                 T, src_mask=valid_s)

        def full_scatter(_):
            return _tile_scatter(payload, bulk_pos, ci_f, tile_slot, orig,
                                 corner, size, deep, radius, k, t, T)

        g3k = lax.cond(n_src <= s_cap, compact_scatter, full_scatter, 0)
    local_w = _tile_chain(local_w, g3k, orig, corner, size, deep, radius,
                          eps_sq, k, t, T)

    def full_apply(_):
        return _tile_apply(pos, payload, bulk_pos, ci_f, b_par, local_w,
                           g3k, tile_slot, orig, corner, size, deep,
                           radius, eps_sq, k, t, T)

    n = pos.shape[0]
    cap = _refined_cap(n)
    if cap >= n:
        return full_apply(0)
    cand = (tile_slot[tid] < T) & b_par
    sidx, n_cand = _compact_indices(cand, cap)

    def compact_apply(_):
        valid = sidx < n
        si = jnp.minimum(sidx, n - 1)
        r_s, far_s, near_s = _tile_apply(
            pos[si], payload[si], bulk_pos[si], ci_f[si],
            b_par[si] & valid, local_w, g3k, tile_slot, orig, corner,
            size, deep, radius, eps_sq, k, t, T)
        tgt = jnp.where(valid & r_s, si, n)
        refined = jnp.zeros((n,), bool).at[tgt].set(True, mode="drop")
        far = jnp.zeros_like(pos).at[tgt].set(far_s, mode="drop")
        near = jnp.zeros_like(pos).at[tgt].set(near_s, mode="drop")
        return refined, far, near

    return lax.cond(n_cand <= cap, compact_apply, full_apply, 0)


@functools.partial(jax.jit, static_argnames=("levels", "eps_sq", "g_const",
                                             "near_cap", "radius",
                                             "nf_pallas", "interpret",
                                             "deep_levels", "tile_levels",
                                             "tile_size", "tile_count"))
def _bh_accelerations(pos, mass, levels: int, eps_sq: float, g_const: float,
                      near_cap: int, radius: int,
                      nf_pallas: bool = False, interpret: bool = False,
                      deep_levels: int = 0, tile_levels: int = 0,
                      tile_size: int = 32, tile_count: int = 8):
    n = pos.shape[0]
    ext = _extract_heavy_outliers(pos, mass)
    is_heavy, h_pos, h_mass = ext["is_heavy"], ext["h_pos"], ext["h_mass"]
    field_mass, is_out, out_i = (
        ext["field_mass"], ext["is_out"], ext["out_i"])
    out_sel, com = ext["out_sel"], ext["com"]

    acc_heavy = heavy_coupling(pos, h_pos, h_mass, eps_sq, g_const)

    # Exact forces ON outliers from all non-heavy sources (heavy forces on
    # them come from acc_heavy; other outliers are included here). On the
    # TPU path (nf_pallas) the two rectangular couplings run through the
    # tuned Pallas all-pairs kernel — the blocked-XLA form was ~0.2 s of
    # untimed whole-vs-stage-sum gap at flagship scale (r5).
    from nbodysim_tpu.physics.forces import direct_accelerations

    if nf_pallas:
        from nbodysim_tpu.kernels.allpairs import (
            allpairs_accelerations, allpairs_accelerations_wide)

        def _direct(tp, sp, sm):
            return allpairs_accelerations(
                tp, None, eps_sq=eps_sq, g_const=g_const,
                interpret=interpret, src_pos=sp, src_mass=sm)

        def _direct_wide(tp, sp, sm):
            # MANY targets x FEW sources MUST use the transposed-IO
            # kernel: a [N, 2] target operand to the standard kernel
            # forces a {1,0} dense layout whose tile padding (2 GB at
            # N=4M) infected the whole tree graph and OOMed HBM (r5).
            return allpairs_accelerations_wide(
                tp, sp, sm, eps_sq=eps_sq, g_const=g_const,
                interpret=interpret)
    else:
        def _direct(tp, sp, sm):
            return direct_accelerations(tp, None, eps_sq, g_const,
                                        src_pos=sp, src_mass=sm)

        _direct_wide = _direct

    acc_out = _direct(pos[out_i], pos, jnp.where(is_heavy, 0.0, mass))
    # As sources toward the bulk, outliers must not re-contribute heavy
    # mass (acc_heavy already covers every heavy source).
    out_src_mass = jnp.where(out_sel & ~is_heavy[out_i], mass[out_i], 0.0)
    # ... and the reciprocal: bulk targets still feel the extracted
    # outliers' mass, by exact [N, k_out] pairs (outlier-target rows of
    # this term are discarded below — their exact pass already includes
    # outlier-outlier interactions).
    acc_from_out = _direct_wide(pos, pos[out_i], out_src_mass)

    mass = ext["tree_mass"]      # the tree sees only the bulk
    bulk_pos = ext["bulk_pos"]
    # Deep-overflow mode (deep_levels > levels): the pyramid extends past
    # the bucket level down to `deep_levels`. Targets whose near window
    # touches an overflowing cell take the DEEP PATH — local expansion
    # descended to the deep level + exact-moment 3x3 cell aggregates there
    # — instead of buckets+residual, so arbitrarily clustered scenes
    # (galaxy-merger nuclei, Plummer cores) get reference-quality-or-
    # better forces at any occupancy, with no residual-capacity cliff.
    deep = deep_levels if deep_levels > levels else 0
    build_levels = deep if deep else levels
    grids, corner, size, ci_f, flat_f = _build_pyramid(
        bulk_pos, mass, build_levels, synth_quad=bool(deep))
    res = 1 << levels
    if deep:
        ci = ci_f >> (deep - levels)           # bucket-level cell indices
        flat = ci[:, 0] * res + ci[:, 1]
    else:
        ci, flat = ci_f, flat_f

    # Downward pass: M2L at each level + L2L to the next.
    local = None
    for l in range(2, levels + 1):
        terms = _m2l_level(grids[l], corner, size, eps_sq, radius)
        if local is None:
            local = terms
        else:
            s_child = size / (1 << l)
            local = tuple(
                u + t for u, t in zip(_l2l_upsample(local, s_child), terms)
            )
    local_bucket = local

    if deep:
        # Continue the chain below the bucket level at the same radius
        # (the p=2 expansion at the deep scale is the accuracy limiter,
        # so the deep chain keeps the full R rather than dropping to 2).
        for l in range(levels + 1, deep + 1):
            terms = _m2l_level(grids[l], corner, size, eps_sq, radius)
            up = _l2l_upsample(local, size / (1 << l))
            local = tuple(u + t for u, t in zip(up, terms))
        local_deep = local

    # L2P: ONE fused gather of the 9 (F, J, H) terms per particle +
    # second-order evaluation (9 separate [N]-gathers cost 9 HBM passes).
    far = g_const * _l2p_eval(local_bucket, ci, pos, corner, size, levels)

    # Outliers must not enter the near-field buckets (their clipped cells
    # would crowd central slots): give each a unique out-of-range flat id —
    # the scatter drops them, no probe ever matches them, and their own
    # (garbage) rows are replaced below.
    flat_nf = jnp.where(is_out, res * res + jnp.arange(n), flat)
    near, overflow = _near_field_buckets(
        pos, mass, ci, flat_nf, levels, eps_sq, g_const, near_cap, radius,
        use_pallas=nf_pallas, interpret=interpret,
        skip_residual=bool(deep))

    if deep:
        # Deep-path target selection: any overflowing cell within the
        # bucket stencil window (Chebyshev radius - 1).
        occ = jnp.zeros((res * res,), jnp.int32).at[flat_nf].add(
            1, mode="drop")
        hot = (occ > near_cap).reshape(res, res)
        rr = radius - 1
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

        payload = _moment_payload(pos, mass)
        rrd = radius - 1
        rin = min(rrd, 1)   # inner aggregate window; ring folds into L2P
        wring = tuple(jnp.pad(g, rrd) for g in grids[deep])
        # NOTE: the tile path below must see the UN-folded local_deep —
        # its sub-level chain re-decomposes exactly the window the fold
        # covers (folding first would double-count the cheb>=2 ring).
        local_agg = _fold_aggregate_ring(
            local_deep, wring, corner, size, 1 << deep, eps_sq, radius,
            row0=jnp.int32(0), rows=1 << deep)
        g3_pad = jnp.pad(jnp.stack(grids[deep][:3], axis=-1),
                         ((rin, rin), (rin, rin), (0, 0)))

        def _deep_rows(pos_r, ci_r, pay_r):
            """Deep-path L2P + smoothed aggregates for the given rows
            (per-row independent, so compaction keeps bitwise parity)."""
            far_r = g_const * _l2p_eval(local_agg, ci_r, pos_r, corner,
                                        size, deep)
            if rin == 1:
                near_r = g_const * _deep_near_aggregates_packed(
                    pos_r, pay_r, g3_pad, ci_r, eps_sq,
                    size / (1 << deep))
            else:
                near_r = g_const * _deep_near_aggregates(
                    pos_r, pay_r, g3_pad, ci_r, eps_sq,
                    size / (1 << deep), rr=rin)
            return far_r, near_r

        dcap = _deep_rows_cap(n) if tile_levels else n
        if tile_levels and dcap < n:
            # Deep-row compaction (r5): rows the tile stage refines
            # discard far_deep/deep_near (`refined` equals this `cand`
            # exactly — see _tile_apply), so the L2P gather + aggregate
            # window run only on b_par & ~cand rows (~71% on the
            # flagship N=4M merger).
            tid_d, tile_slot_d, _orig_d = _tile_select(
                ci_f, b_par, deep, tile_size, tile_count, radius)
            cand_d = (tile_slot_d[tid_d] < tile_count) & b_par
            need_d = b_par & ~cand_d
            sidx_d, n_need = _compact_indices(need_d, dcap)

            def compact_deep(_):
                valid_d = sidx_d < n
                sd = jnp.minimum(sidx_d, n - 1)
                far_r, near_r = _deep_rows(pos[sd], ci_f[sd],
                                           payload[sd, :3])
                tgt = jnp.where(valid_d, sd, n)
                return (jnp.zeros_like(pos).at[tgt].set(far_r,
                                                        mode="drop"),
                        jnp.zeros_like(pos).at[tgt].set(near_r,
                                                        mode="drop"))

            def full_deep(_):
                return _deep_rows(pos, ci_f, payload[:, :3])

            far_deep, deep_near = lax.cond(n_need <= dcap, compact_deep,
                                           full_deep, 0)
        else:
            far_deep, deep_near = _deep_rows(pos, ci_f, payload[:, :3])
        far = jnp.where(b_par[:, None], far_deep, far)
        near = jnp.where(b_par[:, None], deep_near, near)

        if tile_levels:
            # Hot-zone sub-box refinement: 2^tile_levels finer smoothing
            # inside the T hottest tiles (see _tile_refine).
            refined, far_ref, near_ref = _tile_refine(
                pos, payload, bulk_pos, ci_f, b_par, local_deep,
                corner, size, deep, radius, eps_sq,
                k=tile_levels, t=tile_size, T=tile_count)
            sel = refined[:, None]
            far = jnp.where(sel, g_const * far_ref, far)
            near = jnp.where(sel, g_const * near_ref, near)

    # NOTE: without deep mode, overflow beyond the residual capacity
    # silently degrades; the device tunnel rejects host callbacks
    # (jax.debug.print), so the check lives host-side in
    # api.Simulation/_check_capacity (run once at init + CLI log loop).
    acc = jnp.where(is_out[:, None], 0.0,
                    far + near + acc_from_out) + acc_heavy
    acc = acc.at[out_i].add(jnp.where(out_sel[:, None], acc_out, 0.0))
    return acc


def _l2p_eval(local, ci, pos, corner, size, level: int):
    """Second-order local-expansion evaluation at each particle (L2P),
    one fused [9, N] gather. Returns [N, 2], un-scaled by g_const."""
    res = 1 << level
    s_l = size / res
    cellx = ci[:, 0]
    celly = ci[:, 1]
    centx = corner[0] + (cellx.astype(pos.dtype) + 0.5) * s_l
    centy = corner[1] + (celly.astype(pos.dtype) + 0.5) * s_l
    dxp = pos[:, 0] - centx
    dyp = pos[:, 1] - centy
    loc9 = jnp.stack(local, axis=0).reshape(9, res * res)
    g = loc9[:, cellx * res + celly]                   # [9, N]
    far_x, far_y = _taylor_eval(tuple(g[i] for i in range(9)), dxp, dyp)
    return jnp.stack([far_x, far_y], axis=-1)


def bh_near_overflow(pos: jax.Array, mass: jax.Array,
                     config: SimConfig) -> int:
    """Diagnostic: bulk particles beyond the near-field bucket cap (after
    the same heavy/outlier extraction the force path applies). Cheap: only
    the occupancy count, no forces."""
    from nbodysim_tpu.core.blocking import sorted_first_occurrence

    n = pos.shape[0]
    levels = _resolve_levels(config, n)
    res = 1 << levels

    ext = _extract_heavy_outliers(pos, mass)
    # Cell indices directly (r3 review: _build_pyramid here executed the
    # full 6-channel scatter + every pooling level EAGERLY on each
    # capacity check — ~0.37 s at N=4M over the serial tunnel — only to
    # be discarded).
    corner, size = _bounding_square(ext["bulk_pos"])
    u = (ext["bulk_pos"] - corner) / size
    ci = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
    flat = ci[:, 0] * res + ci[:, 1]
    flat_nf = jnp.where(ext["is_out"], res * res + jnp.arange(n), flat)

    flat_s = jnp.sort(flat_nf)
    first = sorted_first_occurrence(flat_s)
    slot = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    in_bulk = flat_s < res * res
    return int(jnp.sum((slot >= NEAR_CAP) & in_bulk))


def _resolve_levels(config: SimConfig, n: int) -> int:
    levels = config.bh_levels
    if levels <= 0:
        # Finest grid with ~4 particles per cell: r ~= sqrt(N/4). Measured
        # on one v5e chip (N=1M uniform, R=3, Pallas near field): L=9
        # (4/cell) 237 ms < L=10 (1/cell) 306 ms — the near-field pair
        # blocks pay for K=16 slots regardless of occupancy, so mostly
        # empty buckets waste VPU work; L=8 (16/cell) overflows the
        # residual capacity and loses forces. Clustered cells beyond the
        # bucket cap are repaired by the residual pass. Capped at L=10
        # (r=1024): L=11 graphs crash the AOT compile helper.
        levels = max(3, min(10, ((max(n, 16)) - 1).bit_length() - 2 >> 1))
    return levels


def bh_accelerations(pos: jax.Array, mass: jax.Array,
                     config: SimConfig) -> jax.Array:
    """Approximate softened accelerations via the stencil FMM tree code.

    dim=2 runs this quadtree pyramid; dim=3 dispatches to the octree FMM
    (physics/barneshut3d.py, the framework's own extension — the reference
    tree is 2D-only)."""
    if pos.shape[1] == 3:
        from nbodysim_tpu.physics.barneshut3d import bh3_accelerations

        return bh3_accelerations(pos, mass, config)
    n = pos.shape[0]
    levels = _resolve_levels(config, n)
    deep = _resolve_deep_levels(config, levels)
    radius = _resolve_radius(config)
    tk, tt, tc = _resolve_tile_params(config, deep, radius)
    return _bh_accelerations(
        pos, mass, levels=levels, eps_sq=float(config.eps_sq),
        g_const=float(config.g_const), near_cap=NEAR_CAP,
        radius=radius,
        nf_pallas=_nf_use_pallas(config), interpret=config.pallas_interpret,
        deep_levels=deep, tile_levels=tk, tile_size=tt, tile_count=tc,
    )


_MAX_DEEP_2D = 13   # 8192^2 moment grid = 1.6 GB f32; 2^14 would be 6.4 GB


def _resolve_deep_levels(config: SimConfig, levels: int) -> int:
    """Deep-overflow chain depth. 0 disables; >0 is explicit; -1 (auto)
    descends 2 levels past the buckets (16x the per-cell resolution),
    capped by the HBM-feasible grid (levels+3 at N=4M OOMs the 16 GB
    chip: ~2.4 GB locals + 2.4 GB upsample temps + grids at 8192^2 on
    top of the bucket structures). The occupancy probe in
    forces.resolve_config_for_state turns auto ON only for scenes whose
    clustering exceeds the bucket+residual capacity."""
    d = config.bh_deep_levels
    if d == 0:
        return 0
    if d < 0:
        d = levels + 2
    return max(levels + 1, min(d, _MAX_DEEP_2D)) if d > levels else 0


def _resolve_tile_params(config: SimConfig, deep: int,
                         radius: int) -> Tuple[int, int, int]:
    """(k sub-levels, tile side t, tile count T) for the hot-zone sub-box
    refinement; (0, 0, 0) disables. Auto (bh_tile_levels=-1) refines 3
    levels (8x finer smoothing) whenever the deep chain is on. t shrinks
    until the deep grid holds at least max(T, 4) tiles; tiles disable if
    that pushes t below the 2R window-halo minimum or t does not divide
    the deep grid."""
    k = config.bh_tile_levels
    if deep == 0 or k == 0:
        return 0, 0, 0
    if k < 0:
        k = 3
    t = config.bh_tile_size or 32      # 0 = auto (2D default side)
    r_d = 1 << deep
    count = config.bh_tile_count
    while t > 2 and (r_d // max(t, 1)) ** 2 < max(count, 4):
        t //= 2
    if t < 2 * radius or t <= 0 or r_d % t:
        return 0, 0, 0
    return k, t, count


def _nf_use_pallas(config: SimConfig) -> bool:
    """The Pallas near-field kernel runs on TPU (or anywhere in interpret
    mode for testing); the XLA stencil is the oracle/CPU path."""
    return jax.default_backend() == "tpu" or config.pallas_interpret


def _resolve_radius(config: SimConfig) -> int:
    """Acceptance radius; bh_accept_radius=0 derives it from the classic
    opening angle theta (R ~ 1 + 1/theta), floored at R=3 (~2e-3 uniform
    field error) — defaults lean accurate since R=3 costs only ~15% over
    R=2 (2.1e12 vs 2.4e12 pairs-equiv/s at N=1M). Set bh_accept_radius=2
    explicitly for the reference's looser theta=1 fidelity (~1e-2)."""
    r = config.bh_accept_radius
    if r <= 0:
        r = max(3, int(round(1.0 + 1.0 / max(config.theta, 0.25))))
    return max(2, min(5, r))
