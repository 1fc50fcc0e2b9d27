"""3D octree FMM on TPU — the stencil tree code generalized to dim=3.

The reference is strictly 2D (Quadtree.hpp); this module is the framework's
own extension so that "3D is supported throughout" (config.py:30) includes
the tree code, not just the exact all-pairs kernels. It is the same
architecture as physics/barneshut.py, taken from quadtree to octree:

  upward:      one [N, 10]-payload scatter of the 3D raw moments
               (m, m*r_i, m*r_i*r_j) into the finest 2^L x 2^L x 2^L grid,
               2x2x2 sum-pool up the pyramid.
  M2L:         per level, for each static V-list offset (Chebyshev distance
               in [R, 2R-1], (4R-1)^3 - (2R-1)^3 offsets), shift the moment
               grids (pad + dynamic_slice under lax.scan) and accumulate a
               p=2 local expansion at each cell center: force F [3],
               Jacobian J [6 sym], force Hessian H [10 sym], with the
               quadrupole source moment folded into F. The boundary ring
               (cheb == 2R-1) is parity-gated exactly as in 2D, per axis.
  L2L:         re-center down the pyramid: F' = F + J d + 1/2 d^T H d,
               J' = J + H d, H' = H (d = child-center offset, 8 children).
  L2P:         ONE fused [19, N] gather of the local terms at each
               particle's finest cell + second-order Taylor evaluation.
  near field:  the (2R-1)^3 finest-cell neighborhood resolved particle-
               particle on a dense [r, r, r, K] bucket grid: for each
               static neighbor offset a broadcast K x K pairwise block.

The same two exactness safeguards as 2D (shared code, barneshut.py):
heavy-hitter extraction (top-64 masses above 0.1% of total leave the tree,
exact [N, 64] coupling) and the bucket-overflow residual (compact exact
near-masked pass, lax.cond-gated), plus outlier extraction so a distant
halo cannot inflate the bounding cube.

Derivatives (Plummer-softened kernel a_i = m d_i q^{-3/2}, q = |d|^2 + eps^2,
d = source - target):
  J_ij    = m [3 d_i d_j q^{-5/2} - delta_ij q^{-3/2}]
  T_ijk   = 15 d_i d_j d_k q^{-7/2}
            - 3 (delta_ij d_k + delta_ik d_j + delta_jk d_i) q^{-5/2}
  H_ijk   = m T_ijk;   quadrupole force F_i += 1/2 Q_jk T_ijk.
These are the 2D formulas (barneshut.py:199-231) with the index set {x,y,z};
all symmetric-tensor contractions are written out component-wise (6 J, 10 H).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.physics.barneshut import (
    NEAR_CAP,
    _OVERFLOW_CAP,
    _OVERFLOW_SMALL,
    _compact_indices,
    _extract_heavy_outliers,
    _near_masked_blocked,
    heavy_coupling,
)

_MAX_LEVELS_3D = 7   # 128^3 = 2M cells; L=8 (16M cells) overwhelms compile


def _bounding_cube(pos: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(corner, size) of a cube containing all particles, slightly padded."""
    mn = jnp.min(pos, axis=0)
    mx = jnp.max(pos, axis=0)
    center = 0.5 * (mn + mx)
    size = jnp.max(mx - mn) * 1.0001 + 1e-6
    return center - 0.5 * size, size


def _moment_payload3(pos, mass):
    """[N, 10] raw-moment rows: m, m*x, m*y, m*z, m*xx, m*xy, m*xz, m*yy,
    m*yz, m*zz (quadrupole about the COM derived in M2L; raw moments pool
    additively)."""
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    return jnp.stack(
        (mass, mass * px, mass * py, mass * pz,
         mass * px * px, mass * px * py, mass * px * pz,
         mass * py * py, mass * py * pz, mass * pz * pz), axis=-1)


def _synth_quad_channels3(g4):
    """(m, sx, sy, sz) -> 10 raw-moment channels with point-at-COM
    quadrupoles (see barneshut._synth_quad_channels). Stacked form, used
    by the small per-tile grids ([T, w, w, w, 4])."""
    m, sx, sy, sz = (g4[..., i] for i in range(4))
    inv = jnp.where(m > 0, 1.0 / jnp.where(m > 0, m, 1.0), 0.0)
    return jnp.stack(
        (m, sx, sy, sz, sx * sx * inv, sx * sy * inv, sx * sz * inv,
         sy * sy * inv, sy * sz * inv, sz * sz * inv), axis=-1)


def _synth_quad_tuple3(g4t):
    """Per-channel form of `_synth_quad_channels3`: tuple of 4 grids in,
    tuple of 10 out. The full-resolution pyramid stores channels as
    SEPARATE arrays — a channel-last [r, r, r, 10] tiles its 10-wide minor
    dim to 128 lanes (12.8x HBM) and its pooling reshapes to 128x padded
    temps under remat; at the 256^3 deep grid that alone OOMed the r3
    compile (measured: 65 GB HLO temp, 2.2% utilization)."""
    m, sx, sy, sz = g4t
    inv = jnp.where(m > 0, 1.0 / jnp.where(m > 0, m, 1.0), 0.0)
    return (m, sx, sy, sz, sx * sx * inv, sx * sy * inv, sx * sz * inv,
            sy * sy * inv, sy * sz * inv, sz * sz * inv)


def _pool2x3(a):
    """2x downsample-sum of a [X, Y, Z] grid by per-axis strided slice
    adds. Layout-safe: the one-shot reshape(r,2,r,2,r,2).sum((1,3,5))
    creates [.., 2]-minor temps that TPU tiling pads 64-128x when remat
    materializes them (the r3 256^3 compile OOM); every temp here keeps a
    full-size lane dimension."""
    a = a[0::2] + a[1::2]
    a = a[:, 0::2] + a[:, 1::2]
    return a[:, :, 0::2] + a[:, :, 1::2]


def _build_pyramid3(pos, mass, levels: int, synth_quad: bool = False):
    """Moment grids for levels L..0 (fine to coarse), each a TUPLE of 10
    per-channel [r, r, r] arrays (channel-last storage pads 12.8x under
    TPU tiling — see `_synth_quad_tuple3`). One fused [N, C] scatter at
    the finest level, column-sliced per channel; per-channel strided
    pooling above. synth_quad: 4-channel scatter + point-at-COM
    quadrupole synthesis at the finest level (deep mode; see
    barneshut._build_pyramid)."""
    corner, size = _bounding_cube(pos)
    res = 1 << levels
    u = (pos - corner) / size
    ci = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)     # [N, 3]
    flat = (ci[:, 0] * res + ci[:, 1]) * res + ci[:, 2]

    c = 4 if synth_quad else 10
    gflat = jnp.zeros((res ** 3, c), pos.dtype).at[flat].add(
        _moment_payload3(pos, mass)[:, :c])
    chans = tuple(gflat[:, i].reshape(res, res, res) for i in range(c))
    g = _synth_quad_tuple3(chans) if synth_quad else chans
    grids = {levels: g}
    for l in range(levels - 1, -1, -1):
        g = tuple(_pool2x3(a) for a in g)
        grids[l] = g
    return grids, corner, size, ci, flat


def _m2l_level3(g10, corner, size, eps_sq, radius: int):
    """V-list pass at one full level -> p=2 local terms (19 x [r,r,r]).

    g10: tuple of 10 per-channel [r, r, r] grids (the pyramid's native
    form) or a stacked [r, r, r, 10] array (the small vmapped tile
    grids). Even grids (every real level: r = 2^l) run as the
    parent-level MXU contraction (`_m2l_conv3`); the scan stencil remains
    as the oracle and odd-size fallback."""
    if not isinstance(g10, tuple):
        g10 = tuple(g10[..., i] for i in range(10))
    r_full = g10[0].shape[0]
    if r_full % 2 == 0 and r_full >= 2:
        qh = radius - 1
        gxt = tuple(jnp.pad(g, ((2 * qh, 2 * qh), (0, 0), (0, 0)))
                    for g in g10)
        return _m2l_conv3(gxt, corner, size, r_full, eps_sq, radius,
                          row0=jnp.int32(0), rows=r_full)
    p = 2 * radius - 1
    window = tuple(jnp.pad(g, p) for g in g10)
    return _m2l_stencil3(window, corner, size, r_full, eps_sq, radius,
                         row0=jnp.int32(0), rows=r_full)


def _m2l_stencil3(window, corner, size, r_full: int, eps_sq, radius: int,
                  row0, rows: int, offsets=None, gate_parity: bool = True,
                  pad: int | None = None):
    """V-list stencil over an x-banded window of raw moment grids.

    `window`: the 10 raw moment grids, [rows + 2p, r_full + 2p, r_full + 2p]
    each (p = 2*radius - 1, or `pad` when given): the `rows` target x-slabs
    plus p halo slabs on each side (zeros beyond the global grid) and p
    zero-padded y/z faces. `row0` is the global x index of the first
    target slab (traced; the banded multi-chip path passes my_band *
    rows). Output terms are [rows, r_full, r_full]. Mirrors the 2D
    `_m2l_stencil` (barneshut.py:136), including its offsets/gate_parity/
    pad generalization used by the deep-aggregate ring fold."""
    R = radius
    p = 2 * R - 1 if pad is None else pad
    dtype = window[0].dtype

    m_w = window[0]
    safe_m = jnp.where(m_w > 0, m_w, 1.0)
    com = [window[1 + a] / safe_m for a in range(3)]
    # Quadrupole about the COM (dipole vanishes by construction).
    raw = window[4:10]
    cx_, cy_, cz_ = com
    q_w = (raw[0] - m_w * cx_ * cx_, raw[1] - m_w * cx_ * cy_,
           raw[2] - m_w * cx_ * cz_, raw[3] - m_w * cy_ * cy_,
           raw[4] - m_w * cy_ * cz_, raw[5] - m_w * cz_ * cz_)

    s_l = size / r_full
    shape = (rows, r_full, r_full)
    ii = lax.broadcasted_iota(jnp.int32, shape, 0) + row0
    jj = lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = lax.broadcasted_iota(jnp.int32, shape, 2)
    cx = corner[0] + (ii.astype(dtype) + 0.5) * s_l
    cy = corner[1] + (jj.astype(dtype) + 0.5) * s_l
    cz = corner[2] + (kk.astype(dtype) + 0.5) * s_l
    parx, pary, parz = ii & 1, jj & 1, kk & 1

    if offsets is None:
        offsets = [(ox, oy, oz)
                   for ox in range(-p, p + 1)
                   for oy in range(-p, p + 1)
                   for oz in range(-p, p + 1)
                   if max(abs(ox), abs(oy), abs(oz)) >= R]
    offsets = jnp.array(offsets, jnp.int32)

    def body(carry, o):
        (fx, fy, fz, jxx, jxy, jxz, jyy, jyz, jzz,
         hxxx, hxxy, hxxz, hxyy, hxyz, hxzz, hyyy, hyyz, hyzz, hzzz) = carry
        ox, oy, oz = o[0], o[1], o[2]
        start = (p + ox, p + oy, p + oz)
        ms = lax.dynamic_slice(m_w, start, shape)
        sx = lax.dynamic_slice(com[0], start, shape)
        sy = lax.dynamic_slice(com[1], start, shape)
        sz = lax.dynamic_slice(com[2], start, shape)
        sq = [lax.dynamic_slice(q_w[i], start, shape) for i in range(6)]
        if gate_parity:
            # Boundary ring (cheb == 2R-1): parity-gated for exactly-once
            # coverage (source's parent inside the parent-level near set).
            cheb = jnp.maximum(jnp.maximum(jnp.abs(ox), jnp.abs(oy)),
                               jnp.abs(oz))
            pxo = (ox + parx) >> 1
            pyo = (oy + pary) >> 1
            pzo = (oz + parz) >> 1
            pm_ok = ((jnp.abs(pxo) <= R - 1) & (jnp.abs(pyo) <= R - 1)
                     & (jnp.abs(pzo) <= R - 1))
            keep = (cheb < 2 * R - 1) | pm_ok
            ms = jnp.where(keep, ms, 0.0)
            sq = [jnp.where(keep, s, 0.0) for s in sq]
        sqxx, sqxy, sqxz, sqyy, sqyz, sqzz = sq

        dx = sx - cx
        dy = sy - cy
        dz = sz - cz
        q = dx * dx + dy * dy + dz * dz + eps_sq
        inv = lax.rsqrt(q)
        inv3 = inv * inv * inv
        inv5 = inv3 * inv * inv
        inv7 = inv5 * inv * inv
        w3 = ms * inv3
        w5 = 3.0 * ms * inv5
        u7 = 15.0 * inv7
        u5 = 3.0 * inv5
        # Unit-mass third-derivative tensor components (10).
        txxx = u7 * dx * dx * dx - 3.0 * u5 * dx
        txxy = u7 * dx * dx * dy - u5 * dy
        txxz = u7 * dx * dx * dz - u5 * dz
        txyy = u7 * dx * dy * dy - u5 * dx
        txyz = u7 * dx * dy * dz
        txzz = u7 * dx * dz * dz - u5 * dx
        tyyy = u7 * dy * dy * dy - 3.0 * u5 * dy
        tyyz = u7 * dy * dy * dz - u5 * dz
        tyzz = u7 * dy * dz * dz - u5 * dy
        tzzz = u7 * dz * dz * dz - 3.0 * u5 * dz
        # Quadrupole source term: F_i += 1/2 Q_jk T_ijk.
        fq_x = 0.5 * (sqxx * txxx + sqyy * txyy + sqzz * txzz
                      + 2.0 * (sqxy * txxy + sqxz * txxz + sqyz * txyz))
        fq_y = 0.5 * (sqxx * txxy + sqyy * tyyy + sqzz * tyzz
                      + 2.0 * (sqxy * txyy + sqxz * txyz + sqyz * tyyz))
        fq_z = 0.5 * (sqxx * txxz + sqyy * tyyz + sqzz * tzzz
                      + 2.0 * (sqxy * txyz + sqxz * txzz + sqyz * tyzz))
        return (fx + w3 * dx + fq_x, fy + w3 * dy + fq_y,
                fz + w3 * dz + fq_z,
                jxx + w5 * dx * dx - w3,
                jxy + w5 * dx * dy,
                jxz + w5 * dx * dz,
                jyy + w5 * dy * dy - w3,
                jyz + w5 * dy * dz,
                jzz + w5 * dz * dz - w3,
                hxxx + ms * txxx, hxxy + ms * txxy, hxxz + ms * txxz,
                hxyy + ms * txyy, hxyz + ms * txyz, hxzz + ms * txzz,
                hyyy + ms * tyyy, hyyz + ms * tyyz, hyzz + ms * tyzz,
                hzzz + ms * tzzz), None

    zeros = jnp.zeros(shape, dtype)
    out, _ = lax.scan(body, (zeros,) * 19, offsets)
    return out


# ---------------------------------------------------------------------------
# M2L as one MXU contraction (the TPU-native form of the V-list stencil).
#
# Re-centering each cell's moments to its CELL CENTER (instead of its COM)
# makes M2L translation-invariant: the kernel-derivative tensors are then
# evaluated at fixed lattice offsets o * s_l, so the whole level is a
# convolution. The parity-gated boundary ring becomes exact under a
# space-to-depth (parent-level) view: a kept tap for target child-parity e
# and source child-position f always lies at parent offset PO = (o+e)>>1
# with |PO|_inf <= R-1 (inner taps satisfy it automatically; for ring taps
# cheb(o) == 2R-1 it is exactly the gate `pm_ok` of _m2l_stencil3). So the
# ENTIRE level is (2R-1)^3 parent-offset taps of an [8*10] -> [8*19]
# channel contraction: 27 static slices + dot_general on the MXU at R=2,
# replacing a 316-iteration HBM-bound scan. Measured (v5e, N=1M uniform):
# the L=7 far field drops ~1.3 s -> MXU-bound milliseconds.
#
# Equivalence to the COM form: monopole+quadrupole about the center carries
# the same information as monopole+quadrupole about the COM (the dipole
# about the center is kept as 3 extra channels and folded into F and J);
# the only difference is truncation of higher-order cross terms in H, which
# the accuracy tests bound.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _m2l_conv_taps(radius: int, r_parent: int, dim: int):
    """Static tap table for the parent-level M2L contraction.

    Returns (po_lin, e_lin, f_lin, o) numpy int arrays over every kept tap:
    parent offset PO (linearized over the (2*r_parent-1)^dim kernel),
    target child parity e, source child position f, and the child-level
    offset o = 2*PO + f - e with cheb(o) >= radius.

    r_parent is the acceptance radius the PARENT level ran with: the
    parent left cells at parent-cheb <= r_parent-1 uncovered, so this
    level's taps live at |PO|_inf <= r_parent - 1. Same-radius chains pass
    r_parent == radius; the deep-overflow chain transitions R=3 -> R=2
    with one (radius=2, r_parent=3) level."""
    import itertools

    import numpy as np

    q = r_parent - 1
    k = 2 * r_parent - 1
    po_l, e_l, f_l, os_ = [], [], [], []
    for po in itertools.product(range(-q, q + 1), repeat=dim):
        for ei, e in enumerate(itertools.product((0, 1), repeat=dim)):
            for fi, f in enumerate(itertools.product((0, 1), repeat=dim)):
                o = tuple(2 * po[a] + f[a] - e[a] for a in range(dim))
                if max(abs(c) for c in o) < radius:
                    continue          # near field, not M2L
                lin = 0
                for a in range(dim):
                    lin = lin * k + po[a] + q
                po_l.append(lin)
                e_l.append(ei)
                f_l.append(fi)
                os_.append(o)
    return (np.asarray(po_l, np.int32), np.asarray(e_l, np.int32),
            np.asarray(f_l, np.int32), np.asarray(os_, np.int32))


def _m2l_conv_weights3(radius: int, r_parent: int, eps_sq_hat, dtype):
    """[(2Rp-1)^3, 80, 152] tap weights W[PO, f*10+c_in, e*19+t_out].

    SCALE-FREE form: offsets are the raw lattice vectors o (O(1) numbers)
    and eps_sq_hat = eps_sq / s_l^2; the caller feeds centered moments in
    cell units (d/s_l, Q/s_l^2) and scales output term t by s_l^-(2,3,4)
    for (F, J, H). Computing at physical scale underflows f32 — inv9 at
    s_l ~ 1.5e4 is ~1e-40. eps_sq_hat is traced (the bounding cube depends
    on the positions), so weights are built inside the jit — ~2k taps of
    scalar math, negligible."""
    import numpy as np

    po, el, fl, O = _m2l_conv_taps(radius, r_parent, 3)
    r = jnp.asarray(O).astype(dtype)                           # [T, 3]
    rx, ry, rz = r[:, 0], r[:, 1], r[:, 2]
    q = rx * rx + ry * ry + rz * rz + eps_sq_hat
    inv = lax.rsqrt(q)
    inv3 = inv * inv * inv
    inv5 = inv3 * inv * inv
    inv7 = inv5 * inv * inv

    txxx = 15.0 * rx * rx * rx * inv7 - 9.0 * rx * inv5
    txxy = 15.0 * rx * rx * ry * inv7 - 3.0 * ry * inv5
    txxz = 15.0 * rx * rx * rz * inv7 - 3.0 * rz * inv5
    txyy = 15.0 * rx * ry * ry * inv7 - 3.0 * rx * inv5
    txyz = 15.0 * rx * ry * rz * inv7
    txzz = 15.0 * rx * rz * rz * inv7 - 3.0 * rx * inv5
    tyyy = 15.0 * ry * ry * ry * inv7 - 9.0 * ry * inv5
    tyyz = 15.0 * ry * ry * rz * inv7 - 3.0 * rz * inv5
    tyzz = 15.0 * ry * rz * rz * inv7 - 3.0 * ry * inv5
    tzzz = 15.0 * rz * rz * rz * inv7 - 9.0 * rz * inv5
    zero = jnp.zeros_like(rx)

    # Rank-4 derivative tensor U_ijkl = dT_ijk/dr_l (fully symmetric, 15
    # unique). Folding it into the weights gives the dipole->H and
    # quadrupole->J couplings that the COM form carries implicitly by
    # evaluating at the COM — restoring COM-level accuracy for free (the
    # contraction shape is unchanged, only W gets denser).
    inv9 = inv7 * inv * inv
    x2, y2, z2 = rx * rx, ry * ry, rz * rz

    def u_aaaa(a2):
        return -105.0 * a2 * a2 * inv9 + 90.0 * a2 * inv7 - 9.0 * inv5

    def u_aaab(ra, rb, a2):
        return -105.0 * a2 * ra * rb * inv9 + 45.0 * ra * rb * inv7

    def u_aabb(a2, b2):
        return -105.0 * a2 * b2 * inv9 + 15.0 * (a2 + b2) * inv7 - 3.0 * inv5

    def u_aabc(a2, rb, rc):
        return -105.0 * a2 * rb * rc * inv9 + 15.0 * rb * rc * inv7

    uxxxx = u_aaaa(x2)
    uyyyy = u_aaaa(y2)
    uzzzz = u_aaaa(z2)
    uxxxy = u_aaab(rx, ry, x2)
    uxxxz = u_aaab(rx, rz, x2)
    uxyyy = u_aaab(ry, rx, y2)
    uyyyz = u_aaab(ry, rz, y2)
    uxzzz = u_aaab(rz, rx, z2)
    uyzzz = u_aaab(rz, ry, z2)
    uxxyy = u_aabb(x2, y2)
    uxxzz = u_aabb(x2, z2)
    uyyzz = u_aabb(y2, z2)
    uxxyz = u_aabc(x2, ry, rz)
    uxyyz = u_aabc(y2, rx, rz)
    uxyzz = u_aabc(z2, rx, ry)

    def row(f3, j6, h10):
        return jnp.stack(tuple(f3) + tuple(j6) + tuple(h10), axis=-1)

    # monopole: F = inv3 r_i; J = 3 r_i r_j inv5 - delta inv3; H = T.
    row_m = row(
        (inv3 * rx, inv3 * ry, inv3 * rz),
        (3.0 * rx * rx * inv5 - inv3, 3.0 * rx * ry * inv5,
         3.0 * rx * rz * inv5, 3.0 * ry * ry * inv5 - inv3,
         3.0 * ry * rz * inv5, 3.0 * rz * rz * inv5 - inv3),
        (txxx, txxy, txxz, txyy, txyz, txzz, tyyy, tyyz, tyzz, tzzz))
    # dipole d_a: F_i = delta_ia inv3 - 3 r_i r_a inv5; J_ij = -T_ija;
    # H_ijk = +U_ijka.
    row_dx = row(
        (inv3 - 3.0 * rx * rx * inv5, -3.0 * ry * rx * inv5,
         -3.0 * rz * rx * inv5),
        (-txxx, -txxy, -txxz, -txyy, -txyz, -txzz),
        (uxxxx, uxxxy, uxxxz, uxxyy, uxxyz, uxxzz,
         uxyyy, uxyyz, uxyzz, uxzzz))
    row_dy = row(
        (-3.0 * rx * ry * inv5, inv3 - 3.0 * ry * ry * inv5,
         -3.0 * rz * ry * inv5),
        (-txxy, -txyy, -txyz, -tyyy, -tyyz, -tyzz),
        (uxxxy, uxxyy, uxxyz, uxyyy, uxyyz, uxyzz,
         uyyyy, uyyyz, uyyzz, uyzzz))
    row_dz = row(
        (-3.0 * rx * rz * inv5, -3.0 * ry * rz * inv5,
         inv3 - 3.0 * rz * rz * inv5),
        (-txxz, -txyz, -txzz, -tyyz, -tyzz, -tzzz),
        (uxxxz, uxxyz, uxxzz, uxyyz, uxyzz, uxzzz,
         uyyyz, uyyzz, uyzzz, uzzzz))
    # quadrupole Q_ab (stored once per symmetric pair, mult folds the
    # off-diagonal double count): F_i = mult/2 T_iab; J_ij = -mult/2 U_ijab.
    zeros10 = (zero,) * 10

    def qrow(mult, t3, u6):
        h = 0.5 * mult
        return row((h * t3[0], h * t3[1], h * t3[2]),
                   tuple(-h * u for u in u6), zeros10)

    row_qxx = qrow(1.0, (txxx, txxy, txxz),
                   (uxxxx, uxxxy, uxxxz, uxxyy, uxxyz, uxxzz))
    row_qxy = qrow(2.0, (txxy, txyy, txyz),
                   (uxxxy, uxxyy, uxxyz, uxyyy, uxyyz, uxyzz))
    row_qxz = qrow(2.0, (txxz, txyz, txzz),
                   (uxxxz, uxxyz, uxxzz, uxyyz, uxyzz, uxzzz))
    row_qyy = qrow(1.0, (txyy, tyyy, tyyz),
                   (uxxyy, uxyyy, uxyyz, uyyyy, uyyyz, uyyzz))
    row_qyz = qrow(2.0, (txyz, tyyz, tyzz),
                   (uxxyz, uxyyz, uxyzz, uyyyz, uyyzz, uyzzz))
    row_qzz = qrow(1.0, (txzz, tyzz, tzzz),
                   (uxxzz, uxyzz, uxzzz, uyyzz, uyzzz, uzzzz))

    B = jnp.stack((row_m, row_dx, row_dy, row_dz, row_qxx, row_qxy,
                   row_qxz, row_qyy, row_qyz, row_qzz), axis=1)  # [T,10,19]
    k3 = (2 * r_parent - 1) ** 3
    ci = fl[:, None, None] * 10 + np.arange(10)[None, :, None]
    ti = el[:, None, None] * 19 + np.arange(19)[None, None, :]
    pb = np.broadcast_to(po[:, None, None], ci.shape)
    return jnp.zeros((k3, 80, 152), dtype).at[pb, ci, ti].set(B)


def _center_channels3(g10t, corner, size, r_full: int, x0):
    """Raw origin moments (tuple of 10 [X, r, r] grids) -> moments about
    each cell's own center in CELL UNITS: (m, d_i / s_l, Q_ij / s_l^2),
    matching the scale-free weights, as a tuple again (per-channel storage
    — see `_synth_quad_tuple3`). x0 = global x index of row 0 (traced in
    the banded path)."""
    dtype = g10t[0].dtype
    s_l = size / r_full
    inv_s = 1.0 / s_l
    shape = g10t[0].shape
    cx = corner[0] + (lax.broadcasted_iota(jnp.int32, shape, 0) + x0
                      ).astype(dtype) * s_l + 0.5 * s_l
    cy = corner[1] + (lax.broadcasted_iota(jnp.int32, shape, 1)
                      ).astype(dtype) * s_l + 0.5 * s_l
    cz = corner[2] + (lax.broadcasted_iota(jnp.int32, shape, 2)
                      ).astype(dtype) * s_l + 0.5 * s_l
    m = g10t[0]
    sx, sy, sz = g10t[1], g10t[2], g10t[3]
    inv2 = inv_s * inv_s
    return (m,
            (sx - m * cx) * inv_s,
            (sy - m * cy) * inv_s,
            (sz - m * cz) * inv_s,
            (g10t[4] - 2.0 * cx * sx + m * cx * cx) * inv2,
            (g10t[5] - cx * sy - cy * sx + m * cx * cy) * inv2,
            (g10t[6] - cx * sz - cz * sx + m * cx * cz) * inv2,
            (g10t[7] - 2.0 * cy * sy + m * cy * cy) * inv2,
            (g10t[8] - cy * sz - cz * sy + m * cy * cz) * inv2,
            (g10t[9] - 2.0 * cz * sz + m * cz * cz) * inv2)


def _m2l_conv3(gxt, corner, size, r_full: int, eps_sq, radius: int,
               row0, rows: int, r_parent: int | None = None):
    """One level of M2L as the parent-level MXU contraction.

    gxt: tuple of 10 per-channel [rows + 4(Rp-1), r_full, r_full] raw
    moment x-windows whose first and last 2(Rp-1) slabs are halo (zeros
    beyond the global grid); row 0 is global x index row0 - 2(Rp-1). row0
    and rows must be even. r_parent (default radius) is the parent
    level's acceptance radius — see _m2l_conv_taps. Returns the 19 local
    terms, [rows, r_full, r_full] each."""
    R = radius
    Rp = radius if r_parent is None else r_parent
    qh = Rp - 1
    # The permutation-matrix parity build below covers lane indices
    # 0..2h-1 only: an odd r_full would silently DROP the last row/column
    # (wrong forces) where the old strided-slice reshape errored. Current
    # callers guarantee evenness (r_l = 1 << l); fail loudly if that ever
    # changes (advisor r4).
    assert r_full % 2 == 0 and rows % 2 == 0, (r_full, rows)
    h = r_full // 2
    hb = rows // 2
    dtype = gxt[0].dtype

    ch = _center_channels3(gxt, corner, size, r_full, row0 - 2 * qh)
    # Space-to-depth ON THE MXU, landed channel-minor by an IDENTITY
    # CONTRACTION. Every direct formulation OOMed 16 GB HBM at the
    # clustered-1M deep levels (r3/r4): stack(axis=-1) materializes 80
    # width-1 lane-minor concat operands at 128x tile padding (450 MB per
    # [8,50,48,48,1] remat copy); the one-shot [X/2,2,h,2,h,2,10]
    # reshape/transpose padded 51x; and a stack(axis=0) + transpose still
    # OOMed under vmap — XLA's layout assignment propagates the conv's
    # channel-minor layout UP through the concat, re-minoring the size-1
    # stack axis. Per-channel [a::2, b::2, d::2] strided slices avoided
    # all of that but cost 2.40 s of the 3.51 s level-8 stage at 256^3 —
    # stride 2 on the tiled (sublane, lane) axes lowers to a relayout
    # copy per slice (r4, scripts/exp_m8build3.py E2). Instead the y/z
    # parity splits run as TWO PERMUTATION-MATRIX dot_generals per
    # (channel, x-parity): P reorders the 256 lanes to (even | odd)
    # halves, so the 8 parity pieces become contiguous tile-aligned
    # slices; only the outer x axis keeps a strided slice (slab-granular,
    # cheap). Measured 0.030 s vs 2.40 s, bit-exact vs the slice build
    # (exp_m8build3.py F; permutation rows are one-hot so HIGHEST is
    # exact). Flattened 1-D pieces + stack(axis=0) give the stack no
    # small dim to re-minor, and layouts do not propagate through a dot:
    # contracting against eye(80) lands m8 directly in the conv's NDHWC
    # layout. Lane order (4a+2b+d)*10 + c matches _m2l_conv_taps' child
    # enumeration.
    perm = np.zeros((r_full, r_full), np.float32)
    half_idx = np.arange(h)
    perm[2 * half_idx, half_idx] = 1.0
    perm[2 * half_idx + 1, half_idx + h] = 1.0
    perm = jnp.asarray(perm, dtype)
    pieces = {}
    for c in range(10):
        for a in (0, 1):
            g = ch[c][a::2]                            # [X/2, y, z]
            gy = lax.dot_general(g, perm, (((1,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST)
            gz = lax.dot_general(gy, perm, (((1,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST)
            for b in (0, 1):                           # gz: [X/2, y', z']
                for d in (0, 1):
                    pieces[(a, b, d, c)] = lax.slice(
                        gz, (0, b * h, d * h),
                        (gz.shape[0], b * h + h, d * h + h))
    flat = jnp.stack(
        [pieces[(a, b, d, c)].reshape(-1)
         for a in (0, 1) for b in (0, 1) for d in (0, 1)
         for c in range(10)], axis=0)                  # [80, X/2*h*h]
    m8 = lax.dot_general(
        flat, jnp.eye(80, dtype=dtype), (((0,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST)               # [X/2*h*h, 80]
    m8 = m8.reshape(hb + 2 * qh, h, h, 80)
    m8 = jnp.pad(m8, ((0, 0), (qh, qh), (qh, qh), (0, 0)))
    s_l = size / r_full
    W = _m2l_conv_weights3(R, Rp, eps_sq / (s_l * s_l), dtype)

    k = 2 * Rp - 1
    # One k^3 VALID convolution instead of a scan of k^3 shifted
    # dot_generals — the scan re-reads the full parent-level window from
    # HBM per tap (see the 2D _m2l_conv note; measured 14% faster at
    # 4096^2, scripts/exp_m2l_conv.py). Deep grids (r >= 256, i.e.
    # 256^3 = 16.7M cells and up) take HIGH like the 2D deep levels —
    # bf16x3's 2.2e-5 term error sits far below the PM budget there.
    prec = (lax.Precision.HIGH if r_full >= 256
            else lax.Precision.HIGHEST)
    out = lax.conv_general_dilated(
        m8[None], W.reshape(k, k, k, 80, 152), window_strides=(1, 1, 1),
        padding="VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=prec)[0].reshape(hb * h * h, 152)
    # back to physical units: F, J, H scale as s_l^-(2, 3, 4).
    inv_s = 1.0 / s_l
    s2 = inv_s * inv_s
    scales = (s2,) * 3 + (s2 * inv_s,) * 6 + (s2 * s2,) * 10
    # De-space-to-depth PER TERM with per-axis interleaves (see the 2D
    # _m2l_conv epilogue: the one-shot [..., 19] transpose + size-1 minor
    # slices pad catastrophically under TPU tiling).
    terms = []
    for t in range(19):
        a = {(c, d, e): out[:, ((4 * c + 2 * d + e) * 19 + t)]
             .reshape(hb, h, h) for c in (0, 1) for d in (0, 1)
             for e in (0, 1)}
        # interleave z, then y, then x
        az = {(c, d): jnp.stack([a[(c, d, 0)], a[(c, d, 1)]], axis=-1)
              .reshape(hb, h, r_full) for c in (0, 1) for d in (0, 1)}
        ay = {c: jnp.stack([az[(c, 0)], az[(c, 1)]], axis=2)
              .reshape(hb, r_full, r_full) for c in (0, 1)}
        terms.append(jnp.stack([ay[0], ay[1]], axis=1)
                     .reshape(rows, r_full, r_full) * scales[t])
    return tuple(terms)


def _taylor_eval3(local19, ex, ey, ez):
    """Second-order Taylor of (F, J) at offset (ex, ey, ez). Shared by L2L
    (child-center offsets) and L2P (particle offsets). Returns the 19 terms
    re-centered (H unchanged)."""
    (fx, fy, fz, jxx, jxy, jxz, jyy, jyz, jzz,
     hxxx, hxxy, hxxz, hxyy, hxyz, hxzz, hyyy, hyyz, hyzz, hzzz) = local19
    fxc = (fx + jxx * ex + jxy * ey + jxz * ez
           + 0.5 * (hxxx * ex * ex + hxyy * ey * ey + hxzz * ez * ez)
           + hxxy * ex * ey + hxxz * ex * ez + hxyz * ey * ez)
    fyc = (fy + jxy * ex + jyy * ey + jyz * ez
           + 0.5 * (hxxy * ex * ex + hyyy * ey * ey + hyzz * ez * ez)
           + hxyy * ex * ey + hxyz * ex * ez + hyyz * ey * ez)
    fzc = (fz + jxz * ex + jyz * ey + jzz * ez
           + 0.5 * (hxxz * ex * ex + hyyz * ey * ey + hzzz * ez * ez)
           + hxyz * ex * ey + hxzz * ex * ez + hyzz * ey * ez)
    jxxc = jxx + hxxx * ex + hxxy * ey + hxxz * ez
    jxyc = jxy + hxxy * ex + hxyy * ey + hxyz * ez
    jxzc = jxz + hxxz * ex + hxyz * ey + hxzz * ez
    jyyc = jyy + hxyy * ex + hyyy * ey + hyyz * ez
    jyzc = jyz + hxyz * ex + hyyz * ey + hyzz * ez
    jzzc = jzz + hxzz * ex + hyzz * ey + hzzz * ez
    return (fxc, fyc, fzc, jxxc, jxyc, jxzc, jyyc, jyzc, jzzc,
            hxxx, hxxy, hxxz, hxyy, hxyz, hxzz, hyyy, hyyz, hyzz, hzzz)


def _l2l_upsample3(local19, s_child):
    """Shift parent local expansions to the 8 child centers and upsample.
    Works on full cubic grids and on x-banded slabs [rb, r, r] alike (the
    banded multi-chip path; band starts are even in child coordinates, so
    local-axis parity equals global parity)."""

    def up(a):
        return jnp.repeat(
            jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1), 2, axis=2)

    dtype = local19[0].dtype
    shape2 = tuple(2 * s for s in local19[0].shape)
    ex = ((lax.broadcasted_iota(jnp.int32, shape2, 0) & 1)
          .astype(dtype) - 0.5) * s_child
    ey = ((lax.broadcasted_iota(jnp.int32, shape2, 1) & 1)
          .astype(dtype) - 0.5) * s_child
    ez = ((lax.broadcasted_iota(jnp.int32, shape2, 2) & 1)
          .astype(dtype) - 0.5) * s_child
    return _taylor_eval3(tuple(up(a) for a in local19), ex, ey, ez)


def _bucket_stencil3(bx, by, bz, bm, rr: int, eps_sq,
                     center_rows: int | None = None):
    """K x K pair stencil over a dense 3D bucket grid.

    Two input layouts:
      center_rows=None: bx/by/bz/bm are [res, res, res, cap] full grids
        (the single-chip path); the x halo is padded internally.
      center_rows=c: bx/by/bz/bm are [c + 2rr, res, res, cap] x-banded
        windows whose first/last rr slabs are halo sources only (the
        banded multi-chip path).

    For each of the (2rr+1)^3 static neighbor offsets, a broadcast K x K
    pairwise block; empty slots carry zero mass so they vanish without
    masks. Chunked over the leading axis so temps stay bounded. Returns
    (ax, ay, az), [center_rows, res, res, cap]."""
    if center_rows is None:
        center_rows = bx.shape[0]

        def padx(a):
            return jnp.pad(a, ((rr, rr), (0, 0), (0, 0), (0, 0)))

        bx, by, bz, bm = padx(bx), padx(by), padx(bz), padx(bm)
    res = bx.shape[1]
    cap = bx.shape[3]
    dtype = bx.dtype
    rows = center_rows

    offsets = jnp.array(
        [(ox, oy, oz)
         for ox in range(-rr, rr + 1)
         for oy in range(-rr, rr + 1)
         for oz in range(-rr, rr + 1)], jnp.int32)

    def pad_yz(a):
        return jnp.pad(a, ((0, 0), (rr, rr), (rr, rr), (0, 0)))

    bx_p, by_p, bz_p, bm_p = (pad_yz(a) for a in (bx, by, bz, bm))
    tx, ty, tz = (a[rr:rr + rows] for a in (bx, by, bz))

    chunk = max(1, min(rows, (1 << 24) // max(1, res * res * cap * cap)))
    while rows % chunk:
        chunk -= 1
    n_chunks = rows // chunk

    def body(carry, o):
        ax, ay, az = carry
        start = (rr + o[0], rr + o[1], rr + o[2], 0)
        shp = (rows, res, res, cap)
        spx = lax.dynamic_slice(bx_p, start, shp)
        spy = lax.dynamic_slice(by_p, start, shp)
        spz = lax.dynamic_slice(bz_p, start, shp)
        sm = lax.dynamic_slice(bm_p, start, shp)

        def chunk_fn(args):
            txc, tyc, tzc, sxc, syc, szc, smc = args
            dx = sxc[..., None, :] - txc[..., :, None]
            dy = syc[..., None, :] - tyc[..., :, None]
            dz = szc[..., None, :] - tzc[..., :, None]
            d_sq = dx * dx + dy * dy + dz * dz
            inv = lax.rsqrt(d_sq + eps_sq)
            w = smc[..., None, :] * (inv * inv * inv)
            if eps_sq == 0.0:
                w = jnp.where(d_sq > 0.0, w, 0.0)
            return (jnp.sum(w * dx, axis=-1), jnp.sum(w * dy, axis=-1),
                    jnp.sum(w * dz, axis=-1))

        def chop(a):
            return a.reshape(n_chunks, chunk, res, res, cap)

        gx, gy, gz = lax.map(
            chunk_fn, tuple(chop(a) for a in
                            (tx, ty, tz, spx, spy, spz, sm)))
        full = (rows, res, res, cap)
        return (ax + gx.reshape(full), ay + gy.reshape(full),
                az + gz.reshape(full)), None

    zeros = jnp.zeros((rows, res, res, cap), dtype)
    (ax, ay, az), _ = lax.scan(body, (zeros, zeros, zeros), offsets)
    return ax, ay, az


def _near_field_buckets3(pos, mass, ci, flat, levels: int, eps_sq, g_const,
                         cap: int, radius: int,
                         use_pallas: bool = False, interpret: bool = False,
                         skip_residual: bool = False):
    """Particle-particle near field on a dense [r, r, r, cap] bucket grid.

    Returns (acc [N, 3], overflow_count). Same slot/overflow machinery as
    the 2D version (barneshut.py:_near_field_buckets); on the Pallas path
    particles scatter straight into the kernel's slot-major flat layout.
    skip_residual drops the overflow residual (deep chain covers it)."""
    n = pos.shape[0]
    res = 1 << levels

    order = jnp.argsort(flat)
    flat_s = flat[order]
    from nbodysim_tpu.core.blocking import sorted_first_occurrence

    first = sorted_first_occurrence(flat_s)
    slot = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    overflow = jnp.sum(slot >= cap)
    in_cap = slot < cap
    slot_c = jnp.minimum(slot, cap - 1)
    slot_w = jnp.where(in_cap, slot, cap)

    pos_s = pos[order]
    mass_s = mass[order]
    zero_m = jnp.where(in_cap, mass_s, 0.0)

    n_cells = res * res * res
    rr = radius - 1

    if use_pallas and rr >= 1:
        from nbodysim_tpu.kernels.nearfield import (
            _FlatLayout3, bucket_stencil3_pallas_flat)

        layout = _FlatLayout3(res, res, cap, rr, 512)
        cx = flat_s // (res * res)
        cyz = flat_s - cx * res * res
        cy = cyz // res
        cz = cyz - cy * res
        ok = flat_s < n_cells
        pf = jnp.where(ok, layout.flat_index(cx + rr, cy, cz), layout.f_len)

        def scat_f(v):
            return (jnp.zeros((cap, layout.f_len), pos.dtype)
                    .at[slot_w, pf].set(v, mode="drop"))

        outx, outy, outz = bucket_stencil3_pallas_flat(
            scat_f(pos_s[:, 0]), scat_f(pos_s[:, 1]), scat_f(pos_s[:, 2]),
            scat_f(zero_m), layout, eps_sq=eps_sq, interpret=interpret)
        opos = jnp.minimum(jnp.where(ok, layout.out_index(cx, cy, cz), 0),
                           outx.shape[1] - 1)
        keep = in_cap & ok
        ax_s = jnp.where(keep, outx[slot_c, opos], 0.0)
        ay_s = jnp.where(keep, outy[slot_c, opos], 0.0)
        az_s = jnp.where(keep, outz[slot_c, opos], 0.0)
    else:
        def scat(v):
            return (jnp.zeros((n_cells, cap), pos.dtype)
                    .at[flat_s, slot_w].set(v, mode="drop")
                    .reshape(res, res, res, cap))

        bx = scat(pos_s[:, 0])
        by = scat(pos_s[:, 1])
        bz = scat(pos_s[:, 2])
        bm = scat(zero_m)

        ax, ay, az = _bucket_stencil3(bx, by, bz, bm, rr, eps_sq)
        ax = ax.reshape(n_cells, cap)
        ay = ay.reshape(n_cells, cap)
        az = az.reshape(n_cells, cap)
        flat_c = jnp.minimum(flat_s, n_cells - 1)
        ax_s = jnp.where(in_cap, ax[flat_c, slot_c], 0.0)
        ay_s = jnp.where(in_cap, ay[flat_c, slot_c], 0.0)
        az_s = jnp.where(in_cap, az[flat_c, slot_c], 0.0)
    acc_s = jnp.stack([ax_s, ay_s, az_s], axis=-1)

    # Exact residual for bucket overflow (same scheme as 2D).
    m_cap = min(n, _OVERFLOW_CAP)
    ci_s = ci[order]

    def residual(cap_k: int):
        def apply(acc_s):
            over = ~in_cap
            o_idx = jnp.argsort(in_cap)[:cap_k]
            o_valid = over[o_idx]
            o_pos = pos_s[o_idx]
            o_mass = jnp.where(o_valid, mass_s[o_idx], 0.0)
            o_cell = ci_s[o_idx]
            acc_s = acc_s + _near_masked_blocked(
                pos_s, ci_s, o_pos, o_mass, o_cell, eps_sq, rr)
            cap_mass = jnp.where(in_cap, mass_s, 0.0)
            o_acc = _near_masked_blocked(
                o_pos, o_cell, pos_s, cap_mass, ci_s, eps_sq, rr)
            return acc_s.at[o_idx].add(
                jnp.where(o_valid[:, None], o_acc, 0.0))

        return apply

    # Tiered like the 2D residual (barneshut.py): mild overflow takes the
    # cheap pass, only genuinely clustered frames pay the full-cap one.
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
    return g_const * acc_s[inv_order], overflow


def _deep_near_aggregates3(pos, payload, gp, ci_deep, eps_sq, s_d,
                           rr: int, row0=0):
    """3D smoothed-aggregate near field of the deep-overflow path (the 3D
    instance of barneshut._deep_near_aggregates — see its docstring for
    the Plummer-cloud smoothing rationale and the pre-padded-window
    contract). gp: [rows + 2rr, r_d + 2rr, r_d + 2rr, 10] — the full grid
    zero-padded on the single chip, or an x-slab band whose rr halo slabs
    hold real ring-neighbor data (parallel/tree3d.py). `row0` is the
    global deep x-slab of the first REAL window slab; out-of-window
    targets gather clipped slabs and must be masked by the caller.
    Returns [N, 3]."""
    from nbodysim_tpu.physics.barneshut import _DEEP_SMOOTH

    eps_sq = eps_sq + _DEEP_SMOOTH * s_d * s_d
    rows = gp.shape[0] - 2 * rr
    side = gp.shape[1]
    gp = gp.reshape(-1, gp.shape[-1])
    ix = jnp.clip(ci_deep[:, 0] - row0, 0, rows - 1) + rr
    iy = ci_deep[:, 1] + rr
    iz = ci_deep[:, 2] + rr
    base = (ix * side + iy) * side + iz
    return _aggregate_window_eval3(gp, base, side, payload, pos, eps_sq,
                                   rr)


def _deep_near_aggregates3_packed(pos, payload, g4_pad, ci_deep, eps_sq,
                                  s_d):
    """y+z-packed variant of _deep_near_aggregates3 for the single-chip
    rin=1 window: the 27 per-offset row gathers were the deep path's
    dominant remaining stage (0.33 s at clustered N=1M, r5 profile)
    because TPU gathers are row-rate-bound (~20-25M rows/s) and each row
    fetches only 4 floats — 124 of 128 lanes wasted. Packing the 3x3
    (y, z)-neighbor cells into 36-lane rows (two dense concats,
    stencil-cheap; a 2.4 GB transient at the 256^3 deep cap) cuts the
    gathers to 3 of 9x-wider rows. g4_pad: [r+2, r+2, r+2, 4]
    rin=1-padded monopole grids (same input the unpacked call takes).
    Accumulation order matches _aggregate_window_eval3 (ox, oy, oz)
    bitwise."""
    from nbodysim_tpu.physics.barneshut import _DEEP_SMOOTH

    eps_sq = eps_sq + _DEEP_SMOOTH * s_d * s_d
    side = g4_pad.shape[1]
    r = side - 2
    gz = jnp.concatenate([g4_pad[:, :, :-2, :], g4_pad[:, :, 1:-1, :],
                          g4_pad[:, :, 2:, :]], axis=-1)  # [r+2, r+2, r, 12]
    gyz = jnp.concatenate([gz[:, :-2], gz[:, 1:-1], gz[:, 2:]],
                          axis=-1)                     # [r+2, r, r, 36]
    base = ((ci_deep[:, 0] + 1) * r + ci_deep[:, 1]) * r + ci_deep[:, 2]
    return _packed_mono_window3(gyz.reshape(-1, 36), base, r * r,
                                payload, pos, eps_sq)


def _packed_mono_window3(g36, base, xstride, payload, pos, eps_sq):
    """3-gather y+z-packed 3^3 monopole window kick. g36: [M, 36] rows
    holding the 3x3 (oy, oz)-neighbor (m, sx, sy, sz) cells, lane block
    12*(oy+1) + 4*(oz+1); base: [N] home row (y and z inner-unpadded;
    the x offset advances by `xstride` rows). eps_sq arrives ALREADY
    widened. Accumulation order matches _aggregate_window_eval3
    (ox, oy, oz) bitwise. Full 27-cell packing would gather once but
    costs a 108-lane grid (7 GB at the 256^3 deep level) — 3 gathers of
    36 lanes is the memory-feasible point on the row-rate-bound curve."""
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    ax = jnp.zeros_like(px)
    ay = jnp.zeros_like(py)
    az = jnp.zeros_like(pz)
    for ox in (-1, 0, 1):
        rows = g36[base + ox * xstride]                   # [N, 36]
        for jy in range(3):
            for jz in range(3):
                o = 12 * jy + 4 * jz
                ch = rows[:, o:o + 4]
                if ox == 0 and jy == 1 and jz == 1:
                    ch = ch - payload
                m = ch[:, 0]
                safe_m = jnp.where(m > 0, m, 1.0)
                dx = ch[:, 1] / safe_m - px
                dy = ch[:, 2] / safe_m - py
                dz = ch[:, 3] / safe_m - pz
                q = dx * dx + dy * dy + dz * dz + eps_sq
                inv = lax.rsqrt(q)
                w3 = m * (inv * inv * inv)
                ax = ax + w3 * dx
                ay = ay + w3 * dy
                az = az + w3 * dz
    return jnp.stack([ax, ay, az], axis=-1)


def _aggregate_window_eval3(gp_flat, base, side, payload, pos, eps_sq,
                            rr: int):
    """(2rr+1)^3 smoothed cell-aggregate kick shared by the full-grid deep
    path and the tile-refined path (3D instance of
    barneshut._aggregate_window_eval). gp_flat: [M, 10] flattened padded
    moment cells — or [M, 4] (m, sx, sy, sz) rows for pure
    monopole-at-COM cells (synthesized-quadrupole build; see the 2D
    docstring). base: [N] flat home-cell index; side: padded y/z side
    length (x stride = side^2). eps_sq arrives ALREADY widened."""
    mono = gp_flat.shape[1] == 4
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    ax = jnp.zeros_like(px)
    ay = jnp.zeros_like(py)
    az = jnp.zeros_like(pz)
    for ox in range(-rr, rr + 1):
        for oy in range(-rr, rr + 1):
            for oz in range(-rr, rr + 1):
                ch = gp_flat[base + ((ox * side + oy) * side + oz)]
                if ox == 0 and oy == 0 and oz == 0:
                    ch = ch - payload
                m = ch[:, 0]
                safe_m = jnp.where(m > 0, m, 1.0)
                cx = ch[:, 1] / safe_m
                cy = ch[:, 2] / safe_m
                cz = ch[:, 3] / safe_m
                dx = cx - px
                dy = cy - py
                dz = cz - pz
                q = dx * dx + dy * dy + dz * dz + eps_sq
                inv = lax.rsqrt(q)
                inv3 = inv * inv * inv
                w3 = m * inv3
                ax = ax + w3 * dx
                ay = ay + w3 * dy
                az = az + w3 * dz
                if mono:
                    continue
                qxx = ch[:, 4] - m * cx * cx
                qxy = ch[:, 5] - m * cx * cy
                qxz = ch[:, 6] - m * cx * cz
                qyy = ch[:, 7] - m * cy * cy
                qyz = ch[:, 8] - m * cy * cz
                qzz = ch[:, 9] - m * cz * cz
                inv5 = inv3 * inv * inv
                inv7 = inv5 * inv * inv
                u7 = 15.0 * inv7
                u5 = 3.0 * inv5
                txxx = u7 * dx * dx * dx - 3.0 * u5 * dx
                txxy = u7 * dx * dx * dy - u5 * dy
                txxz = u7 * dx * dx * dz - u5 * dz
                txyy = u7 * dx * dy * dy - u5 * dx
                txyz = u7 * dx * dy * dz
                txzz = u7 * dx * dz * dz - u5 * dx
                tyyy = u7 * dy * dy * dy - 3.0 * u5 * dy
                tyyz = u7 * dy * dy * dz - u5 * dz
                tyzz = u7 * dy * dz * dz - u5 * dy
                tzzz = u7 * dz * dz * dz - 3.0 * u5 * dz
                ax = ax + 0.5 * (
                    qxx * txxx + qyy * txyy + qzz * txzz
                    + 2.0 * (qxy * txxy + qxz * txxz + qyz * txyz))
                ay = ay + 0.5 * (
                    qxx * txxy + qyy * tyyy + qzz * tyzz
                    + 2.0 * (qxy * txyy + qxz * txyz + qyz * tyyz))
                az = az + 0.5 * (
                    qxx * txxz + qyy * tyyz + qzz * tzzz
                    + 2.0 * (qxy * txyz + qxz * txzz + qyz * tyzz))
    return jnp.stack([ax, ay, az], axis=-1)


def _l2p_eval3(local, ci, pos, corner, size, level: int):
    """Second-order L2P at each particle, one fused [19, N] gather.
    Returns [N, 3], un-scaled by g_const."""
    res = 1 << level
    s_l = size / res
    cellx, celly, cellz = ci[:, 0], ci[:, 1], ci[:, 2]
    centx = corner[0] + (cellx.astype(pos.dtype) + 0.5) * s_l
    centy = corner[1] + (celly.astype(pos.dtype) + 0.5) * s_l
    centz = corner[2] + (cellz.astype(pos.dtype) + 0.5) * s_l
    dxp = pos[:, 0] - centx
    dyp = pos[:, 1] - centy
    dzp = pos[:, 2] - centz
    loc19 = jnp.stack(local, axis=0).reshape(19, res * res * res)
    g = loc19[:, (cellx * res + celly) * res + cellz]          # [19, N]
    ev = _taylor_eval3(tuple(g[i] for i in range(19)), dxp, dyp, dzp)
    return jnp.stack(ev[:3], axis=-1)


def _fold_aggregate_ring3(local, window, corner, size, r_full: int, eps_sq,
                          radius: int, row0, rows: int):
    """3D instance of barneshut._fold_aggregate_ring: fold the cheb >= 2
    shell of the smoothed aggregate window into the local expansion as a
    dense stencil (27 - ... -> 27 gathers shrink to the inner 3^3). No-op
    at the 3D default R=2 (rr=1: the window IS the inner 3^3)."""
    from nbodysim_tpu.physics.barneshut import _DEEP_SMOOTH

    rr = radius - 1
    if rr < 2:
        return local
    s_d = size / r_full
    eps_w = eps_sq + _DEEP_SMOOTH * s_d * s_d
    ring = [(ox, oy, oz)
            for ox in range(-rr, rr + 1)
            for oy in range(-rr, rr + 1)
            for oz in range(-rr, rr + 1)
            if max(abs(ox), abs(oy), abs(oz)) >= 2]
    terms = _m2l_stencil3(window, corner, size, r_full, eps_w, radius,
                          row0=row0, rows=rows, offsets=ring,
                          gate_parity=False, pad=rr)
    return tuple(a + b for a, b in zip(local, terms))


def _tile_select3(ci_f, b_par, deep: int, t: int, T: int, radius: int):
    """Top-T t^3-cell tiles by deep-path-target count (3D instance of
    barneshut._tile_select)."""
    rD = 1 << deep
    nt = rD // t
    tx = ci_f[:, 0] // t
    ty = ci_f[:, 1] // t
    tz = ci_f[:, 2] // t
    tid = (tx * nt + ty) * nt + tz
    scores = (jnp.zeros((nt ** 3,), jnp.int32)
              .at[tid].add(b_par.astype(jnp.int32)))
    top_s, top_i = lax.top_k(scores, T)
    valid_tile = top_s > 0
    # Invalid tiles scatter truly OOB so the sentinel row stays T (see
    # barneshut._tile_select).
    tile_slot = (jnp.full((nt ** 3 + 1,), T, jnp.int32)
                 .at[jnp.where(valid_tile, top_i, nt ** 3 + 1)]
                 .set(jnp.arange(T, dtype=jnp.int32), mode="drop"))
    orig = (jnp.stack([top_i // (nt * nt), (top_i // nt) % nt,
                       top_i % nt], axis=-1) * t - radius)       # [T, 3]
    return tid, tile_slot, orig


def _tile_scatter3(payload, bulk_pos, ci_f, tile_slot, orig, corner, size,
                   deep: int, radius: int, k: int, t: int, T: int,
                   src_mask=None):
    """3D moment scatter into the selected tile windows (8 halo-direction
    candidates) -> g4k [T, Wf, Wf, Wf, 4]. Split out of the tile stage so
    the banded tree can scatter per-slab particle subsets and psum the
    (small) tile grids. Monopole + dipole channels only; quadrupole
    channels synthesized per level as point-at-COM raw moments (see the
    2D _tile_scatter rationale — the scatter is the tile stage's dominant
    cost). As in 2D, the 7 non-home halo candidates scatter only a
    COMPACT subset keyed on RELEVANT edges (particle within H of a tile
    edge AND that neighbor tile actually selected) — 3D needs it more
    (7 full-length scatters otherwise); beyond the static cap, halo
    sources drop gracefully. src_mask (banded callers) keeps masked
    zero-payload rows out of the compaction cut."""
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
    tz = ci_f[:, 2] // t
    u = (bulk_pos - corner) / size
    ci_sub = jnp.clip((u * (rD * f)).astype(jnp.int32), 0, rD * f - 1)
    mx = ci_f[:, 0] % t
    my = ci_f[:, 1] % t
    mz = ci_f[:, 2] % t
    sx = jnp.where(mx < H, -1, jnp.where(mx >= t - H, 1, 0))
    sy = jnp.where(my < H, -1, jnp.where(my >= t - H, 1, 0))
    sz = jnp.where(mz < H, -1, jnp.where(mz >= t - H, 1, 0))

    halo = [(a, b, c) for a in (0, 1) for b in (0, 1) for c in (0, 1)
            if (a, b, c) != (0, 0, 0)]

    def cand(cx, cy, cz, tx_, ty_, tz_, sx_, sy_, sz_, sub_):
        ctx = tx_ + (sx_ if cx else 0)
        cty = ty_ + (sy_ if cy else 0)
        ctz = tz_ + (sz_ if cz else 0)
        ok = ((ctx >= 0) & (ctx < nt) & (cty >= 0) & (cty < nt)
              & (ctz >= 0) & (ctz < nt))
        if cx:
            ok = ok & (sx_ != 0)
        if cy:
            ok = ok & (sy_ != 0)
        if cz:
            ok = ok & (sz_ != 0)
        slot = tile_slot[jnp.where(ok, (ctx * nt + cty) * nt + ctz,
                                   nt ** 3)]
        ok = ok & (slot < T)
        rel = sub_ - orig[jnp.minimum(slot, T - 1)] * f         # [., 3]
        return jnp.where(
            ok, ((slot * Wf + rel[:, 0]) * Wf + rel[:, 1]) * Wf
            + rel[:, 2], T * Wf ** 3)

    pay4 = payload[:, :4]
    g4t = (jnp.zeros((T * Wf ** 3, 4), dtype)
           .at[cand(0, 0, 0, tx, ty, tz, sx, sy, sz, ci_sub)]
           .add(pay4, mode="drop"))

    def neigh_selected(cx, cy, cz):
        ctx = tx + (sx if cx else 0)
        cty = ty + (sy if cy else 0)
        ctz = tz + (sz if cz else 0)
        ok = ((ctx >= 0) & (ctx < nt) & (cty >= 0) & (cty < nt)
              & (ctz >= 0) & (ctz < nt))
        if cx:
            ok = ok & (sx != 0)
        if cy:
            ok = ok & (sy != 0)
        if cz:
            ok = ok & (sz != 0)
        return ok & (tile_slot[jnp.where(
            ok, (ctx * nt + cty) * nt + ctz, nt ** 3)] < T)

    on_edge = neigh_selected(*halo[0])
    for combo in halo[1:]:
        on_edge = on_edge | neigh_selected(*combo)
    if src_mask is not None:
        on_edge = on_edge & src_mask
    b_cap = min(n, max(n // 4, 65536))
    bidx = jnp.argsort(~on_edge)[:b_cap]
    pay_b = jnp.where(on_edge[bidx][:, None], pay4[bidx], 0.0)
    tx_b, ty_b, tz_b = tx[bidx], ty[bidx], tz[bidx]
    sx_b, sy_b, sz_b = sx[bidx], sy[bidx], sz[bidx]
    sub_b = ci_sub[bidx]
    for cx, cy, cz in halo:
        g4t = g4t.at[cand(cx, cy, cz, tx_b, ty_b, tz_b,
                          sx_b, sy_b, sz_b, sub_b)].add(
            pay_b, mode="drop")
    return g4t.reshape(T, Wf, Wf, Wf, 4)


def _tile_chain3(local_w, g4k, orig, corner, size, deep: int, radius: int,
                 eps_sq, k: int, t: int, T: int):
    """3D per-tile sub-level chain (replicated arithmetic over the small
    tile grids; mirrors barneshut._tile_chain). Returns local_w
    [T, Wf, Wf, Wf, 19]."""
    dtype = g4k.dtype
    rD = 1 << deep
    H = radius
    W = t + 2 * H
    f = 1 << k
    Wf = W * f

    g10k = _synth_quad_channels3(g4k)

    # ---- pool tile grids to each sub-level -----------------------------
    pooled4 = {k: g4k}
    for j in range(k - 1, 0, -1):
        w_j = W * (1 << j)
        pooled4[j] = (pooled4[j + 1]
                      .reshape(T, w_j, 2, w_j, 2, w_j, 2, 4)
                      .sum((2, 4, 6)))
    sub_grids = {j: _synth_quad_channels3(pooled4[j])
                 for j in range(1, k + 1)}

    # ---- per-tile chain: upsample window locals + sub-level M2L --------
    s_D = size / rD
    corner_t = corner[None, :] + orig.astype(dtype) * s_D   # [T, 3]
    size_w = W * s_D

    def m2l_tile(g10_j, c_t):
        return _m2l_level3(g10_j, c_t, size_w, eps_sq, radius)

    for j in range(1, k + 1):
        s_child = s_D / (1 << j)
        loc_t = tuple(local_w[..., i] for i in range(19))
        up = jax.vmap(_l2l_upsample3, in_axes=(0, None))(loc_t, s_child)
        terms = jax.vmap(m2l_tile)(sub_grids[j], corner_t)
        local_w = jnp.stack(tuple(a + b for a, b in zip(up, terms)),
                            axis=-1)                # [T, W*2^j, .., 19]

    # ---- fold the tile aggregate ring into the tile locals -------------
    rr_full = radius - 1
    if rr_full >= 2:
        def fold_tile(lw, g10_j, c_t):
            window = tuple(jnp.pad(g10_j[..., i], rr_full)
                           for i in range(10))
            out = _fold_aggregate_ring3(
                tuple(lw[..., i] for i in range(19)), window, c_t,
                size_w, Wf, eps_sq, radius, jnp.int32(0), Wf)
            return jnp.stack(out, axis=-1)

        local_w = jax.vmap(fold_tile)(local_w, g10k, corner_t)
    return local_w


def _tile_apply3(pos, payload, bulk_pos, ci_f, b_par, local_w, g4k,
                 tile_slot, orig, corner, size, deep: int, radius: int,
                 eps_sq, k: int, t: int, T: int):
    """3D refined per-particle evaluation (pure gather/VPU work over its
    input rows; mirrors barneshut._tile_apply)."""
    from nbodysim_tpu.physics.barneshut import _DEEP_SMOOTH

    dtype = pos.dtype
    rD = 1 << deep
    H = radius
    W = t + 2 * H
    f = 1 << k
    Wf = W * f
    nt = rD // t
    tid = (ci_f[:, 0] // t * nt + ci_f[:, 1] // t) * nt + ci_f[:, 2] // t
    u = (bulk_pos - corner) / size
    ci_sub = jnp.clip((u * (rD * f)).astype(jnp.int32), 0, rD * f - 1)
    s_D = size / rD

    slot_home = tile_slot[tid]
    refined = (slot_home < T) & b_par
    sc = jnp.minimum(slot_home, T - 1)
    rel = jnp.clip(ci_sub - orig[sc] * f, 0, Wf - 1)

    s_k = s_D / f
    cent = corner[None, :] + (ci_sub.astype(dtype) + 0.5) * s_k
    d = pos - cent
    loc_flat = local_w.reshape(T * Wf ** 3, 19)
    g19 = loc_flat[((sc * Wf + rel[:, 0]) * Wf + rel[:, 1]) * Wf
                   + rel[:, 2]]                                 # [N, 19]
    ev = _taylor_eval3(tuple(g19[:, i] for i in range(19)),
                       d[:, 0], d[:, 1], d[:, 2])
    far_ref = jnp.stack(ev[:3], axis=-1)

    rin = min(radius - 1, 1)   # inner 3^3; ring folded into local_w
    g4kp = jnp.pad(g4k, ((0, 0), (rin, rin), (rin, rin), (rin, rin),
                         (0, 0)))
    side = Wf + 2 * rin
    if rin == 1:
        # y+z-packed 3-gather window (r5): same lane-utilization shave
        # as _deep_near_aggregates3_packed — the 27 4-lane row gathers
        # were the apply's dominant cost at clustered N=1M; the packed
        # tile grids are [T, side, Wf, Wf, 36] (~1 GB at the flagship
        # tile shapes, transient).
        gz = jnp.concatenate([g4kp[..., :-2, :], g4kp[..., 1:-1, :],
                              g4kp[..., 2:, :]], axis=-1)
        gyz = jnp.concatenate([gz[:, :, :-2], gz[:, :, 1:-1],
                               gz[:, :, 2:]], axis=-1)
        base_p = (((sc * side) + rel[:, 0] + rin) * Wf
                  + rel[:, 1]) * Wf + rel[:, 2]
        near_ref = _packed_mono_window3(
            gyz.reshape(-1, 36), base_p, Wf * Wf, payload[:, :4], pos,
            eps_sq + _DEEP_SMOOTH * s_k * s_k)
    else:
        base = (((sc * side) + rel[:, 0] + rin) * side + rel[:, 1] + rin
                ) * side + rel[:, 2] + rin
        near_ref = _aggregate_window_eval3(
            g4kp.reshape(-1, 4), base, side, payload[:, :4], pos,
            eps_sq + _DEEP_SMOOTH * s_k * s_k, rin)
    return refined, far_ref, near_ref


def _refined_cap3(n: int) -> int:
    """Static row capacity for the 3D compacted tile apply (see
    barneshut._refined_cap). 3D clustered scenes concentrate harder than
    2D (r5 probe: frac_ref 45.5% at clustered N=1M vs 15.3% on the 2D
    merger), so the octree keeps 5n/8 + the in-jit full-length fallback
    (the blob bar scene measured refined_cand = n/2 + 81 — a hair over
    the old n//2 cap, silently forfeiting the compact path's 0.12 s)."""
    return max((5 * n) // 8, 4096)


def _scatter_cap3(n: int) -> int:
    """Static row capacity for the 3D compacted tile-scatter sources
    (selected-tile members + selected-adjacent edge band; see
    barneshut._scatter_cap)."""
    return max((5 * n) // 8, 4096)


def _tile_src_mask3(ci_f, tile_slot, deep: int, radius: int, t: int,
                    T: int):
    """3D rows that can contribute moments to a selected tile window
    (home members + selected-adjacent halo band; the boolean form of
    _tile_scatter3's cand() geometry)."""
    rD = 1 << deep
    nt = rD // t
    H = radius
    tx = ci_f[:, 0] // t
    ty = ci_f[:, 1] // t
    tz = ci_f[:, 2] // t
    mx = ci_f[:, 0] % t
    my = ci_f[:, 1] % t
    mz = ci_f[:, 2] % t
    sx = jnp.where(mx < H, -1, jnp.where(mx >= t - H, 1, 0))
    sy = jnp.where(my < H, -1, jnp.where(my >= t - H, 1, 0))
    sz = jnp.where(mz < H, -1, jnp.where(mz >= t - H, 1, 0))

    def sel(ctx, cty, ctz, ok):
        ok = ok & ((ctx >= 0) & (ctx < nt) & (cty >= 0) & (cty < nt)
                   & (ctz >= 0) & (ctz < nt))
        return ok & (tile_slot[jnp.where(
            ok, (ctx * nt + cty) * nt + ctz, nt ** 3)] < T)

    src = sel(tx, ty, tz, jnp.ones(tx.shape, bool))
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                if (cx, cy, cz) == (0, 0, 0):
                    continue
                ok = jnp.ones(tx.shape, bool)
                if cx:
                    ok = ok & (sx != 0)
                if cy:
                    ok = ok & (sy != 0)
                if cz:
                    ok = ok & (sz != 0)
                src = src | sel(tx + (sx if cx else 0),
                                ty + (sy if cy else 0),
                                tz + (sz if cz else 0), ok)
    return src


def _tile_eval3(pos, payload, bulk_pos, ci_f, b_par, local_w,
                tid, tile_slot, orig, corner, size, deep: int, radius: int,
                eps_sq, k: int, t: int, T: int):
    """Per-tile chain + refined evaluation for the 3D octree (mirrors
    barneshut._tile_eval, incl. its compacted apply; split into
    _tile_scatter3 / _tile_chain3 / _tile_apply3 for the banded tree)."""
    from nbodysim_tpu.physics.barneshut import _compact_indices

    n = pos.shape[0]
    s_cap = _scatter_cap3(n)
    if s_cap >= n:
        g4k = _tile_scatter3(payload, bulk_pos, ci_f, tile_slot, orig,
                             corner, size, deep, radius, k, t, T)
    else:
        src = _tile_src_mask3(ci_f, tile_slot, deep, radius, t, T)
        sidx_s, n_src = _compact_indices(src, s_cap)

        def compact_scatter(_):
            valid_s = sidx_s < n
            ss = jnp.minimum(sidx_s, n - 1)
            pay_s = jnp.where(valid_s[:, None], payload[ss], 0.0)
            return _tile_scatter3(pay_s, bulk_pos[ss], ci_f[ss],
                                  tile_slot, orig, corner, size, deep,
                                  radius, k, t, T, src_mask=valid_s)

        def full_scatter(_):
            return _tile_scatter3(payload, bulk_pos, ci_f, tile_slot,
                                  orig, corner, size, deep, radius,
                                  k, t, T)

        g4k = lax.cond(n_src <= s_cap, compact_scatter, full_scatter, 0)
    local_w = _tile_chain3(local_w, g4k, orig, corner, size, deep, radius,
                           eps_sq, k, t, T)

    def full_apply(_):
        return _tile_apply3(pos, payload, bulk_pos, ci_f, b_par, local_w,
                            g4k, tile_slot, orig, corner, size, deep,
                            radius, eps_sq, k, t, T)

    n = pos.shape[0]
    cap = _refined_cap3(n)
    if cap >= n:
        return full_apply(0)
    cand = (tile_slot[tid] < T) & b_par
    sidx, n_cand = _compact_indices(cand, cap)

    def compact_apply(_):
        valid = sidx < n
        si = jnp.minimum(sidx, n - 1)
        r_s, far_s, near_s = _tile_apply3(
            pos[si], payload[si], bulk_pos[si], ci_f[si],
            b_par[si] & valid, local_w, g4k, tile_slot, orig, corner,
            size, deep, radius, eps_sq, k, t, T)
        tgt = jnp.where(valid & r_s, si, n)
        refined = jnp.zeros((n,), bool).at[tgt].set(True, mode="drop")
        far = jnp.zeros_like(pos).at[tgt].set(far_s, mode="drop")
        near = jnp.zeros_like(pos).at[tgt].set(near_s, mode="drop")
        return refined, far, near

    return lax.cond(n_cand <= cap, compact_apply, full_apply, 0)


def _tile_refine3(pos, payload, bulk_pos, ci_f, b_par, local_deep,
                  corner, size, deep: int, radius: int, eps_sq,
                  k: int, t: int, T: int):
    """Hot-zone sub-box refinement for the octree (3D instance of
    barneshut._tile_refine — see its docstring; this is what lets
    clustered 3D scenes keep tree-speed evals with core smoothing 2^k
    finer than the HBM-capped 256^3 global deep grid)."""
    H = radius
    tid, tile_slot, orig = _tile_select3(ci_f, b_par, deep, t, T, radius)

    # Per-channel pad + slice: stacking local_deep to [rD, rD, rD, 19]
    # first would materialize a 19-lane channel-last grid (6.7x tile
    # padding — 8.5 GB at the 256^3 deep level); only the small [W,W,W]
    # tile windows get stacked.
    W = t + 2 * H
    locp = tuple(jnp.pad(g, H) for g in local_deep)

    def slice_tile(o):
        return jnp.stack(
            [lax.dynamic_slice(g, (o[0] + H, o[1] + H, o[2] + H),
                               (W, W, W)) for g in locp], axis=-1)

    local_w = jax.vmap(slice_tile)(orig)                # [T, W, W, W, 19]
    return _tile_eval3(pos, payload, bulk_pos, ci_f, b_par, local_w,
                       tid, tile_slot, orig, corner, size, deep, radius,
                       eps_sq, k=k, t=t, T=T)


def _resolve_tile_params3(config: SimConfig, deep: int,
                          radius: int) -> Tuple[int, int, int]:
    """3D tile parameters (see barneshut._resolve_tile_params): the
    default tile side is 8 deep cells (a 32-ish side would make W^3
    sub-grids enormous; 8 + 2R halo at k=3 is a 96^3 window, ~35 MB of
    moments for 8 tiles)."""
    k = config.bh_tile_levels
    if deep == 0 or k == 0:
        return 0, 0, 0
    if k < 0:
        k = 3
    t = config.bh_tile_size or 8      # 0 = auto; explicit values honored
    #                                   (r3 review: t==32 used to be
    #                                   silently coerced to 8 here)
    r_d = 1 << deep
    count = config.bh_tile_count
    while t > 2 and (r_d // max(t, 1)) ** 3 < max(count, 8):
        t //= 2
    if t < 2 * radius or t <= 0 or r_d % t:
        return 0, 0, 0
    return k, t, count


_NF_SPARSE_CAP = 16384   # static bucket-tier target capacity of the
                         # sparse near-field pass (see SimConfig.
                         # bh_nf_sparse); beyond it targets promote to
                         # the deep path instead of falling back


def _nf_sparse_cap(n: int) -> int:
    return min(n, _NF_SPARSE_CAP)


def _nf_sparse_src_cap(n: int) -> int:
    """Static source capacity of the sparse near-field pass (non-hot-cell
    residents; see _bh3_accelerations). Overflow falls back to streaming
    all N sources — correct, just unshaved."""
    return min(n, 8 * _NF_SPARSE_CAP)


def _deep_rows_cap3(n: int) -> int:
    """Static row capacity for the compacted deep L2P + aggregate pass
    when tiles are on (rows the tile stage will NOT refine: measured 54%
    at clustered N=1M, so 3n/4 holds with margin; lax.cond falls back to
    the full pass beyond it)."""
    return max((3 * n) // 4, 4096)


@functools.partial(jax.jit, static_argnames=("levels", "eps_sq", "g_const",
                                             "near_cap", "radius",
                                             "nf_pallas", "interpret",
                                             "deep_levels", "tile_levels",
                                             "tile_size", "tile_count",
                                             "nf_sparse"))
def _bh3_accelerations(pos, mass, levels: int, eps_sq: float, g_const: float,
                       near_cap: int, radius: int,
                       nf_pallas: bool = False, interpret: bool = False,
                       deep_levels: int = 0, tile_levels: int = 0,
                       tile_size: int = 8, tile_count: int = 8,
                       nf_sparse: bool = False):
    n = pos.shape[0]
    ext = _extract_heavy_outliers(pos, mass)
    is_heavy, h_pos, h_mass = ext["is_heavy"], ext["h_pos"], ext["h_mass"]
    is_out, out_i = ext["is_out"], ext["out_i"]
    out_sel = ext["out_sel"]

    acc_heavy = heavy_coupling(pos, h_pos, h_mass, eps_sq, g_const)

    # Rectangular outlier couplings: Pallas kernel on the TPU path (see
    # barneshut._bh_accelerations — the blocked-XLA form was untimed
    # whole-vs-stage-sum gap, r5).
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
            # kernel — see barneshut._bh_accelerations (a [N, D] target
            # operand's forced {1,0} layout tile-pads D -> 128 lanes and
            # the constraint infects the caller graph; OOMed at 4M, r5).
            return allpairs_accelerations_wide(
                tp, sp, sm, eps_sq=eps_sq, g_const=g_const,
                interpret=interpret)
    else:
        def _direct(tp, sp, sm):
            return direct_accelerations(tp, None, eps_sq, g_const,
                                        src_pos=sp, src_mass=sm)

        _direct_wide = _direct

    acc_out = _direct(pos[out_i], pos, jnp.where(is_heavy, 0.0, mass))
    out_src_mass = jnp.where(out_sel & ~is_heavy[out_i], mass[out_i], 0.0)
    acc_from_out = _direct_wide(pos, pos[out_i], out_src_mass)

    tree_mass = ext["tree_mass"]
    bulk_pos = ext["bulk_pos"]
    # Deep-overflow mode: see barneshut._bh_accelerations — the 3D
    # instance of the same tree-PM design.
    deep = deep_levels if deep_levels > levels else 0
    build_levels = deep if deep else levels
    grids, corner, size, ci_f, flat_f = _build_pyramid3(
        bulk_pos, tree_mass, build_levels, synth_quad=bool(deep))
    res = 1 << levels
    if deep:
        ci = ci_f >> (deep - levels)
        flat = (ci[:, 0] * res + ci[:, 1]) * res + ci[:, 2]
    else:
        ci, flat = ci_f, flat_f

    local = None
    for l in range(2, levels + 1):
        terms = _m2l_level3(grids[l], corner, size, eps_sq, radius)
        if local is None:
            local = terms
        else:
            s_child = size / (1 << l)
            local = tuple(
                u + t for u, t in zip(_l2l_upsample3(local, s_child), terms))
    local_bucket = local

    if deep:
        for l in range(levels + 1, deep + 1):
            terms = _m2l_level3(grids[l], corner, size, eps_sq, radius)
            up = _l2l_upsample3(local, size / (1 << l))
            local = tuple(u + t for u, t in zip(up, terms))
        local_deep = local

    # L2P: one fused [19, N] gather + Taylor evaluation at the particle.
    far = g_const * _l2p_eval3(local_bucket, ci, pos, corner, size, levels)

    flat_nf = jnp.where(is_out, res * res * res + jnp.arange(n), flat)

    if deep:
        occ = jnp.zeros((res * res * res,), jnp.int32).at[flat_nf].add(
            1, mode="drop")
        hot = (occ > near_cap).reshape(res, res, res)
        rr = radius - 1
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

    if deep and nf_sparse:
        # Sparse near field (SimConfig.bh_nf_sparse): the dense bucket
        # stencil computes a near field that b_par rows immediately
        # discard — 99.6% of them on the clustered N=1M merger (r5
        # probe). The few bucket-tier targets instead get an exact
        # cell-masked pairwise pass (identical coverage: Chebyshev
        # radius-1 cell window, same softening; summation order differs
        # by roundoff only). Bucket-tier targets beyond the static cap
        # PROMOTE to the deep path — graceful PM-smoothed physics, no
        # dense fallback graph to compile.
        cand_nf = ~b_par & ~is_out
        cap_nf = _nf_sparse_cap(n)
        rank_nf = jnp.cumsum(cand_nf) - 1
        sidx = (jnp.full((cap_nf,), n, jnp.int32)
                .at[jnp.where(cand_nf & (rank_nf < cap_nf), rank_nf,
                              cap_nf)]
                .set(jnp.arange(n, dtype=jnp.int32), mode="drop"))
        valid_nf = sidx < n
        si = jnp.minimum(sidx, n - 1)
        # Source compaction (r5): a ~b_par target has NO hot cell within
        # its Chebyshev (radius-1) window, so every source its masked
        # pass can accept lives in a non-hot cell — streaming all N
        # sources (16k x 1M masked pairs at clustered N=1M) is almost
        # entirely discarded work. Compact sources to the non-hot-cell
        # residents; lax.cond falls back to the full-source pass when
        # they overflow the static capacity.
        src_nf = ~hot.reshape(-1)[flat]
        scap_nf = _nf_sparse_src_cap(n)
        sidx_s, n_srcs = _compact_indices(src_nf, scap_nf)

        def compact_src(_):
            valid_s = sidx_s < n
            ss = jnp.minimum(sidx_s, n - 1)
            return _near_masked_blocked(
                pos[si], ci[si], bulk_pos[ss],
                jnp.where(valid_s, tree_mass[ss], 0.0), ci[ss],
                eps_sq, radius - 1)

        def full_src(_):
            return _near_masked_blocked(
                pos[si], ci[si], bulk_pos, tree_mass, ci, eps_sq,
                radius - 1)

        t_acc = (lax.cond(n_srcs <= scap_nf, compact_src, full_src, 0)
                 if scap_nf < n else full_src(0))
        near = (jnp.zeros_like(pos)
                .at[jnp.where(valid_nf, si, n)]
                .set(g_const * t_acc, mode="drop"))
        b_par = b_par | (cand_nf & (rank_nf >= cap_nf))
    else:
        near, _ = _near_field_buckets3(
            pos, tree_mass, ci, flat_nf, levels, eps_sq, g_const, near_cap,
            radius, use_pallas=nf_pallas, interpret=interpret,
            skip_residual=bool(deep))

    if deep:
        payload = _moment_payload3(pos, tree_mass)
        rrd = radius - 1
        rin = min(rrd, 1)   # inner aggregate window; ring folds into L2P
        # NOTE: the tile path below must see the UN-folded local_deep —
        # its sub-level chain re-decomposes exactly what the fold covers.
        # At the 3D default R=2 the fold is a static no-op: skip the
        # padded 10-channel window too (dead graph otherwise).
        if rrd >= 2:
            wring = tuple(jnp.pad(g, rrd) for g in grids[deep])
            local_agg = _fold_aggregate_ring3(
                local_deep, wring, corner, size, 1 << deep, eps_sq,
                radius, row0=jnp.int32(0), rows=1 << deep)
        else:
            local_agg = local_deep
        # Stack only the 4 aggregate channels, padded, channel-last: the
        # row-gather consumer (`_aggregate_window_eval3`) wants [M, 4]
        # rows, which XLA lays out flat-minor (measured fine in 2D).
        g4_pad = jnp.stack([jnp.pad(grids[deep][i], rin)
                            for i in range(4)], axis=-1)

        def _deep_rows(pos_r, ci_r, pay_r):
            """Deep-path L2P + smoothed aggregates for the given rows
            (per-row independent, so compaction keeps bitwise parity)."""
            far_r = g_const * _l2p_eval3(local_agg, ci_r, pos_r, corner,
                                         size, deep)
            if rin == 1:
                near_r = g_const * _deep_near_aggregates3_packed(
                    pos_r, pay_r, g4_pad, ci_r, eps_sq,
                    size / (1 << deep))
            else:
                near_r = g_const * _deep_near_aggregates3(
                    pos_r, pay_r, g4_pad, ci_r, eps_sq,
                    size / (1 << deep), rr=rin)
            return far_r, near_r

        dcap = _deep_rows_cap3(n) if tile_levels else n
        if tile_levels and dcap < n:
            # Deep-row compaction (r5): rows refined by the tile stage
            # discard far_deep/deep_near (the tile output overrides them
            # — `refined` below equals this `cand` exactly, see
            # _tile_apply3), so the L2P gather + aggregate window run
            # only on b_par & ~cand rows (54% at clustered N=1M; the
            # full-length passes were ~0.29 s of discarded work).
            tid_d, tile_slot_d, _orig_d = _tile_select3(
                ci_f, b_par, deep, tile_size, tile_count, radius)
            cand_d = (tile_slot_d[tid_d] < tile_count) & b_par
            need_d = b_par & ~cand_d
            sidx_d, n_need = _compact_indices(need_d, dcap)

            def compact_deep(_):
                valid_d = sidx_d < n
                sd = jnp.minimum(sidx_d, n - 1)
                far_r, near_r = _deep_rows(pos[sd], ci_f[sd],
                                           payload[sd, :4])
                tgt = jnp.where(valid_d, sd, n)
                return (jnp.zeros_like(pos).at[tgt].set(far_r,
                                                        mode="drop"),
                        jnp.zeros_like(pos).at[tgt].set(near_r,
                                                        mode="drop"))

            def full_deep(_):
                return _deep_rows(pos, ci_f, payload[:, :4])

            far_deep, deep_near = lax.cond(n_need <= dcap, compact_deep,
                                           full_deep, 0)
        else:
            far_deep, deep_near = _deep_rows(pos, ci_f, payload[:, :4])
        far = jnp.where(b_par[:, None], far_deep, far)
        near = jnp.where(b_par[:, None], deep_near, near)

        if tile_levels:
            # Hot-zone sub-box refinement: 2^tile_levels finer smoothing
            # inside the T hottest tiles (see _tile_refine3).
            refined, far_ref, near_ref = _tile_refine3(
                pos, payload, bulk_pos, ci_f, b_par, local_deep,
                corner, size, deep, radius, eps_sq,
                k=tile_levels, t=tile_size, T=tile_count)
            sel = refined[:, None]
            far = jnp.where(sel, g_const * far_ref, far)
            near = jnp.where(sel, g_const * near_ref, near)

    acc = jnp.where(is_out[:, None], 0.0,
                    far + near + acc_from_out) + acc_heavy
    acc = acc.at[out_i].add(jnp.where(out_sel[:, None], acc_out, 0.0))
    return acc


def _resolve_levels3(config: SimConfig, n: int) -> int:
    levels = config.bh_levels
    if levels <= 0:
        # ~1-4 particles per cell. Measured on one v5e chip (R=2,
        # uniform, Pallas near field + conv M2L): 65k: L=5 54ms < L=4
        # 80ms; 262k: L=6 224ms < L=5 302ms; 1M: L=6 353ms < L=7 745ms;
        # 4M: L=7 1.97s << L=6 4.06s (L=6 overflows 414k particles into
        # the residual at 16/cell). The old L=6 cap existed because the
        # scan-form M2L was HBM-bound at 128^3 (1.33s at N=1M); the MXU
        # contraction form removed that wall.
        levels = max(2, min(_MAX_LEVELS_3D,
                            (max(n, 8).bit_length() - 1) // 3))
    return min(levels, _MAX_LEVELS_3D)


def _resolve_radius3(config: SimConfig) -> int:
    """3D acceptance radius; unlike 2D (floored at R=3, barneshut.py:
    _resolve_radius), the octree defaults to R=2: the V-list has
    (4R-1)^3 - (2R-1)^3 offsets (316 at R=2, 1206 at R=3), so R=3 costs
    ~4x, while the measured R=2 field error (4.3e-3 uniform median) is
    already 2.5x tighter than the reference's theta=1 fidelity. Set
    bh_accept_radius=3 explicitly for ~8e-4."""
    r = config.bh_accept_radius
    if r <= 0:
        r = max(2, int(round(1.0 + 1.0 / max(config.theta, 0.25))) - 1)
    return max(2, min(5, r))


def bh3_accelerations(pos: jax.Array, mass: jax.Array,
                      config: SimConfig) -> jax.Array:
    """Approximate softened accelerations via the 3D octree FMM."""
    if pos.shape[1] != 3:
        raise ValueError("bh3_accelerations is the dim=3 tree code")
    from nbodysim_tpu.physics.barneshut import _nf_use_pallas

    levels = _resolve_levels3(config, pos.shape[0])
    deep = _resolve_deep_levels3(config, levels)
    radius = _resolve_radius3(config)
    tk, tt, tc = _resolve_tile_params3(config, deep, radius)
    return _bh3_accelerations(
        pos, mass, levels=levels, eps_sq=float(config.eps_sq),
        g_const=float(config.g_const), near_cap=NEAR_CAP,
        radius=radius,
        nf_pallas=_nf_use_pallas(config), interpret=config.pallas_interpret,
        deep_levels=deep, tile_levels=tk, tile_size=tt, tile_count=tc,
        nf_sparse=bool(deep) and config.bh_nf_sparse == 1)


_MAX_DEEP_3D = 8   # 256^3 moment grid = 670 MB f32; 512^3 would be 5.4 GB


def _resolve_deep_levels3(config: SimConfig, levels: int) -> int:
    """3D deep-overflow chain depth (see barneshut._resolve_deep_levels):
    auto (-1) descends 2 levels past the buckets (64x per-cell occupancy
    relief), capped at the HBM-feasible 256^3 grid."""
    d = config.bh_deep_levels
    if d == 0:
        return 0
    if d < 0:
        d = levels + 2
    return max(levels + 1, min(d, _MAX_DEEP_3D)) if d > levels else 0


def bh3_near_overflow(pos: jax.Array, mass: jax.Array,
                      config: SimConfig) -> int:
    """Diagnostic: bulk particles beyond the 3D near-field bucket cap."""
    from nbodysim_tpu.core.blocking import sorted_first_occurrence

    n = pos.shape[0]
    levels = _resolve_levels3(config, n)
    res = 1 << levels

    ext = _extract_heavy_outliers(pos, mass)
    # Cell indices directly — no need to build the moment pyramid for an
    # occupancy count (see bh_near_overflow).
    corner, size = _bounding_cube(ext["bulk_pos"])
    u = (ext["bulk_pos"] - corner) / size
    ci = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
    flat = (ci[:, 0] * res + ci[:, 1]) * res + ci[:, 2]
    flat_nf = jnp.where(ext["is_out"], res**3 + jnp.arange(n), flat)
    flat_s = jnp.sort(flat_nf)
    first = sorted_first_occurrence(flat_s)
    slot = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
    return int(jnp.sum((slot >= NEAR_CAP) & (flat_s < res**3)))


def bh3_bucket_tier_count(pos: jax.Array, mass: jax.Array,
                          config: SimConfig) -> int:
    """Host-side probe (init / re-resolve): how many particles would take
    the bucket-tier near field (NOT the deep path) under the config's
    resolved deep chain. Drives the bh_nf_sparse auto resolution — when
    nearly everything is deep-path (r5 probe: 99.6% at clustered N=1M),
    the dense bucket stencil is discarded work and the sparse pass wins."""
    n = pos.shape[0]
    levels = _resolve_levels3(config, n)
    deep = _resolve_deep_levels3(config, levels)
    if not deep:
        return n
    res = 1 << levels
    ext = _extract_heavy_outliers(pos, mass)
    corner, size = _bounding_cube(ext["bulk_pos"])
    u = (ext["bulk_pos"] - corner) / size
    ci = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
    flat = (ci[:, 0] * res + ci[:, 1]) * res + ci[:, 2]
    flat_nf = jnp.where(ext["is_out"], res**3 + jnp.arange(n), flat)
    occ = jnp.zeros((res**3,), jnp.int32).at[flat_nf].add(1, mode="drop")
    hot = (occ > NEAR_CAP).reshape(res, res, res)
    rr = _resolve_radius3(config) - 1
    hotp = jnp.pad(hot, rr)
    bmask = jnp.zeros((res, res, res), bool)
    for ox in range(2 * rr + 1):
        for oy in range(2 * rr + 1):
            for oz in range(2 * rr + 1):
                bmask = bmask | hotp[ox:ox + res, oy:oy + res,
                                     oz:oz + res]
    b_par = bmask.reshape(-1)[flat] & ~ext["is_out"]
    return int(jnp.sum(~b_par & ~ext["is_out"]))
