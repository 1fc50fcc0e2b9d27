"""Debug overlays: quadtree wireframe and neighbor connections.

Reference: the Q toggle draws occupied quadtree cell boundaries
(drawQuadtreeNode, main.cpp:394-475, gray 100/100/100 at ~40% alpha) and
the C toggle draws red lines to up to MAX_CONNECTIONS nearby bodies with
distance-based alpha (drawConnections, main.cpp:233-386).

TPU-native equivalents operate on the framebuffer:
  * quadtree overlay — pixels near an occupied pyramid-cell boundary are
    blended gray; occupancy comes from the same mass pyramid the BH
    backend builds (physics/barneshut.py), i.e. the actual tree.
  * connections overlay — neighbor pairs from the sorted collision grid
    (fixed window), line segments splatted as T interpolation points with
    alpha falling off with distance (main.cpp:362).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState

QUAD_COLOR = jnp.array([100.0, 100.0, 100.0])
CONNECTION_COLOR = jnp.array([255.0, 0.0, 0.0])   # main.cpp:364
MAX_CONNECTIONS = 5                                # main.cpp:51


def quadtree_overlay(
    frame: jax.Array,        # [H, W, 3] float or uint8
    state: ParticleState,
    scale: float,
    center,
    levels: int = 6,
    min_cell_px: float = 4.0,
    alpha: float = 0.4,
) -> jax.Array:
    """Blend occupied-cell boundaries of the mass pyramid into the frame."""
    from nbodysim_tpu.physics.barneshut import _build_pyramid

    frame = frame.astype(jnp.float32)
    h, w = frame.shape[:2]
    pos2 = state.pos[:, :2]
    grids, corner, size, _, _ = _build_pyramid(pos2, state.mass, levels)
    cx = jnp.asarray(center, jnp.float32)

    # Pixel -> world coordinates (inverse of worldToScreen, main.cpp:196).
    xs = (jnp.arange(w, dtype=jnp.float32) - w / 2.0) / scale + cx[0]
    ys = (jnp.arange(h, dtype=jnp.float32) - h / 2.0) / scale + cx[1]
    wx = jnp.broadcast_to(xs[None, :], (h, w))
    wy = jnp.broadcast_to(ys[:, None], (h, w))

    border = jnp.zeros((h, w), jnp.float32)
    for l in range(1, levels + 1):
        res = 1 << l
        s_l = size / res
        # Skip levels whose cells are sub-pixel (traced condition folded in
        # via the mask: cell size in pixels must exceed min_cell_px).
        big_enough = (s_l * scale) >= min_cell_px
        u = (wx - corner[0]) / s_l
        v = (wy - corner[1]) / s_l
        ci = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, res - 1)
        cj = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, res - 1)
        occ = grids[l][0][ci, cj] > 0
        # Within ~1px of a cell edge?
        fx = u - jnp.floor(u)
        fy = v - jnp.floor(v)
        eps_px = 1.0 / jnp.maximum(s_l * scale, 1e-6)
        on_edge = (
            (fx < eps_px) | (fx > 1 - eps_px) |
            (fy < eps_px) | (fy > 1 - eps_px)
        )
        inside = (u >= 0) & (u < res) & (v >= 0) & (v < res)
        border = jnp.maximum(
            border, (occ & on_edge & inside & big_enough).astype(jnp.float32)
        )

    blend = alpha * border[..., None]
    out = frame * (1 - blend) + QUAD_COLOR * blend
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


CLUSTER_COLOR = jnp.array([255.0, 190.0, 152.0])   # main.cpp:311


def connections_overlay(
    frame: jax.Array,
    state: ParticleState,
    scale: float,
    center,
    base_distance: float = 1000.0,   # MAX_DISTANCE, main.cpp:50
    base_connections: int = MAX_CONNECTIONS,
    segment_points: int = 16,
    cap: int = 8,
) -> jax.Array:
    """Splat neighbor-connection segments, zoom-adaptively.

    Reference (main.cpp:241-253): all connection parameters scale with
    zoom —

      zoomFactor     = max(0.1, scale)
      adaptiveDistance    = MAX_DISTANCE / zoomFactor
      adaptiveConnections = MAX_CONNECTIONS / zoomFactor
      adaptiveAlpha       = max(50, 255 * zoomFactor) / 255
      gridLevel           = max(0, -log2(zoomFactor))

    and at gridLevel > 2 (zoomed far out) connections collapse to the
    cluster level: one salmon (255,190,152) segment between neighboring
    occupied-cell centers instead of per-body red lines (main.cpp:274-320;
    the reference shipped that branch commented out, leaving NO drawing in
    the per-body regime it gates — SURVEY bug #5 — so this implements the
    intended behavior: cluster segments when far out, per-body red lines
    otherwise).
    """
    zoom = max(0.1, float(scale))
    adaptive_distance = base_distance / zoom
    adaptive_connections = max(1, int(base_connections / zoom))
    adaptive_alpha = max(50.0, 255.0 * zoom) / 255.0
    grid_level = max(0, int(-np.log2(zoom)))

    if grid_level > 2:
        return _cluster_connections(
            frame, state, scale, center, adaptive_distance, adaptive_alpha,
            segment_points)
    return _body_connections(
        frame, state, scale, center, adaptive_distance,
        adaptive_connections, adaptive_alpha, segment_points, cap)


def _cluster_connections(frame, state, scale, center, cell_world,
                         alpha, segment_points):
    """Cluster-level mode: segments between neighboring occupied-cell
    centers (mean body position per cell) on a dense screen-covering
    grid; constant adaptiveAlpha, salmon color (main.cpp:296-316)."""
    frame = frame.astype(jnp.float32)
    h, w = frame.shape[:2]
    pos = state.pos[:, :2]
    cx = jnp.asarray(center, jnp.float32)

    # Dense cell grid over the visible world region (+1 cell margin).
    world_w = w / scale
    world_h = h / scale
    g = int(np.clip(np.ceil(max(world_w, world_h) / cell_world) + 3,
                    4, 128))
    origin = cx - 0.5 * jnp.array([world_w, world_h]) - cell_world
    ci = jnp.floor((pos - origin) / cell_world).astype(jnp.int32)
    inside = jnp.all((ci >= 0) & (ci < g), axis=-1)
    flat = jnp.where(inside, ci[:, 0] * g + ci[:, 1], g * g)

    cnt = jnp.zeros((g * g,), jnp.float32).at[flat].add(
        inside.astype(jnp.float32), mode="drop")
    sx = jnp.zeros((g * g,), jnp.float32).at[flat].add(
        jnp.where(inside, pos[:, 0], 0.0), mode="drop")
    sy = jnp.zeros((g * g,), jnp.float32).at[flat].add(
        jnp.where(inside, pos[:, 1], 0.0), mode="drop")
    occ = cnt > 0
    safe = jnp.maximum(cnt, 1.0)
    centers = jnp.stack([sx / safe, sy / safe], -1).reshape(g, g, 2)
    occ = occ.reshape(g, g)

    def to_screen(p):
        return (p - cx) * scale + jnp.array([w / 2.0, h / 2.0])

    a_scr = to_screen(centers)                       # [g, g, 2]
    acc = jnp.zeros((h, w), jnp.float32)
    t = jnp.linspace(0.0, 1.0, segment_points)[None, :, None]
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nb_c = jnp.roll(centers, (-dx, -dy), axis=(0, 1))
            nb_o = jnp.roll(occ, (-dx, -dy), axis=(0, 1))
            # roll wraps; wrapped edge rows are masked off
            ix = jnp.arange(g)
            edge_x = (ix + dx >= 0) & (ix + dx < g)
            edge_y = (ix + dy >= 0) & (ix + dy < g)
            ok = occ & nb_o & edge_x[:, None] & edge_y[None, :]
            a = a_scr.reshape(-1, 1, 2)
            b = to_screen(nb_c).reshape(-1, 1, 2)
            pts = (a * (1 - t) + b * t).reshape(-1, 2)
            al = jnp.repeat(ok.reshape(-1).astype(jnp.float32) * alpha,
                            segment_points)
            xi = jnp.round(pts[:, 0]).astype(jnp.int32)
            yi = jnp.round(pts[:, 1]).astype(jnp.int32)
            vis = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            al = jnp.where(vis, al, 0.0)
            acc = acc.at[jnp.clip(yi, 0, h - 1),
                         jnp.clip(xi, 0, w - 1)].add(al)

    blend = jnp.clip(acc, 0.0, 1.0)[..., None]
    out = frame * (1 - blend) + CLUSTER_COLOR * blend
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def _body_connections(
    frame: jax.Array,
    state: ParticleState,
    scale: float,
    center,
    max_distance: float,
    max_connections: int,
    adaptive_alpha: float,
    segment_points: int = 16,
    cap: int = 8,
) -> jax.Array:
    """Per-body mode: red lines to up to `max_connections` in-range
    neighbors, alpha = (1 - d/adaptiveDistance) * adaptiveAlpha
    (main.cpp:364-367). Neighbors come from a sorted spatial grid with
    cell size `max_distance` (the reference grids at that size too,
    main.cpp:74)."""
    frame = frame.astype(jnp.float32)
    h, w = frame.shape[:2]
    pos = state.pos[:, :2]
    n = pos.shape[0]
    cx = jnp.asarray(center, jnp.float32)

    # Sorted-cell-list neighbor candidates (3x3 window, fixed cap).
    cell = jnp.floor(pos / max_distance).astype(jnp.int32)
    res_hash = 1 << max(1, (2 * n - 1).bit_length())
    primes = jnp.array([92837111, 689287499], jnp.uint32)
    hsh = ((cell[:, 0].astype(jnp.uint32) * primes[0])
           ^ (cell[:, 1].astype(jnp.uint32) * primes[1]))
    hsh = (hsh * jnp.uint32(15485863)) & jnp.uint32(res_hash - 1)
    hsh = hsh.astype(jnp.int32)
    order = jnp.argsort(hsh)
    h_s = hsh[order]
    pos_s = pos[order]
    cell_s = cell[order]

    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"), -1
    ).reshape(9, 2)
    nbr = cell_s[:, None, :] + offs[None, :, :]
    nbr_h = ((nbr[..., 0].astype(jnp.uint32) * primes[0])
             ^ (nbr[..., 1].astype(jnp.uint32) * primes[1]))
    nbr_h = ((nbr_h * jnp.uint32(15485863)) & jnp.uint32(res_hash - 1)
             ).astype(jnp.int32)
    starts = jnp.searchsorted(h_s, nbr_h.reshape(-1)).reshape(n, 9)
    win = jnp.arange(cap, dtype=jnp.int32)
    cand = (starts[:, :, None] + win[None, None, :]).reshape(n, 9 * cap)
    in_range = cand < n
    cand_c = jnp.minimum(cand, n - 1)
    ok_hash = h_s[cand_c] == jnp.repeat(nbr_h, cap, axis=1)
    # Require the actual cell to match too: hash-colliding neighbor offsets
    # would otherwise scan (and splat) the same segment twice.
    want_cell = jnp.repeat(nbr, cap, axis=1)
    ok_cell = jnp.all(cell_s[cand_c] == want_cell, axis=-1)
    ok_hash = ok_hash & ok_cell
    self_i = jnp.arange(n)[:, None]
    d = pos_s[cand_c] - pos_s[:, None, :]
    dist = jnp.linalg.norm(d, axis=-1)
    valid = (in_range & ok_hash & (cand_c != self_i)
             & (dist < max_distance) & (dist > 0))

    # Keep the first `max_connections` valid candidates per particle.
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1)
    keep = valid & (rank <= max_connections)

    alpha = jnp.where(
        keep, (1.0 - dist / max_distance) * adaptive_alpha, 0.0)  # [N, K]

    # Screen endpoints; splat T points along each kept segment.
    def to_screen(p):
        return (p - cx) * scale + jnp.array([w / 2.0, h / 2.0])

    a = to_screen(pos_s)[:, None, :]                  # [N, 1, 2]
    b = to_screen(pos_s[cand_c])                      # [N, K, 2]
    t = jnp.linspace(0.0, 1.0, segment_points)[None, None, :, None]
    pts = a[:, :, None, :] * (1 - t) + b[:, :, None, :] * t  # [N, K, T, 2]
    pts = pts.reshape(-1, 2)
    al = jnp.broadcast_to(
        alpha[:, :, None], (n, alpha.shape[1], segment_points)
    ).reshape(-1)

    xi = jnp.round(pts[:, 0]).astype(jnp.int32)
    yi = jnp.round(pts[:, 1]).astype(jnp.int32)
    inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    al = jnp.where(inside, al, 0.0)
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, h - 1)

    acc = jnp.zeros((h, w), jnp.float32).at[yi, xi].add(al)
    blend = jnp.clip(acc, 0.0, 1.0)[..., None]
    out = frame * (1 - blend) + CONNECTION_COLOR * blend
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
