"""On-device point-splat renderer.

The reference renders with raylib/OpenGL (main.cpp:726-841): each body is a
32x32 circle sprite tinted by a 10-bucket mass -> star-class color table
(getStarColorWithBrightness, main.cpp:549-610), the largest body gets a
black-hole composite (drawBlackHole, main.cpp:477-547: layered glow
gradients, accretion disk, event horizon, photon ring), and performance
mode draws plain white circles (main.cpp:745-790).

TPU-native equivalent: a pure-jnp rasterizer that scatter-adds bilinear
point splats into an RGB framebuffer entirely on device — no host
round-trip until the final uint8 image is pulled. Camera semantics match
worldToScreen (main.cpp:196-201): screen = (world - center) * scale +
(W/2, H/2). The black-hole composite is evaluated as a closed-form function
of pixel coordinates (glow falloff + disk ring + horizon + photon ring)
rather than 5048 triangles.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState

# Mass -> star-class color table (main.cpp:555-580). Upper thresholds and
# RGB; masses above the last threshold get the near-invisible class.
STAR_THRESHOLDS = (0.08, 0.4, 0.8, 1.2, 1.5, 2.5, 5.0, 15.0, 25.0, 50.0)
STAR_COLORS = (
    (0, 0, 255),       # deep blue (hyper-giant blue)
    (100, 100, 255),   # blue
    (173, 216, 230),   # light blue (blue-white)
    (219, 233, 244),   # bluish white
    (255, 255, 200),   # light yellow
    (255, 240, 150),   # yellow (sun-like)
    (255, 150, 50),    # light orange
    (255, 100, 0),     # deep orange (orange dwarf)
    (255, 50, 0),      # orange red (red dwarf)
    (200, 0, 0),       # deep red (brown dwarf)
)
STAR_COLOR_DEFAULT = (0, 0, 2)  # "neutron star" fallback (main.cpp:577)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 1200          # reference window (main.cpp:639-640)
    height: int = 900
    scale: float = 1.0
    center: tuple = (0.0, 0.0)
    brightness: float = 3.0    # main.cpp:830
    performance_mode: bool = False   # white splats (main.cpp:745-790)
    draw_black_hole: bool = True
    exposure: float = 1.0      # tone-map divisor scale on accumulated light
    show_quadtree: bool = False      # Q toggle (main.cpp:678-681)
    show_connections: bool = False   # C toggle (main.cpp:682-685)

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


def star_colors(mass: jax.Array, brightness: float = 1.0) -> jax.Array:
    """Per-body RGB in [0, 255] floats from the reference bucket table."""
    thresholds = jnp.array(STAR_THRESHOLDS, jnp.float32)
    table = jnp.array(STAR_COLORS + (STAR_COLOR_DEFAULT,), jnp.float32)
    # First bucket whose threshold exceeds the mass; masses beyond all
    # thresholds hit the fallback row (searchsorted returns len(thresholds)).
    idx = jnp.searchsorted(thresholds, mass, side="right")
    rgb = table[idx] * brightness
    return jnp.clip(rgb, 0.0, 255.0)


def _world_to_screen(pos, scale, center, width, height):
    """main.cpp:196-201 semantics (y down, origin at screen center)."""
    cx = jnp.asarray(center)
    return (pos - cx) * scale + jnp.array(
        [width / 2.0, height / 2.0], jnp.float32
    )


# drawBlackHole constants (main.cpp:477-547).
_BH_SEGMENTS = 5048            # main.cpp:495
_BH_QUAD_ALPHA = 2.0 / 255.0   # per-quad disk alpha (main.cpp:523)
# Glow layers i = 4..0 (painted back-to-front): radius multiplier
# 1 + 1.4*i, center alpha (1 - i/4)*1.1 cast to an unsigned byte EXACTLY as
# the reference compiles it — the i=0 layer computes 1.1*255 = 280.5, which
# wraps to 24/255 in the u8 cast, making the innermost glow layer nearly
# transparent; i=4 computes 0, invisible. Reproduced, quirk and all.
_BH_GLOW_LAYERS = tuple(
    (1.0 + 1.4 * i, (int((1.0 - i / 4.0) * 1.1 * 255.0) % 256) / 255.0)
    for i in (4, 3, 2, 1, 0)
)


def _black_hole_layer(
    frame: jax.Array,       # [H, W, 3] float
    screen_pos: jax.Array,  # [2]
    screen_radius: jax.Array,
    width: int,
    height: int,
) -> jax.Array:
    """Closed-form black-hole composite (drawBlackHole, main.cpp:477-547).

    Every element of the reference's painter stack, evaluated per pixel:

    1. Glow: 5 DrawCircleGradient layers (255,255,237), alpha fading
       linearly center -> radius, layer radii/alphas from main.cpp:482-490
       (including the byte-overflow of the innermost layer).
    2. Accretion disk (main.cpp:492-527): 5048 overlapping quads between
       2.1R and 10.51R whose start angle spans 300 deg while the end angle
       spans 390 deg. Closed form: the number of quads covering azimuth
       phi is k(phi) = S*phi*(1/300 - 1/390) for the main arc plus
       S*(1 - (phi+360)/390) where the 390-arc wraps over [0, 30) deg; the
       stacked per-quad alpha 2/255 composites to 1 - (1 - 2/255)^k, an
       angular opacity ramp (transparent near 0 deg, opaque past ~90 deg)
       — the characteristic smear. Each quad's y is scaled by
       distortion(angle) = 0.55 + 0.10*(1.02 - tan(12*angle))
       (main.cpp:504), reproduced as an elliptical warp of the radius;
       color (3b, 2b, 6b) with b = 1.4 + (10.5 + cos(angle))
       (main.cpp:503,518-522).
    3. Event horizon: opaque gradient (0,0,40) -> black out to 1.03R, then
       a solid black disc at R (main.cpp:530-535).
    4. Photon ring: opaque (255,225,210) ring of thickness 0.011R at R
       (main.cpp:538-546).
    """
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    dx = xs - screen_pos[0]
    dy = ys - screen_pos[1]
    r = jnp.sqrt(dx * dx + dy * dy)
    R = jnp.maximum(screen_radius, 1e-3)
    theta = jnp.arctan2(dy, dx)

    # --- 1) layered glow gradients (back-to-front) -----------------------
    glow_color = jnp.array([255.0, 255.0, 237.0])
    for mult, a in _BH_GLOW_LAYERS:
        rad = R * mult
        fade = (jnp.clip(1.0 - r / rad, 0.0, 1.0) * a)[..., None]
        frame = frame * (1.0 - fade) + glow_color * fade

    # --- 2) accretion disk ----------------------------------------------
    # Azimuthal y-distortion (tan spikes clipped to keep the warp finite).
    distortion = 0.55 + 0.10 * (1.02 - jnp.tan(theta * 12.0))
    distortion = jnp.clip(distortion, 0.05, 2.5)
    r_ell = jnp.sqrt(dx * dx + (dy / distortion) ** 2)
    r_n = r_ell / R
    in_disk = (r_n >= 2.1) & (r_n <= 10.51)

    deg = (jnp.degrees(theta)) % 360.0
    s = float(_BH_SEGMENTS)
    k_main = s * deg * (1.0 / 300.0 - 1.0 / 390.0)
    k_wrap = jnp.maximum(0.0, s * (1.0 - (deg + 360.0) / 390.0))
    k = jnp.where(deg <= 300.0, k_main, s * (1.0 - deg / 390.0)) + k_wrap
    opacity = jnp.where(
        in_disk, 1.0 - jnp.power(1.0 - _BH_QUAD_ALPHA, k), 0.0)[..., None]

    b = 1.4 + (10.5 + jnp.cos(theta))
    disk_rgb = jnp.stack([3.0 * b, 2.0 * b, 6.0 * b], axis=-1)
    frame = frame * (1.0 - opacity) + disk_rgb * opacity

    # --- 3) event horizon -------------------------------------------------
    grad = jnp.clip(1.0 - r / (1.03 * R), 0.0, 1.0)[..., None]
    horizon_rgb = grad * jnp.array([0.0, 0.0, 40.0])
    frame = jnp.where((r < 1.03 * R)[..., None], horizon_rgb, frame)
    frame = jnp.where((r < R)[..., None], 0.0, frame)

    # --- 4) photon ring ----------------------------------------------------
    half_t = 0.011 * R / 2.0
    on_ring = (jnp.abs(r - R) <= jnp.maximum(half_t, 0.5))[..., None]
    return jnp.where(on_ring, jnp.array([255.0, 225.0, 210.0]), frame)


def render_frame(
    state: ParticleState,
    render: Optional[RenderConfig] = None,
    config: Optional[SimConfig] = None,
) -> jax.Array:
    """Rasterize a state to a uint8 RGB image [H, W, 3], fully on device."""
    rc = render or RenderConfig()
    w, h = rc.width, rc.height

    pos2 = state.pos[:, :2]
    sp = _world_to_screen(pos2, rc.scale, jnp.asarray(rc.center, jnp.float32),
                          w, h)

    if rc.performance_mode:
        rgb = jnp.full((state.n, 3), 255.0)
    else:
        rgb = star_colors(state.mass, rc.brightness)

    # Bigger bodies deposit more light: weight by on-screen area (clamped),
    # the splat analogue of the sprite's screenRadius (main.cpp:815).
    screen_radius = jnp.maximum(1.0, state.radius * rc.scale)
    weight = jnp.clip(screen_radius, 1.0, 4.0)[:, None]

    # Bilinear scatter-add into the framebuffer (anti-aliased point splat).
    x = sp[:, 0]
    y = sp[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    frame = jnp.zeros((h, w, 3), jnp.float32)
    for ddx, ddy, wgt in (
        (0, 0, lambda: (1 - fx) * (1 - fy)),
        (1, 0, lambda: fx * (1 - fy)),
        (0, 1, lambda: (1 - fx) * fy),
        (1, 1, lambda: fx * fy),
    ):
        xi = (x0 + ddx).astype(jnp.int32)
        yi = (y0 + ddy).astype(jnp.int32)
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        contrib = rgb * wgt() * weight * inside[:, None]
        # drop_out-of-bounds via clamped indices + zeroed contribution
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        frame = frame.at[yi, xi].add(contrib)

    frame = frame / rc.exposure

    if rc.draw_black_hole and not rc.performance_mode:
        # Largest-radius body is the black hole (main.cpp:794-804).
        c = jnp.argmax(state.radius)
        bh_screen = _world_to_screen(
            pos2[c], rc.scale, jnp.asarray(rc.center, jnp.float32), w, h
        )
        bh_radius = jnp.maximum(2.0, state.radius[c] * rc.scale)
        frame = _black_hole_layer(frame, bh_screen, bh_radius, w, h)

    frame = jnp.clip(frame, 0.0, 255.0).astype(jnp.uint8)

    if rc.show_connections:
        from nbodysim_tpu.render.overlays import connections_overlay

        frame = connections_overlay(frame, state, rc.scale, rc.center)
    if rc.show_quadtree:
        from nbodysim_tpu.render.overlays import quadtree_overlay

        frame = quadtree_overlay(frame, state, rc.scale, rc.center)

    return frame
