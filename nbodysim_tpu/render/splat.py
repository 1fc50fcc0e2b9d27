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


def _black_hole_layer(
    frame: jax.Array,       # [H, W, 3] float
    screen_pos: jax.Array,  # [2]
    screen_radius: jax.Array,
    width: int,
    height: int,
) -> jax.Array:
    """Closed-form black-hole composite (drawBlackHole, main.cpp:477-547).

    Glow: layered gradients -> smooth exp falloff out to ~6.6 radii.
    Accretion disk: warm ring between 2.1 and 10.51 radii (main.cpp:492-493)
    with azimuthal brightness variation (cos term, main.cpp:502).
    Event horizon: black inside r, subtle blue edge (main.cpp:529-535).
    Photon ring: thin bright ring at r (main.cpp:537-546).
    """
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    dx = xs - screen_pos[0]
    dy = ys - screen_pos[1]
    r = jnp.sqrt(dx * dx + dy * dy)
    r_n = r / jnp.maximum(screen_radius, 1e-3)      # radii units
    theta = jnp.arctan2(dy, dx)

    # Warm glow (255, 255, 237) fading over ~6.6 radii.
    glow = jnp.exp(-jnp.maximum(r_n - 1.0, 0.0) / 2.2)
    glow_rgb = glow[..., None] * jnp.array([255.0, 255.0, 237.0]) * 0.8

    # Accretion disk ring with soft edges + azimuthal modulation.
    in_disk = jax.nn.sigmoid((r_n - 2.1) * 4.0) * jax.nn.sigmoid(
        (10.51 - r_n) * 4.0
    )
    az = 11.5 + jnp.cos(theta)                       # main.cpp:502 brightness
    disk_b = in_disk * az / 12.5
    disk_rgb = disk_b[..., None] * jnp.array([30.0, 20.0, 60.0])

    # Photon ring: thin bright ring at the horizon radius.
    ring = jnp.exp(-((r_n - 1.0) ** 2) / (2.0 * 0.02 ** 2))
    ring_rgb = ring[..., None] * jnp.array([255.0, 225.0, 210.0])

    out = frame + glow_rgb + disk_rgb + ring_rgb

    # Event horizon: black disc with a subtle blue edge (0,0,40).
    inside = (r_n < 1.0)[..., None]
    edge = jnp.clip(1.0 - (1.0 - r_n) * 8.0, 0.0, 1.0)[..., None]
    horizon = edge * jnp.array([0.0, 0.0, 40.0])
    return jnp.where(inside, horizon, out)


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
