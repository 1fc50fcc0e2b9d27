"""Overlay render passes and profiling meters."""

import numpy as np
import jax.numpy as jnp

import nbodysim_tpu as nb
from nbodysim_tpu.render.splat import RenderConfig, render_frame


def _scene(n=512):
    config = nb.SimConfig(n=n, force_backend="xla")
    return config, nb.init_scene("uniform_disc", config)


def test_quadtree_overlay_draws_lines():
    config, state = _scene()
    rc = RenderConfig(width=256, height=192, scale=0.01)
    plain = np.asarray(render_frame(state, rc))
    overlaid = np.asarray(
        render_frame(state, rc.replace(show_quadtree=True)))
    diff = (plain != overlaid).any(axis=-1)
    assert diff.sum() > 100, "quadtree overlay drew nothing"
    # Overlay pixels are gray-ish (equal channels where fully blended over
    # black background).
    changed = overlaid[diff & (plain.max(-1) == 0)]
    assert changed.size > 0


def test_connections_overlay_draws_red():
    config, state = _scene()
    rc = RenderConfig(width=256, height=192, scale=0.01)
    plain = np.asarray(render_frame(state, rc))
    overlaid = np.asarray(
        render_frame(state, rc.replace(show_connections=True)))
    diff = (plain != overlaid).any(axis=-1)
    assert diff.sum() > 50, "connections overlay drew nothing"
    # Newly-drawn pixels over black must be red-dominant.
    newly = overlaid[diff & (plain.max(-1) == 0)]
    if newly.size:
        assert newly[:, 0].mean() > newly[:, 2].mean()


def test_stopwatch_and_throughput_meter():
    from nbodysim_tpu.diagnostics.profiling import (
        Stopwatch,
        measure_force_throughput,
    )

    sw = Stopwatch()
    with sw.lap():
        pass
    assert sw.best >= 0.0

    out = measure_force_throughput(256, backend="xla", reps=2)
    assert out["pairs_per_second"] > 0
    assert out["n"] == 256


def test_trace_contextmanager(tmp_path):
    import jax

    from nbodysim_tpu.diagnostics.profiling import trace

    with trace(str(tmp_path / "trace")):
        jnp.ones((8,)).sum().block_until_ready()
    # The profiler writes a plugins/profile dir.
    assert any((tmp_path / "trace").rglob("*"))


def test_connections_zoom_modes():
    """VERDICT item 5: connection parameters scale with zoom; far out
    (gridLevel > 2) the overlay switches to salmon cluster segments,
    zoomed in it draws red per-body lines."""
    import nbodysim_tpu as nb
    from nbodysim_tpu.render.overlays import connections_overlay

    cfg = nb.SimConfig(n=256, force_backend="xla")
    state = nb.init_scene("uniform_disc", cfg)
    base = jnp.zeros((200, 200, 3), jnp.uint8)

    # Zoomed out: scale 0.005 -> zoomFactor 0.1 -> gridLevel 3 -> cluster
    # mode, salmon (255,190,152): red > green > blue strictly.
    far = np.asarray(connections_overlay(base, state, 0.005, (0.0, 0.0)))
    assert far.sum() > 0
    lit = far.sum(-1) > 0
    r, g, b = (far[..., i][lit].astype(int) for i in range(3))
    assert (r >= g).all() and (g > b).all() and (g > 0).any()

    # Zoomed in: per-body mode, pure red lines (g == b == 0 where drawn
    # over black).
    near = np.asarray(connections_overlay(base, state, 0.5, (0.0, 0.0)))
    if near.sum() > 0:
        lit = near.sum(-1) > 0
        assert (near[..., 1][lit] == 0).all()
        assert (near[..., 0][lit] > 0).all()


def test_black_hole_composite_structure():
    """VERDICT item 6: the reference's drawBlackHole stack — black horizon
    disc, opaque photon ring at R, angularly ASYMMETRIC accretion disk
    (300/390-degree arc mismatch: opacity ramps with azimuth)."""
    from nbodysim_tpu.render.splat import _black_hole_layer

    h = w = 400
    base = jnp.full((h, w, 3), 60.0, jnp.float32)
    R = 12.0
    out = np.asarray(jnp.clip(_black_hole_layer(
        base, jnp.array([200.0, 200.0]), jnp.asarray(R), w, h),
        0, 255).astype(jnp.uint8))

    # Horizon: pure black strictly inside R (excluding the ring band).
    assert (out[200, 195:199] == 0).all()
    # Photon ring at R: bright warm color (255, 225, 210).
    ring_px = out[200, 200 - int(R)]
    assert ring_px[0] == 255 and ring_px[1] == 225 and ring_px[2] == 210
    # Disk asymmetry: azimuth ~180 deg (left of center, inside the disk
    # annulus) is far more opaque than azimuth ~0+ (right of center) —
    # the 300/390 arc-mismatch ramp.
    r_mid = int(5.0 * R)
    left = out[200, 200 - r_mid].astype(int)    # ~180 deg
    right = out[200, 200 + r_mid].astype(int)   # ~0 deg
    # Left should be dominated by the dim bluish disk color (B > R),
    # right mostly shows the background/glow.
    assert left[2] > left[1]
    assert right.sum() != left.sum()


def test_black_hole_glow_layer_alphas():
    """The compiled glow-layer alpha table reproduces the reference's u8
    cast, including the i=0 overflow (280 -> 24)."""
    from nbodysim_tpu.render.splat import _BH_GLOW_LAYERS

    alphas = [round(a * 255) for _, a in _BH_GLOW_LAYERS]
    assert alphas == [0, 70, 140, 210, 24]
