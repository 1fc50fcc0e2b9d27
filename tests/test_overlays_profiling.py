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
