"""Renderer, checkpoint, and CLI smoke tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import nbodysim_tpu as nb
from nbodysim_tpu.render.splat import RenderConfig, render_frame, star_colors
from nbodysim_tpu.io.checkpoint import load_checkpoint, save_checkpoint


def _cfg(**kw):
    return nb.SimConfig(**{"force_backend": "xla", **kw})


def test_star_colors_buckets():
    """Mass -> color table parity (main.cpp:555-580 thresholds)."""
    rgb = np.asarray(star_colors(jnp.array([0.01, 0.5, 2.0, 3.0, 30.0, 100.0])))
    np.testing.assert_array_equal(rgb[0], [0, 0, 255])       # < 0.08
    np.testing.assert_array_equal(rgb[1], [173, 216, 230])   # < 0.8
    np.testing.assert_array_equal(rgb[2], [255, 240, 150])   # < 2.5 (yellow)
    np.testing.assert_array_equal(rgb[3], [255, 150, 50])    # < 5.0
    np.testing.assert_array_equal(rgb[4], [200, 0, 0])       # < 50
    np.testing.assert_array_equal(rgb[5], [0, 0, 2])         # fallback


def test_render_frame_shape_and_content():
    config = _cfg(n=512)
    state = nb.init_scene("uniform_disc", config)
    rc = RenderConfig(width=320, height=240, scale=0.01)
    frame = np.asarray(render_frame(state, rc))
    assert frame.shape == (240, 320, 3)
    assert frame.dtype == np.uint8
    assert frame.max() > 0, "frame is all black"
    # Black hole composite: some pixels near center should be pure black
    # ring interior or bright ring.
    assert frame.max() == 255


def test_render_performance_mode():
    config = _cfg(n=128)
    state = nb.init_scene("uniform_disc", config)
    rc = RenderConfig(width=128, height=128, scale=0.01,
                      performance_mode=True)
    frame = np.asarray(render_frame(state, rc))
    # white splats: all channels equal wherever lit
    lit = frame.max(axis=-1) > 0
    assert lit.any()
    diff = frame.astype(int).max(axis=-1) - frame.astype(int).min(axis=-1)
    assert np.all(diff[lit] == 0)


def test_checkpoint_roundtrip(tmp_path):
    config = _cfg(n=64)
    state = nb.init_scene("plummer", config)
    path = save_checkpoint(str(tmp_path / "ck.npz"), state, config)
    loaded, cfg2 = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(state.pos), np.asarray(loaded.pos))
    np.testing.assert_array_equal(np.asarray(state.vel), np.asarray(loaded.vel))
    assert cfg2 == config


def test_checkpoint_deterministic_resume(tmp_path):
    """save -> load -> step  must equal  step without interruption."""
    from nbodysim_tpu.physics.integrators import make_step

    config = _cfg(n=64)
    state = nb.init_scene("uniform_disc", config)
    step = make_step(config)
    mid = step(step(state))

    path = save_checkpoint(str(tmp_path / "mid.npz"), mid, config)
    resumed, _ = load_checkpoint(path)

    a = step(mid)
    b = step(resumed)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))
    assert int(a.frame) == int(b.frame) == 3


def test_cli_run_and_resume(tmp_path, capsys):
    from nbodysim_tpu.cli import main

    ckdir = str(tmp_path / "ck")
    main(["run", "--scene", "plummer", "--n", "64", "--steps", "6",
          "--log-every", "3", "--backend", "xla",
          "--checkpoint-dir", ckdir])
    out = capsys.readouterr().out
    assert "frame       6" in out
    assert "ckpt_final.npz" in out

    main(["run", "--resume", f"{ckdir}/ckpt_final.npz", "--steps", "9",
          "--log-every", "3"])
    out = capsys.readouterr().out
    assert "resumed" in out and "frame       9" in out


def test_cli_render_pngs(tmp_path):
    from nbodysim_tpu.cli import main

    out_dir = str(tmp_path / "frames")
    main(["render", "--scene", "plummer", "--n", "64", "--backend", "xla",
          "--frames", "2", "--steps-per-frame", "2",
          "--width", "64", "--height", "64", "--out", out_dir])
    assert os.path.exists(f"{out_dir}/frame_00000.png")
    assert os.path.exists(f"{out_dir}/frame_00001.png")


def test_cli_bad_set_key():
    from nbodysim_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["run", "--steps", "1", "--set", "warp=9"])


def test_async_frame_writer_order_and_completion():
    """AsyncFrameWriter (the main.cpp:612-635 double-buffer analogue)
    delivers every frame, in order, even with a slow sink."""
    import time

    from nbodysim_tpu.render.video import AsyncFrameWriter

    got = []

    def slow_sink(i, frame):
        time.sleep(0.005)
        got.append((i, int(frame.sum())))

    w = AsyncFrameWriter(slow_sink, maxsize=2)
    for i in range(20):
        w.submit(i, np.full((4, 4), i, np.uint8))
    w.close()
    assert got == [(i, i * 16) for i in range(20)]


def test_async_frame_writer_propagates_sink_errors():
    from nbodysim_tpu.render.video import AsyncFrameWriter

    def bad_sink(i, frame):
        raise RuntimeError("disk full")

    w = AsyncFrameWriter(bad_sink, maxsize=1)
    with pytest.raises(RuntimeError, match="disk full"):
        for i in range(50):
            w.submit(i, np.zeros((2, 2), np.uint8))
        w.close()


def test_streaming_video_writer(tmp_path):
    """StreamingVideoWriter encodes incrementally (gif fallback path)."""
    from nbodysim_tpu.render.video import StreamingVideoWriter

    path = str(tmp_path / "clip.gif")
    sink = StreamingVideoWriter(path, fps=10)
    for i in range(3):
        sink(i, np.full((16, 16, 3), i * 40, np.uint8))
    out = sink.finish()
    assert out.endswith(".gif") and os.path.getsize(out) > 0


def test_render_rollout_double_buffer_matches_sequential():
    """The double-buffered dispatch in render_rollout must yield exactly
    the frames of the naive render-then-step loop."""
    import jax

    from nbodysim_tpu.physics.integrators import make_rollout
    from nbodysim_tpu.render.video import render_rollout

    cfg = _cfg(n=64, dim=2, enable_collisions=False)
    state = nb.init_scene("plummer", cfg)
    rc = RenderConfig(width=32, height=32)

    frames = list(render_rollout(state, cfg, 3, 2, rc))

    rollout = make_rollout(cfg, 2)
    rjit = jax.jit(lambda s: render_frame(s, rc, cfg))
    s = state
    for i in range(3):
        np.testing.assert_array_equal(frames[i], np.asarray(rjit(s)))
        s = rollout(s)
