"""Frame/video output: PNG frames and mp4/gif via imageio (host side).

The device produces uint8 RGB frames (render/splat.py); this module only
moves bytes to disk — the BASELINE config-3 "headless on-device render to
PNG frame sequence" path.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import numpy as np


def save_png(frame, path: str) -> str:
    """Write one uint8 RGB frame to a PNG."""
    from PIL import Image

    arr = np.asarray(frame)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr, "RGB").save(path)
    return path


def save_frames(frames: Iterable, out_dir: str, prefix: str = "frame") -> list:
    """Write a frame sequence as out_dir/prefix_%05d.png."""
    paths = []
    for i, f in enumerate(frames):
        paths.append(save_png(f, os.path.join(out_dir, f"{prefix}_{i:05d}.png")))
    return paths


def save_video(frames: Iterable, path: str, fps: int = 30) -> str:
    """Encode frames to mp4 (OpenCV, no ffmpeg needed) or gif (PIL)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = [np.asarray(f) for f in frames]
    if path.endswith(".gif"):
        import imageio

        imageio.mimsave(path, frames, fps=fps)
        return path
    try:
        import cv2

        h, w = frames[0].shape[:2]
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not writer.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        return path
    except Exception as e:
        # No system video encoder: fall back to an animated GIF.
        import imageio

        gif = os.path.splitext(path)[0] + ".gif"
        imageio.mimsave(gif, frames, fps=fps)
        print(f"save_video: mp4 encoder unavailable ({e}); wrote {gif}")
        return gif


def render_rollout(
    state,
    config,
    num_frames: int,
    steps_per_frame: int,
    render_config=None,
    on_frame: Optional[Callable[[int, np.ndarray], None]] = None,
):
    """Step the simulation on device and yield rendered frames.

    The step rollout and the rasterizer both run under jit; only the final
    uint8 frames cross to the host (the reference instead copies the full
    body vector under a mutex every step, main.cpp:623-627).
    """
    import jax

    from nbodysim_tpu.physics.integrators import make_rollout, prime_accelerations
    from nbodysim_tpu.render.splat import render_frame

    if config.integrator == "leapfrog_kdk":
        state = prime_accelerations(state, config)
    rollout = make_rollout(config, steps_per_frame)
    render_jit = jax.jit(
        lambda s: render_frame(s, render_config, config)
    )
    for i in range(num_frames):
        frame = np.asarray(render_jit(state))
        if on_frame is not None:
            on_frame(i, frame)
        yield frame
        state = rollout(state)
