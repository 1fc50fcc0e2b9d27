"""Frame/video output: PNG frames and mp4/gif via imageio (host side).

The device produces uint8 RGB frames (render/splat.py); this module only
moves bytes to disk — the BASELINE config-3 "headless on-device render to
PNG frame sequence" path.

Sim/render pipelining: the reference overlaps physics and rendering with a
producer-consumer double buffer (main.cpp:612-635) so the sim thread never
waits on a frame. The TPU analogue here is two-fold: `render_rollout`
dispatches the NEXT step chunk before pulling the current frame (JAX's
async dispatch keeps the device stepping while the uint8 frame crosses the
tunnel), and `AsyncFrameWriter` moves PNG/mp4 encoding to a helper thread
behind a bounded one-slot queue so host-side encode overlaps device
stepping too.
"""

from __future__ import annotations

import os
import queue
import threading
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
    if not frames:
        raise ValueError("save_video: no frames to encode")
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


class AsyncFrameWriter:
    """Bounded helper-thread frame sink (the reference double buffer's role,
    main.cpp:612-635): `submit` hands a frame to a worker thread and returns
    as soon as a queue slot frees, so the producer (device stepping) is
    never blocked on PNG/video encode unless encode falls a full
    `maxsize` frames behind. Worker exceptions re-raise on the next
    `submit` or on `close`."""

    _DONE = object()

    def __init__(self, sink: Callable[[int, np.ndarray], None],
                 maxsize: int = 2):
        self._sink = sink
        self._q: queue.Queue = queue.Queue(maxsize=maxsize)
        self._err: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is self._DONE:
                    return
                if self._err is None:
                    i, frame = item
                    self._sink(i, frame)
            except BaseException as e:  # noqa: BLE001 — must surface encode errors
                self._err = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, index: int, frame) -> None:
        self._check()
        self._q.put((index, np.asarray(frame)))

    def close(self) -> None:
        """Flush the queue, join the worker, re-raise any encode error."""
        self._q.put(self._DONE)
        self._worker.join()
        self._check()


class StreamingVideoWriter:
    """Incremental mp4 writer (cv2); buffers in memory only for the gif
    fallback. Use as the sink of an AsyncFrameWriter to stream a long
    render to disk without holding every frame."""

    def __init__(self, path: str, fps: int = 30):
        self.path = path
        self.fps = fps
        self._cv2 = None
        self._writer = None
        self._gif_frames: Optional[list] = None
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def __call__(self, index: int, frame: np.ndarray) -> None:
        if self.path.endswith(".gif") or self._gif_frames is not None:
            if self._gif_frames is None:
                self._gif_frames = []
            self._gif_frames.append(np.asarray(frame))
            return
        if self._writer is None:
            try:
                import cv2

                h, w = frame.shape[:2]
                self._writer = cv2.VideoWriter(
                    self.path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps,
                    (w, h))
                if not self._writer.isOpened():
                    raise RuntimeError("cv2.VideoWriter failed to open")
                self._cv2 = cv2
            except Exception:
                self._writer = None
                self._gif_frames = [np.asarray(frame)]
                return
        self._writer.write(self._cv2.cvtColor(np.asarray(frame),
                                              self._cv2.COLOR_RGB2BGR))

    def finish(self) -> str:
        if self._writer is None and self._gif_frames is None:
            raise ValueError(
                "StreamingVideoWriter.finish: no frames were written")
        if self._writer is not None:
            self._writer.release()
            return self.path
        if self._gif_frames is not None:
            import imageio

            gif = (self.path if self.path.endswith(".gif")
                   else os.path.splitext(self.path)[0] + ".gif")
            imageio.mimsave(gif, self._gif_frames, fps=self.fps)
            return gif
        return self.path


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
    body vector under a mutex every step, main.cpp:623-627). The loop is
    double-buffered: the next step chunk and its frame are DISPATCHED
    before the current frame's host transfer, so JAX's async dispatch
    keeps the device stepping while frame i crosses the tunnel and the
    caller encodes it (the sim-thread-never-waits property of
    main.cpp:612-635).
    """
    import jax

    from nbodysim_tpu.physics.integrators import make_rollout, prime_accelerations
    from nbodysim_tpu.render.splat import render_frame

    # Same probes as api.Simulation (r3 review: CLI renders used to
    # bypass them — clustered large-N scenes silently ran the lossy
    # bucket broad phase and the capacity-limited plain tree).
    if config.force_backend == "auto":
        from nbodysim_tpu.physics.forces import resolve_config_for_state

        config = resolve_config_for_state(state.pos, state.mass, config)
    if config.enable_collisions:
        from nbodysim_tpu.physics.collisions import (
            resolve_collision_phase_for_state)

        config = resolve_collision_phase_for_state(state, config)
    if config.integrator == "leapfrog_kdk":
        state = prime_accelerations(state, config)
    rollout = make_rollout(config, steps_per_frame)
    render_jit = jax.jit(
        lambda s: render_frame(s, render_config, config)
    )
    frame_dev = render_jit(state)
    for i in range(num_frames):
        if i + 1 < num_frames:
            state = rollout(state)            # async: device starts chunk i+1
            next_dev = render_jit(state)      # async: frame i+1 queued behind it
        else:
            next_dev = None
        frame = np.asarray(frame_dev)         # blocks only on frame i's bytes
        if on_frame is not None:
            on_frame(i, frame)
        yield frame
        frame_dev = next_dev
