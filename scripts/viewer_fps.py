"""Measure the viewer's achieved interactive rate headless (VERDICT r4
missing #3): drive the FuncAnimation update callback under the Agg
backend for ~100 frames at the reference workload (N=25k,
main.cpp:637-958 runs 60 FPS there) and at one larger N, and report
achieved frames/sec. The reference HUD tints green at >= 30 FPS
(main.cpp:847-849) — that is the bar.

Usage: scripts/tpu_retry.sh /tmp/vfps.log python scripts/viewer_fps.py
       [--frames 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")


def measure(n: int, frames: int, steps_per_frame: int = 5) -> None:
    from nbodysim_tpu.app.viewer import Viewer
    from nbodysim_tpu.config import SimConfig

    v = Viewer(SimConfig(n=n, dt=0.01), scene="uniform_disc",
               steps_per_frame=steps_per_frame)
    fig, anim, update = v.build_animation()
    update(0)       # compile + first frame out of the timing
    t0 = time.perf_counter()
    for i in range(frames):
        update(i + 1)
    dt = time.perf_counter() - t0
    fps = frames / dt
    print(json.dumps({
        "n": n, "frames": frames, "steps_per_frame": steps_per_frame,
        "achieved_fps": round(fps, 1),
        "sim_steps_per_sec": round(fps * steps_per_frame, 1),
        "hud_tier": ("green" if fps >= 30 else
                     "orange" if fps >= 15 else "red"),
    }), flush=True)
    import matplotlib.pyplot as plt

    plt.close(fig)


def _device_watchdog(seconds: float = 420.0):
    """Self-kill if the first trivial device op cannot complete — the
    axon client hangs silently at init when launched within minutes of a
    previous client's exit (r5), and a hung client squats on the chip,
    blocking every later launch. Pattern from bench.py."""
    import threading

    import jax.numpy as jnp
    import numpy as np

    done = threading.Event()

    def fire():
        if not done.wait(seconds):
            print(json.dumps({"error": f"first device op did not "
                              f"complete in {seconds:.0f}s"}), flush=True)
            os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    np.asarray(jnp.ones((8,)).sum())
    done.set()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    args = ap.parse_args()
    _device_watchdog()
    measure(25_000, args.frames)          # the reference workload
    measure(262_144, max(args.frames // 2, 20))


if __name__ == "__main__":
    main()
