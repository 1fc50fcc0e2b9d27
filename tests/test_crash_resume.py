"""Failure-recovery integration test (SURVEY.md §5 failure-detection row).

The reference has no recovery story at all (a crash loses everything —
main.cpp:660 detaches the sim thread and never joins it). Our story is
checkpoint-as-restart: periodic checkpoints from `cli run` double as restart
points. This test exercises the full loop the way a real failure does:

  1. launch a headless run in a SEPARATE process with periodic checkpoints,
  2. SIGKILL it mid-run (no cleanup, no atexit — a hard crash),
  3. resume from the last checkpoint it managed to write,
  4. verify the resumed trajectory is bitwise identical to a run that was
     never interrupted.
"""

import glob
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

TOTAL_STEPS = 12
CKPT_EVERY = 4

_CHILD = """
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize ignores JAX_PLATFORMS
from nbodysim_tpu.cli import main
main([
    "run", "--scene", "uniform_disc", "--n", "64", "--backend", "xla",
    "--steps", "100000", "--log-every", "2",
    "--checkpoint-every", "{ckpt_every}", "--checkpoint-dir", "{ckdir}",
])
"""


def _run_inproc(argv):
    from nbodysim_tpu.cli import main

    main(argv)


def test_crash_sigkill_resume_bitwise(tmp_path):
    ckdir = str(tmp_path / "ck")
    os.makedirs(ckdir)

    # 1) A real separate process, stepping away with periodic checkpoints.
    child = subprocess.Popen(
        [sys.executable, "-c",
         _CHILD.format(ckpt_every=CKPT_EVERY, ckdir=ckdir)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        # 2) Wait until it has written at least one checkpoint, then KILL it
        #    mid-flight (SIGKILL: no handlers, no flushing — a hard crash).
        deadline = time.time() + 300
        ckpts = []
        while time.time() < deadline:
            if child.poll() is not None:
                pytest.fail(f"child exited early: rc={child.returncode}")
            ckpts = sorted(glob.glob(f"{ckdir}/ckpt_*.npz"))
            if ckpts:
                break
            time.sleep(0.25)
        assert ckpts, "child never produced a checkpoint"
        child.send_signal(signal.SIGKILL)
        child.wait(timeout=30)
    finally:
        if child.poll() is None:
            child.kill()

    # 3) Resume from the newest intact checkpoint. (A crash can land mid
    #    np.savez; a production watchdog would retry with the previous file —
    #    here the kill happens between chunks so the newest one is intact.)
    latest = sorted(glob.glob(f"{ckdir}/ckpt_*.npz"))[-1]
    frame = int(os.path.basename(latest)[5:-4])
    assert frame % CKPT_EVERY == 0 and frame >= CKPT_EVERY

    resumed_dir = str(tmp_path / "resumed")
    _run_inproc([
        "run", "--resume", latest, "--steps", str(TOTAL_STEPS),
        "--log-every", "2", "--checkpoint-dir", resumed_dir,
    ])

    # 4) The never-interrupted reference trajectory (same scene, same seed).
    ref_dir = str(tmp_path / "ref")
    _run_inproc([
        "run", "--scene", "uniform_disc", "--n", "64", "--backend", "xla",
        "--steps", str(TOTAL_STEPS), "--log-every", "2",
        "--checkpoint-dir", ref_dir,
    ])

    from nbodysim_tpu.io.checkpoint import load_checkpoint

    got, _ = load_checkpoint(f"{resumed_dir}/ckpt_final.npz")
    want, _ = load_checkpoint(f"{ref_dir}/ckpt_final.npz")
    assert int(got.frame) == int(want.frame) == TOTAL_STEPS
    np.testing.assert_array_equal(np.asarray(got.pos), np.asarray(want.pos))
    np.testing.assert_array_equal(np.asarray(got.vel), np.asarray(want.vel))
