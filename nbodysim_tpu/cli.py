"""Command-line interface — the headless analogue of the reference app.

The reference is an interactive raylib window (main.cpp:637-958: keyboard
controls, dt slider, HUD metrics panel). On a TPU host there is no window;
the same surface maps to subcommands:

  run     step a scene, print the HUD metrics panel every K steps,
          checkpoint every K steps, resume from a checkpoint; --control FILE
          polls a key=value file each chunk for live dt / pause / stop — the
          headless analogue of the reference's runtime atomics
          (main.cpp:674-724 keyboard handling, 889-893 dt slider)
  render  headless render to a PNG frame sequence / mp4 (BASELINE config 3)
  bench   the benchmark harness (same as bench.py)
  info    print device/backend info and the resolved config

Reference controls that are runtime toggles (pause, dt x1.5 / x0.666,
performance mode, show/hide) become flags; compile-time constants are
SimConfig fields (--set key=value).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _parse_config(args) -> "SimConfig":
    from nbodysim_tpu.config import SimConfig

    cfg = SimConfig()
    overrides = {}
    if args.n is not None:
        overrides["n"] = args.n
    if args.dt is not None:
        overrides["dt"] = args.dt
    if getattr(args, "integrator", None):
        overrides["integrator"] = args.integrator
    if getattr(args, "backend", None):
        overrides["force_backend"] = args.backend
    if args.seed is not None:
        overrides["seed"] = args.seed
    import dataclasses

    field_names = {f.name for f in dataclasses.fields(cfg)}
    for kv in args.set or []:
        k, _, v = kv.partition("=")
        if not _ or k not in field_names:
            # hasattr would accept properties like eps_sq and then crash in
            # replace(); validate against the real dataclass fields.
            hint = ""
            if k == "eps_sq":
                hint = " (did you mean 'softening'?)"
            raise SystemExit(f"unknown config field in --set: {k!r}{hint}")
        current = getattr(cfg, k)
        if isinstance(current, bool):
            overrides[k] = v.lower() in ("1", "true", "yes")
        elif isinstance(current, int):
            overrides[k] = int(v)
        elif isinstance(current, float):
            overrides[k] = float(v)
        else:
            overrides[k] = v
    return cfg.replace(**overrides)


def _add_common(p):
    p.add_argument("--scene", default="uniform_disc",
                   help="scene name (see nbodysim_tpu.scenes.SCENES)")
    p.add_argument("--n", type=int, default=None, help="particle count")
    p.add_argument("--dt", type=float, default=None, help="timestep")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--integrator",
                   choices=["euler_symplectic", "leapfrog_kdk"], default=None)
    p.add_argument("--backend", choices=["auto", "pallas", "xla", "bh"],
                   default=None)
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="override any SimConfig field")


def read_control_file(path):
    """Parse a runtime-control file: one key=value per line (dt=<float>,
    pause=0/1, stop=0/1); '#' comments and blank lines ignored. Returns a
    dict (possibly empty). Missing/unreadable file -> empty dict."""
    import os

    out = {}
    if not path or not os.path.exists(path):
        return out
    try:
        with open(path) as f:
            lines = f.readlines()
    except OSError:
        return out
    for line in lines:
        line = line.split("#", 1)[0].strip()
        if not line or "=" not in line:
            continue
        k, _, v = line.partition("=")
        k, v = k.strip(), v.strip()
        try:
            if k == "dt":
                out["dt"] = float(v)
            elif k in ("pause", "stop"):
                out[k] = v.lower() in ("1", "true", "yes", "on")
        except ValueError:
            continue
    return out


def cmd_run(args):
    import os
    import jax

    from nbodysim_tpu.api import Simulation
    from nbodysim_tpu.diagnostics.metrics import diagnostics, system_metrics
    from nbodysim_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    config = _parse_config(args)

    if args.resume:
        state, saved_cfg = load_checkpoint(args.resume)
        if saved_cfg is not None:
            config = saved_cfg
        sim = Simulation(config, state=state)
        print(f"resumed from {args.resume} at frame {sim.frame}")
    else:
        sim = Simulation(config, scene=args.scene)

    total = args.steps
    chunk = max(1, min(args.log_every, total))
    t_start = time.perf_counter()
    last_ckpt_bucket = (int(sim.frame) // args.checkpoint_every
                        if args.checkpoint_every else 0)
    control = getattr(args, "control", None)
    ctrl_mtime = None
    while int(sim.frame) < total:
        # Runtime control channel (reference: atomics mutated by the UI
        # thread, main.cpp:674-724; here a polled key=value file so a long
        # headless TPU run can be retuned/paused/stopped without restart).
        if control:
            directives = read_control_file(control)
            try:
                mtime = os.path.getmtime(control)
            except OSError:
                mtime = None
            changed = mtime != ctrl_mtime
            ctrl_mtime = mtime
            if directives.get("stop"):
                print(f"control: stop at frame {int(sim.frame)}")
                break
            if changed and "dt" in directives \
                    and directives["dt"] != sim.config.dt:
                # Reference dt slider semantics (main.cpp:865-893): the UI
                # clamps dt to [0.001, 0.1] and flags the max; mirror that
                # for the control channel instead of accepting any value.
                from nbodysim_tpu.api import DT_MAX, DT_MIN, clamp_dt

                new_dt, clamped = clamp_dt(directives["dt"])
                if clamped:
                    print(f"control: dt {directives['dt']} outside the "
                          f"reference slider range [{DT_MIN}, {DT_MAX}]; "
                          f"clamped to {new_dt}")
                if new_dt != sim.config.dt:
                    sim.set_dt(new_dt)
                    print(f"control: dt -> {sim.config.dt}")
            while directives.get("pause") and not directives.get("stop"):
                time.sleep(0.2)
                directives = read_control_file(control)
            if directives.get("stop"):
                print(f"control: stop at frame {int(sim.frame)}")
                break
        todo = min(chunk, total - int(sim.frame))
        sim.run(todo)
        # Re-check residual-capacity occupancy as the scene evolves (a
        # clustering disc can exceed the fixed caps long after init) and,
        # when a cap trips on an auto config, adopt the coverage-enabling
        # re-resolution (deep chain on / hash broad phase) mid-run.
        if sim.check_capacity(when=f"frame {int(sim.frame)}"):
            if sim.re_resolve_auto(when=f"frame {int(sim.frame)}"):
                print(f"auto re-resolve at frame {int(sim.frame)}: "
                      f"deep={sim.config.bh_deep_levels}, "
                      f"collisions={sim.config.collision_broad_phase}")
        d = sim.diagnostics()
        elapsed = time.perf_counter() - t_start
        sps = int(sim.frame) / max(elapsed, 1e-9)
        # HUD panel (reference main.cpp:919-944). The step rate carries
        # the reference's FPS color thresholds (main.cpp:847: >= 30
        # green, >= 15 orange, else red) when stdout is a terminal;
        # piped/captured output stays ANSI-free.
        if sys.stdout.isatty():
            tint = ("\x1b[32m" if sps >= 30
                    else "\x1b[33m" if sps >= 15 else "\x1b[31m")
            rate = f"{tint}{sps:8.1f} steps/s\x1b[0m"
        else:
            rate = f"{sps:8.1f} steps/s"
        print(
            f"frame {int(sim.frame):7d} | E {float(d.total_energy):+.6e} | "
            f"KE {float(d.kinetic):.4e} | PE {float(d.potential):.4e} | "
            f"|p| {float(np.linalg.norm(d.momentum)):.3e} | "
            f"Lz {float(np.ravel(d.angular_momentum)[-1]):.4e} | "
            f"{rate}"
        )
        if args.metrics:
            m = system_metrics(sim.state, config)
            print("  " + " | ".join(
                f"{k} {float(v):.4g}" for k, v in m.items()))
        ck_dir = args.checkpoint_dir or "checkpoints"
        # Fire whenever a checkpoint-every boundary was crossed this chunk
        # (the frame counter advances log_every at a time, so an exact
        # modulo test would silently skip incompatible cadences).
        if args.checkpoint_every:
            bucket = int(sim.frame) // args.checkpoint_every
            if bucket > last_ckpt_bucket:
                last_ckpt_bucket = bucket
                path = f"{ck_dir}/ckpt_{int(sim.frame):07d}.npz"
                save_checkpoint(path, sim.state, config)
                print(f"  checkpoint -> {path}")

    # A final checkpoint is written only when checkpointing was requested.
    if args.checkpoint_dir and not args.checkpoint_every:
        path = f"{args.checkpoint_dir}/ckpt_final.npz"
        save_checkpoint(path, sim.state, config)
        print(f"checkpoint -> {path}")


def cmd_render(args):
    from nbodysim_tpu.render.splat import RenderConfig
    from nbodysim_tpu.render.video import (
        AsyncFrameWriter,
        StreamingVideoWriter,
        render_rollout,
        save_png,
    )
    from nbodysim_tpu.scenes import init_scene

    config = _parse_config(args)
    state = init_scene(args.scene, config)
    rc = RenderConfig(
        width=args.width, height=args.height, scale=args.scale,
        performance_mode=args.performance_mode,
        draw_black_hole=not args.no_black_hole,
        show_quadtree=args.show_quadtree,
        show_connections=args.show_connections,
    )
    # Encode on a helper thread (AsyncFrameWriter) so device stepping
    # overlaps PNG/mp4 encode — the reference's sim/render double buffer
    # (main.cpp:612-635) as a bounded producer-consumer queue.
    is_video = args.out.endswith((".mp4", ".gif"))
    if is_video:
        video_sink = StreamingVideoWriter(args.out, fps=args.fps)
        writer = AsyncFrameWriter(video_sink)
    else:
        writer = AsyncFrameWriter(
            lambda i, f: save_png(f, f"{args.out}/frame_{i:05d}.png"))
    t0 = time.perf_counter()
    for i, frame in enumerate(render_rollout(
            state, config, args.frames, args.steps_per_frame, rc)):
        writer.submit(i, frame)
        if (i + 1) % 10 == 0:
            print(f"frame {i+1}/{args.frames} "
                  f"({(i+1)/(time.perf_counter()-t0):.2f} fps)")
    writer.close()
    if is_video:
        print(f"wrote {video_sink.finish()}")
    else:
        print(f"wrote {args.frames} PNGs to {args.out}/")


def cmd_bench(args):
    import bench as bench_mod  # repo-root harness

    sys.argv = ["bench.py"] + (["--full"] if args.full else [])
    bench_mod.main()


def cmd_info(args):
    import jax

    config = _parse_config(args)
    print("devices:", jax.devices())
    print("backend:", jax.default_backend())
    print("config:", json.dumps(
        {k: str(v) for k, v in vars(config).items()}, indent=2))


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="nbodysim-tpu",
        description="TPU-native N-body simulator (capabilities of "
                    "7IBBE77S/nbodysim, rebuilt for JAX/Pallas)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="run a simulation headless")
    _add_common(p_run)
    p_run.add_argument("--steps", type=int, default=1000)
    p_run.add_argument("--log-every", type=int, default=100)
    p_run.add_argument("--metrics", action="store_true",
                       help="print the reference HUD metrics panel too")
    p_run.add_argument("--checkpoint-every", type=int, default=0)
    p_run.add_argument("--checkpoint-dir", default=None)
    p_run.add_argument("--resume", default=None, metavar="CKPT")
    p_run.add_argument("--control", default=None, metavar="FILE",
                       help="poll FILE each chunk for runtime control "
                            "(lines: dt=<float>, pause=0/1, stop=1) — the "
                            "headless analogue of the reference's live "
                            "keyboard/slider atomics")
    p_run.set_defaults(fn=cmd_run)

    p_r = sub.add_parser("render", help="headless render to frames/video")
    _add_common(p_r)
    p_r.add_argument("--out", default="frames",
                     help="output dir for PNGs, or .mp4/.gif path")
    p_r.add_argument("--frames", type=int, default=60)
    p_r.add_argument("--steps-per-frame", type=int, default=10)
    p_r.add_argument("--width", type=int, default=1200)
    p_r.add_argument("--height", type=int, default=900)
    p_r.add_argument("--scale", type=float, default=0.005)
    p_r.add_argument("--fps", type=int, default=30)
    p_r.add_argument("--performance-mode", action="store_true")
    p_r.add_argument("--no-black-hole", action="store_true")
    p_r.add_argument("--show-quadtree", action="store_true",
                     help="quadtree wireframe overlay (reference Q toggle)")
    p_r.add_argument("--show-connections", action="store_true",
                     help="neighbor connection overlay (reference C toggle)")
    p_r.set_defaults(fn=cmd_render)

    p_b = sub.add_parser("bench", help="benchmark harness")
    p_b.add_argument("--full", action="store_true")
    p_b.set_defaults(fn=cmd_bench)

    p_i = sub.add_parser("info", help="devices + resolved config")
    _add_common(p_i)
    p_i.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
