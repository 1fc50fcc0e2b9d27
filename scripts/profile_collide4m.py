"""Collision pass ALONE at config-5 scale (N=4M merger, sorted hash).

The fused step (BH deep+tiles + hash collisions in ONE graph) crashed the
TPU worker at compile/warm (r4; the r3 relay death was the same graph
family). This script isolates the collision stage: resolve the broad
phase from the real merger distribution, jit JUST the collision pass, and
time it chained under one dispatch. Output feeds the split-dispatch
decision: if forces-step (measured 3.16 s) + collide-pass ~= the fused
target, the CLI/API can run huge-N collisions as a second dispatch per
step instead of one crash-prone mega-graph.

Usage: scripts/tpu_retry.sh /tmp/collide4m.log python scripts/profile_collide4m.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import numpy as np                                      # noqa: E402
from jax import lax                                     # noqa: E402

N = 1 << 22
REPS = 3


def main():
    from nbodysim_tpu.config import SimConfig
    from nbodysim_tpu.physics.collisions import (
        resolve_collision_phase_for_state, resolve_collisions)
    from nbodysim_tpu.scenes import init_scene

    cfg = SimConfig(n=N, dt=0.05, integrator="leapfrog_kdk",
                    force_backend="bh", bh_deep_levels=-1,
                    enable_collisions=True)
    state = init_scene("galaxy_merger", cfg)
    cfg = resolve_collision_phase_for_state(state, cfg)
    print(f"broad phase: {cfg.collision_broad_phase} "
          f"cell={cfg.collision_cell_size}", flush=True)

    def chained(s):
        def body(c, _):
            out = resolve_collisions(c, cfg)
            return out, None

        out, _ = lax.scan(body, s, None, length=REPS)
        return jnp.sum(out.pos)

    f = jax.jit(chained)
    t0 = time.time()
    np.asarray(f(state))
    print(f"compile+warm {time.time() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f(state))
        best = min(best, time.perf_counter() - t0)
    per = best / REPS
    print(json.dumps({"metric": "collision pass s/step at N=4M (block)",
                      "value": per, "unit": "s",
                      "vs_baseline": None}), flush=True)


if __name__ == "__main__":
    main()
