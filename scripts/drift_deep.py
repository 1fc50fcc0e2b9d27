"""10k-step drift run for the deep-overflow chain on a clustered scene
(VERDICT r2 item 6; BASELINE configs[4] names a long-horizon drift run).

The deep chain PM-smooths forces inside ultra-dense cells (cells act as
Plummer clouds of 0.3 deep-cell widths), so the integrated system is a
SMOOTHED Hamiltonian: exact-energy drift is expected to plateau at the
level of the smoothing correction, not at the leapfrog's ~1e-6. The gate
of record for this run is |dE/E| of the EXACT energy staying bounded
(< 1e-2) and trend-free over 10k steps.

r5 (VERDICT r4 #9): --steps 100000 runs the horizon BASELINE config 5
actually names (100k steps; still N=65k — the 4M whole-graph harness is
the relay-killing compile class, CLAUDE.md)."""
import argparse
import sys, time
sys.path.insert(0, "/root/repo")

ap = argparse.ArgumentParser()
ap.add_argument("--steps", type=int, default=10_000)
args = ap.parse_args()

import numpy as np
import nbodysim_tpu as nb
from nbodysim_tpu.physics.integrators import make_rollout, prime_accelerations
from nbodysim_tpu.diagnostics.metrics import diagnostics

N = 1 << 16
cfg = nb.SimConfig(n=N, dim=2, dt=0.05, integrator="leapfrog_kdk",
                   force_backend="bh", bh_deep_levels=-1, bh_tile_levels=-1,
                   enable_collisions=False, enable_boundary=False,
                   enable_velocity_clamp=False)
state = nb.init_scene("galaxy_merger", cfg)
state = prime_accelerations(state, cfg)
e0 = float(diagnostics(state, cfg).total_energy)
print(f"N={N} deep+tiles merger drift; E0 = {e0:.6e}", flush=True)
roll = make_rollout(cfg, 500)
t0 = time.perf_counter()
worst = 0.0
for chunk in range(max(args.steps // 500, 1)):
    state = roll(state)
    d = diagnostics(state, cfg)
    e = float(d.total_energy)
    drift = abs(e - e0) / abs(e0)
    worst = max(worst, drift)
    print(f"step {int(state.frame):6d}  E {e:+.6e}  |dE/E| {drift:.3e}  "
          f"|p| {float(np.linalg.norm(d.momentum)):.3e}  "
          f"({(time.perf_counter()-t0):.0f}s)", flush=True)
print(f"RESULT worst |dE/E| over {int(state.frame)} steps: {worst:.3e}  "
      f"(bound 1e-2)", flush=True)
