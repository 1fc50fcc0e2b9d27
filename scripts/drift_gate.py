import time, numpy as np
import jax
import nbodysim_tpu as nb
from nbodysim_tpu.physics.integrators import make_rollout, prime_accelerations
from nbodysim_tpu.diagnostics.metrics import diagnostics

cfg = nb.SimConfig(n=4096, dt=0.5, softening=10.0, integrator="leapfrog_kdk",
                   enable_collisions=False, enable_boundary=False,
                   enable_velocity_clamp=False, force_backend="pallas")
state = nb.init_scene("plummer", cfg, total_mass=1e4, scale_radius=1000.0)
state = prime_accelerations(state, cfg)
e0 = float(diagnostics(state, cfg).total_energy)
print(f"E0 = {e0:.6e}", flush=True)
roll = make_rollout(cfg, 500)
t0 = time.perf_counter()
worst = 0.0
for chunk in range(20):
    state = roll(state)
    d = diagnostics(state, cfg)
    e = float(d.total_energy)
    drift = abs(e - e0)/abs(e0)
    worst = max(worst, drift)
    print(f"step {int(state.frame):6d}  E {e:+.6e}  |dE/E| {drift:.3e}  "
          f"|p| {float(np.linalg.norm(d.momentum)):.3e}  "
          f"({(time.perf_counter()-t0):.0f}s)", flush=True)
print(f"RESULT worst |dE/E| over 10k steps: {worst:.3e}  (gate 1e-4)", flush=True)
