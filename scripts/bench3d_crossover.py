"""3D octree vs exact all-pairs crossover on the real TPU (one v5e chip).

Writes one JSON line per (n, backend) measurement; used to set
forces.BH3_AUTO_THRESHOLD. Run from anywhere: python scripts/bench3d_crossover.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbodysim_tpu.diagnostics.profiling import measure_force_throughput

for n in (131072, 262144, 524288, 1048576):
    for backend in ("pallas", "bh"):
        try:
            r = measure_force_throughput(n, backend=backend, reps=5, dim=3)
            print(json.dumps(r), flush=True)
        except Exception as e:
            print(f"FAIL n={n} backend={backend}: {type(e).__name__}: {e}",
                  flush=True)
