"""Clustered 3D N=1M eval: confirm the auto deep+tiles dispatch meets the
<=1 s/eval bar (VERDICT r2 #2 / STATUS r3 next #2).

Builds the clustered-blob scene from tests/test_deep_overflow.py (half the
particles in a dense Gaussian blob, half uniform background), resolves the
auto backend for the ACTUAL state (must pick bh + deep chain + tiles), and
times one force eval as a chained-scan dispatch on the real TPU.

Usage: python scripts/bench3d_clustered.py [n]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.physics.forces import resolve_config_for_state

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
k = jax.random.split(jax.random.PRNGKey(11), 3)
blob = 40.0 * jax.random.normal(k[0], (n // 2, 3)) + jnp.array(
    [500.0, -200.0, 100.0])
bg = jax.random.uniform(k[1], (n - n // 2, 3), jnp.float32,
                        -30000.0, 30000.0)
pos = jnp.concatenate([blob, bg]).astype(jnp.float32)
mass = jax.random.uniform(k[2], (n,), jnp.float32, 0.1, 10.0)

cfg = resolve_config_for_state(pos, mass, SimConfig(n=n, dim=3, seed=11))
print(json.dumps({"backend": cfg.force_backend,
                  "deep": cfg.bh_deep_levels,
                  "tiles": cfg.bh_tile_levels}), flush=True)

from nbodysim_tpu.physics.barneshut3d import bh3_accelerations

reps = 2


def chained(p, m):
    def body(c, _):
        a = bh3_accelerations(c, m, cfg)
        return c + 0.0 * a, None

    out, _ = lax.scan(body, p, None, length=reps)
    return jnp.sum(out)


f = jax.jit(chained)
t0 = time.perf_counter()
np.asarray(f(pos, mass))
print(json.dumps({"compile_s": round(time.perf_counter() - t0, 1)}),
      flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(f(pos, mass))
    best = min(best, time.perf_counter() - t0)
print(json.dumps({"metric": "3D clustered deep+tiles eval at N=%d" % n,
                  "seconds_per_eval": best / reps,
                  "meets_1s_bar": best / reps <= 1.0}), flush=True)
