"""2D FMM level sweep at N=1M with the Pallas near field: is L=10
(1 particle/cell) actually better than L=9 (4/cell)?
Run: python scripts/sweep2d_levels.py [n]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.physics.barneshut import (
    NEAR_CAP, _bh_accelerations, _resolve_radius, bh_near_overflow)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
cfg = SimConfig(n=n, seed=7)
k1, k2 = jax.random.split(jax.random.PRNGKey(7))
pos = jax.random.uniform(k1, (n, 2), jnp.float32, -30000.0, 30000.0)
mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)
radius = _resolve_radius(cfg)
eps_sq = float(cfg.eps_sq)

for levels in (10, 9, 8):
    over = bh_near_overflow(pos, mass,
                            SimConfig(n=n, bh_levels=levels, seed=7))
    f = jax.jit(lambda p, m, lv=levels: jnp.sum(_bh_accelerations(
        p, m, levels=lv, eps_sq=eps_sq, g_const=float(cfg.g_const),
        near_cap=NEAR_CAP, radius=radius, nf_pallas=True)))
    v = np.asarray(f(pos, mass))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(f(pos, mass))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"levels": levels, "ms": round(best * 1e3, 1),
                      "overflow": int(over), "checksum": float(v)}),
          flush=True)
