"""3D octree full-eval timing: XLA vs Pallas near field, N=1M uniform +
accuracy spot check on TPU. Run: python scripts/bench3d_nf.py [n]
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
from nbodysim_tpu.physics import barneshut3d as b3

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
k1, k2 = jax.random.split(jax.random.PRNGKey(7))
pos = jax.random.uniform(k1, (n, 3), jnp.float32, -1000.0, 1000.0)
mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)
cfg = SimConfig(n=n, dim=3, seed=7)
levels = b3._resolve_levels3(cfg, n)
radius = b3._resolve_radius3(cfg)
print(f"n={n} levels={levels} radius={radius}", flush=True)


def run(nf_pallas):
    f = jax.jit(lambda p, m: jnp.sum(b3._bh3_accelerations(
        p, m, levels=levels, eps_sq=float(cfg.eps_sq),
        g_const=float(cfg.g_const), near_cap=b3.NEAR_CAP, radius=radius,
        nf_pallas=nf_pallas)))
    v = np.asarray(f(pos, mass))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(f(pos, mass))
        best = min(best, time.perf_counter() - t0)
    return best, float(v)


for nf in (False, True):
    try:
        ms, v = run(nf)
        print(json.dumps({"nf_pallas": nf, "ms": round(ms * 1e3, 1),
                          "checksum": v}), flush=True)
    except Exception as e:
        print(f"FAIL nf_pallas={nf}: {type(e).__name__}: {e}", flush=True)

# Accuracy: Pallas vs XLA at a testable size
n2 = 65536
pos2 = pos[:n2]
mass2 = mass[:n2]
lv2 = b3._resolve_levels3(SimConfig(n=n2, dim=3), n2)
ax = np.asarray(b3._bh3_accelerations(
    pos2, mass2, levels=lv2, eps_sq=float(cfg.eps_sq),
    g_const=float(cfg.g_const), near_cap=b3.NEAR_CAP, radius=radius,
    nf_pallas=False))
ap = np.asarray(b3._bh3_accelerations(
    pos2, mass2, levels=lv2, eps_sq=float(cfg.eps_sq),
    g_const=float(cfg.g_const), near_cap=b3.NEAR_CAP, radius=radius,
    nf_pallas=True))
rel = np.abs(ap - ax).max() / np.abs(ax).max()
print(json.dumps({"pallas_vs_xla_maxrel": float(rel)}), flush=True)
