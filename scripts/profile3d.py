"""Phase profile of the 3D octree FMM at large N on the real TPU.

Each timed closure reduces its outputs to ONE scalar inside jit so the
host sync transfers 4 bytes (block_until_ready and bulk np.asarray are
unreliable/slow over the axon tunnel). Run: python scripts/profile3d.py [n]
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
from nbodysim_tpu.scenes import init_scene

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
cfg = SimConfig(n=n, dim=3, seed=7)
state = init_scene("plummer", cfg)
pos, mass = state.pos, state.mass
levels = b3._resolve_levels3(cfg, n)
radius = b3._resolve_radius3(cfg)
eps_sq = float(cfg.eps_sq)
print(f"n={n} levels={levels} radius={radius}", flush=True)


def chk(out):
    return sum(jnp.sum(a.astype(jnp.float32))
               for a in jax.tree.leaves(out) if a.dtype != bool)


def timeit(name, fn, *args, reps=3):
    f = jax.jit(lambda *a: chk(fn(*a)))
    np.asarray(f(*args))      # compile + sync
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"phase": name, "ms": round(best * 1e3, 1)}), flush=True)


timeit("extract_heavy_outliers", b3._extract_heavy_outliers, pos, mass)

ext = jax.jit(b3._extract_heavy_outliers)(pos, mass)
tree_mass, bulk_pos = ext["tree_mass"], ext["bulk_pos"]

timeit("build_pyramid", lambda p, m: b3._build_pyramid3(p, m, levels),
       bulk_pos, tree_mass)

grids, corner, size, ci, flat = jax.jit(
    lambda p, m: b3._build_pyramid3(p, m, levels))(bulk_pos, tree_mass)

for l in range(2, levels + 1):
    timeit(f"m2l_L{l}",
           lambda g, c, s: b3._m2l_level3(g, c, s, eps_sq, radius),
           grids[l], corner, size)


def far_field(pos, grids, corner, size, ci):
    local = None
    for l in range(2, levels + 1):
        terms = b3._m2l_level3(grids[l], corner, size, eps_sq, radius)
        if local is None:
            local = terms
        else:
            s_child = size / (1 << l)
            local = tuple(u + t for u, t in
                          zip(b3._l2l_upsample3(local, s_child), terms))
    res = 1 << levels
    s_l = size / res
    cellx, celly, cellz = ci[:, 0], ci[:, 1], ci[:, 2]
    centx = corner[0] + (cellx.astype(pos.dtype) + 0.5) * s_l
    centy = corner[1] + (celly.astype(pos.dtype) + 0.5) * s_l
    centz = corner[2] + (cellz.astype(pos.dtype) + 0.5) * s_l
    loc19 = jnp.stack(local, axis=0).reshape(19, res * res * res)
    g = loc19[:, (cellx * res + celly) * res + cellz]
    ev = b3._taylor_eval3(tuple(g[i] for i in range(19)),
                          pos[:, 0] - centx, pos[:, 1] - centy,
                          pos[:, 2] - centz)
    return jnp.stack(ev[:3], axis=-1)


timeit("far_field_total", far_field, pos, grids, corner, size, ci)

res = 1 << levels
is_out = ext["is_out"]
flat_nf = jnp.where(is_out, res**3 + jnp.arange(n), flat)

timeit("near_sort", lambda f: jnp.argsort(f), flat_nf)
timeit("near_field_total", lambda p, m, c, f: b3._near_field_buckets3(
    p, m, c, f, levels, eps_sq, float(cfg.g_const), b3.NEAR_CAP, radius),
    pos, tree_mass, ci, flat_nf)

timeit("FULL_eval", lambda p, m: b3._bh3_accelerations(
    p, m, levels=levels, eps_sq=eps_sq, g_const=float(cfg.g_const),
    near_cap=b3.NEAR_CAP, radius=radius), pos, mass)
