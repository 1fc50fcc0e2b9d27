"""Phase profile of the 2D stencil FMM at large N on the real TPU.
Scalar-checksum sync (4-byte host transfer). Run: python scripts/profile2d.py [n]
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
from nbodysim_tpu.physics import barneshut as bh
from nbodysim_tpu.physics.barneshut import (
    NEAR_CAP, _bh_accelerations, _build_pyramid, _extract_heavy_outliers,
    _l2l_upsample, _m2l_level, _near_field_buckets, _resolve_levels,
    _resolve_radius)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
cfg = SimConfig(n=n, seed=7)
k1, k2 = jax.random.split(jax.random.PRNGKey(7))
pos = jax.random.uniform(k1, (n, 2), jnp.float32, -30000.0, 30000.0)
mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)
levels = _resolve_levels(cfg, n)
radius = _resolve_radius(cfg)
eps_sq = float(cfg.eps_sq)
print(f"n={n} levels={levels} radius={radius}", flush=True)


def chk(out):
    return sum(jnp.sum(a.astype(jnp.float32))
               for a in jax.tree.leaves(out) if a.dtype != bool)


def timeit(name, fn, *args, reps=3):
    f = jax.jit(lambda *a: chk(fn(*a)))
    np.asarray(f(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"phase": name, "ms": round(best * 1e3, 1)}), flush=True)


timeit("extract", _extract_heavy_outliers, pos, mass)
ext = jax.jit(_extract_heavy_outliers)(pos, mass)
tree_mass, bulk_pos = ext["tree_mass"], ext["bulk_pos"]

timeit("build_pyramid", lambda p, m: _build_pyramid(p, m, levels),
       bulk_pos, tree_mass)
grids, corner, size, ci, flat = jax.jit(
    lambda p, m: _build_pyramid(p, m, levels))(bulk_pos, tree_mass)


def far_field(grids, corner, size):
    local = None
    for l in range(2, levels + 1):
        terms = _m2l_level(grids[l], corner, size, eps_sq, radius)
        if local is None:
            local = terms
        else:
            up = _l2l_upsample(local, size / (1 << l))
            local = tuple(u + t for u, t in zip(up, terms))
    return local


timeit("m2l_finest", lambda g, c, s: _m2l_level(g, c, s, eps_sq, radius),
       grids[levels], corner, size)
timeit("far_field_total(m2l+l2l)", far_field, grids, corner, size)

res = 1 << levels
is_out = ext["is_out"]
flat_nf = jnp.where(is_out, res * res + jnp.arange(n), flat)
timeit("near_sort", lambda f: jnp.argsort(f), flat_nf)
timeit("near_field_pallas", lambda p, m, c, f: _near_field_buckets(
    p, m, c, f, levels, eps_sq, float(cfg.g_const), NEAR_CAP, radius,
    use_pallas=True), pos, tree_mass, ci, flat_nf)
timeit("near_field_xla", lambda p, m, c, f: _near_field_buckets(
    p, m, c, f, levels, eps_sq, float(cfg.g_const), NEAR_CAP, radius,
    use_pallas=False), pos, tree_mass, ci, flat_nf)

timeit("FULL_eval_pallas", lambda p, m: _bh_accelerations(
    p, m, levels=levels, eps_sq=eps_sq, g_const=float(cfg.g_const),
    near_cap=NEAR_CAP, radius=radius, nf_pallas=True), pos, mass)
