"""Sub-phase profile of the 3D near field at N=1M: scatter, stencil,
gather, overflow residual — for a clustered (plummer) and uniform scene.
Run: python scripts/profile3d_near.py
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
from nbodysim_tpu.physics import barneshut3d as b3
from nbodysim_tpu.scenes import init_scene
from nbodysim_tpu.core.blocking import sorted_first_occurrence

n = 1_048_576
cap = b3.NEAR_CAP


def timeit(name, fn, *args, reps=3):
    f = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                               for x in jax.tree.leaves(fn(*a))))
    np.asarray(f(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"phase": name, "ms": round(best * 1e3, 1)}), flush=True)


for scene in ("plummer", "uniform_cube"):
    cfg = SimConfig(n=n, dim=3, seed=7)
    try:
        state = init_scene(scene, cfg)
    except KeyError:
        key = jax.random.PRNGKey(7)
        pos = jax.random.uniform(key, (n, 3), jnp.float32, -1000, 1000)
        mass = jnp.ones((n,), jnp.float32)
        state = None
    if state is not None:
        pos, mass = state.pos, state.mass
    levels = b3._resolve_levels3(cfg, n)
    radius = b3._resolve_radius3(cfg)
    eps_sq = float(cfg.eps_sq)
    res = 1 << levels
    rr = radius - 1

    ext = jax.jit(b3._extract_heavy_outliers)(pos, mass)
    tree_mass, bulk_pos = ext["tree_mass"], ext["bulk_pos"]
    _, corner, size, ci, flat = jax.jit(
        lambda p, m: b3._build_pyramid3(p, m, levels))(bulk_pos, tree_mass)
    flat_nf = jnp.where(ext["is_out"], res**3 + jnp.arange(n), flat)

    def prep(pos, tree_mass, ci, flat_nf):
        order = jnp.argsort(flat_nf)
        flat_s = flat_nf[order]
        first = sorted_first_occurrence(flat_s)
        slot = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
        return order, flat_s, slot

    order, flat_s, slot = jax.jit(prep)(pos, tree_mass, ci, flat_nf)
    overflow = int(jnp.sum((slot >= cap) & (flat_s < res**3)))
    print(f"scene={scene} levels={levels} overflow={overflow} "
          f"(of {n})", flush=True)

    in_cap = slot < cap
    slot_w = jnp.where(in_cap, slot, cap)
    pos_s = pos[order]
    mass_s = tree_mass[order]
    zero_m = jnp.where(in_cap, mass_s, 0.0)
    n_cells = res**3

    def scat_all(pos_s, zero_m, flat_s, slot_w):
        def scat(v):
            return (jnp.zeros((n_cells, cap), pos_s.dtype)
                    .at[flat_s, slot_w].set(v, mode="drop")
                    .reshape(res, res, res, cap))
        return (scat(pos_s[:, 0]), scat(pos_s[:, 1]), scat(pos_s[:, 2]),
                scat(zero_m))

    timeit(f"{scene}:scatter", scat_all, pos_s, zero_m, flat_s, slot_w)
    bx, by, bz, bm = jax.jit(scat_all)(pos_s, zero_m, flat_s, slot_w)

    timeit(f"{scene}:stencil",
           lambda bx, by, bz, bm: b3._bucket_stencil3(
               bx, by, bz, bm, rr, eps_sq), bx, by, bz, bm)

    # Residual alone (force the cond taken branch by calling directly)
    ci_s = ci[order]
    m_cap = min(n, b3._OVERFLOW_CAP)

    def resid(pos_s, mass_s, ci_s, in_cap):
        over = ~in_cap
        o_idx = jnp.argsort(in_cap)[:m_cap]
        o_valid = over[o_idx]
        o_pos = pos_s[o_idx]
        o_mass = jnp.where(o_valid, mass_s[o_idx], 0.0)
        o_cell = ci_s[o_idx]
        a = b3._near_masked_blocked(pos_s, ci_s, o_pos, o_mass, o_cell,
                                    eps_sq, rr)
        cap_mass = jnp.where(in_cap, mass_s, 0.0)
        b = b3._near_masked_blocked(o_pos, o_cell, pos_s, cap_mass, ci_s,
                                    eps_sq, rr)
        return a, b

    timeit(f"{scene}:residual(forced)", resid, pos_s, mass_s, ci_s, in_cap)

    timeit(f"{scene}:near_total",
           lambda p, m, c, f: b3._near_field_buckets3(
               p, m, c, f, levels, eps_sq, 1.0, cap, radius),
           pos, tree_mass, ci, flat_nf)
