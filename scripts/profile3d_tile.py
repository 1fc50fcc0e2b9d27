"""Sub-attribute the 3D tile stage (r5).

profile3d_deep.py (r5, post perm-build M2L fix) puts the clustered-1M
deep+tiles eval's largest remaining stage at the tile stage (0.86 s of a
~1.9 s stage sum). This times its three parts — scatter, chain, apply —
as separate chained-scan dispatches at the real shapes so the next shave
targets the right one.

Usage: scripts/tpu_retry.sh /tmp/p3t.log python scripts/profile3d_tile.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def time_stage(name, fn, inputs, reps=2, laps=3):
    def chained(inputs):
        def body(c, _):
            scaled = jax.tree.map(
                lambda x: x * (1.0 + 1e-20 * c)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, inputs)
            out = fn(*scaled)
            chk = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out)
                      if jnp.issubdtype(leaf.dtype, jnp.floating))
            return c + 1e-20 * chk, None

        out, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return out

    f = jax.jit(chained)
    np.asarray(f(inputs))  # compile + warm
    best = float("inf")
    for _ in range(laps):
        t0 = time.perf_counter()
        np.asarray(f(inputs))
        best = min(best, time.perf_counter() - t0)
    sec = best / reps
    print(json.dumps({"stage": name, "seconds": round(sec, 4)}), flush=True)
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--blob", action="store_true",
                    help="use the bench3d_clustered.py blob scene (the "
                         "<=1 s bar scene) instead of galaxy_merger")
    args = ap.parse_args()

    from nbodysim_tpu.config import SimConfig
    from nbodysim_tpu.physics import barneshut3d as b3
    from nbodysim_tpu.scenes import init_scene

    config = SimConfig(n=args.n, dim=3, force_backend="bh",
                       bh_deep_levels=-1, bh_tile_levels=-1,
                       enable_collisions=False, dt=0.05)
    state = init_scene("galaxy_merger", config)
    if args.blob:
        # The bench3d_clustered.py bar scene: half the particles in a dense
        # Gaussian blob, half uniform background (same key/params).
        k = jax.random.split(jax.random.PRNGKey(11), 3)
        n_ = args.n
        blob_p = 40.0 * jax.random.normal(k[0], (n_ // 2, 3)) + jnp.array(
            [500.0, -200.0, 100.0])
        bg = jax.random.uniform(k[1], (n_ - n_ // 2, 3), jnp.float32,
                                -30000.0, 30000.0)
        state = state.replace(
            pos=jnp.concatenate([blob_p, bg]).astype(jnp.float32),
            mass=jax.random.uniform(k[2], (n_,), jnp.float32, 0.1, 10.0))

    pos = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    n = args.n
    levels = b3._resolve_levels3(config, n)
    deep = b3._resolve_deep_levels3(config, levels)
    radius = b3._resolve_radius3(config)
    eps_sq = float(config.eps_sq)
    res = 1 << levels
    tk, tt, tc = b3._resolve_tile_params3(config, deep, radius)
    print(json.dumps({"stage": "config", "n": n, "levels": levels,
                      "deep": deep, "radius": radius,
                      "tiles": [tk, tt, tc]}), flush=True)

    ext = jax.jit(b3._extract_heavy_outliers)(pos, mass)
    bulk_pos, tree_mass, is_out = (ext["bulk_pos"], ext["tree_mass"],
                                   ext["is_out"])
    corner, size = jax.jit(b3._bounding_cube)(bulk_pos)
    grids, corner_, size_, ci_f, flat_f = jax.jit(
        lambda p, m: b3._build_pyramid3(p, m, deep, synth_quad=True)
    )(bulk_pos, tree_mass)
    ci = ci_f >> (deep - levels)
    flat = (ci[:, 0] * res + ci[:, 1]) * res + ci[:, 2]
    flat_nf = jnp.where(is_out, res**3 + jnp.arange(n), flat)

    def hotmask(flat_nf_):
        occ = jnp.zeros((res**3,), jnp.int32).at[flat_nf_].add(
            1, mode="drop")
        hot = (occ > b3.NEAR_CAP).reshape(res, res, res)
        rr = radius - 1
        hotp = jnp.pad(hot, rr)
        bmask = jnp.zeros((res, res, res), bool)
        for ox in range(2 * rr + 1):
            for oy in range(2 * rr + 1):
                for oz in range(2 * rr + 1):
                    bmask = bmask | hotp[ox:ox + res, oy:oy + res,
                                         oz:oz + res]
        return bmask.reshape(-1)[flat]

    b_par = jax.jit(hotmask)(flat_nf) & ~is_out
    payload = jax.jit(b3._moment_payload3)(bulk_pos, tree_mass)
    ci_f, payload, b_par = map(jax.device_put, (ci_f, payload, b_par))

    tid, tile_slot, orig = jax.jit(
        lambda c, b: b3._tile_select3(c, b, deep, tt, tc, radius)
    )(ci_f, b_par)
    tile_slot, orig = map(jax.device_put, (tile_slot, orig))

    time_stage("tile select (top-k)",
               lambda c, b: b3._tile_select3(c, b, deep, tt, tc, radius),
               (ci_f, b_par), reps=args.reps)

    def scatter(payload_, bulk_pos_):
        return b3._tile_scatter3(payload_, bulk_pos_, ci_f, tile_slot,
                                 orig, corner_, size_, deep, radius,
                                 tk, tt, tc)

    time_stage("tile scatter", scatter, (payload, bulk_pos),
               reps=args.reps)

    g4k = jax.jit(scatter)(payload, bulk_pos)
    g4k = jax.device_put(g4k)
    H = radius
    W = tt + 2 * H
    Wf = W * (1 << tk)
    local_w0 = jnp.zeros((tc, W, W, W, 19), jnp.float32)

    def chain(local_w_, g4k_):
        return b3._tile_chain3(local_w_, g4k_, orig, corner_, size_,
                               deep, radius, eps_sq, tk, tt, tc)

    time_stage("tile chain (sub-level M2L)", chain, (local_w0, g4k),
               reps=args.reps)

    local_w = jnp.zeros((tc, Wf, Wf, Wf, 19), jnp.float32)

    def apply_(pos_, payload_, local_w_, g4k_):
        return b3._tile_apply3(pos_, payload_, bulk_pos, ci_f, b_par,
                               local_w_, g4k_, tile_slot, orig, corner_,
                               size_, deep, radius, eps_sq, tk, tt, tc)

    time_stage("tile apply (gather+taylor+window)", apply_,
               (pos, payload, local_w, g4k), reps=args.reps)

    # ---- shipped compacted paths (r5) ----------------------------------
    from nbodysim_tpu.physics.barneshut import _compact_indices

    cand = (tile_slot[tid] < tc) & b_par
    n_cand = int(jnp.sum(cand))
    cap = b3._refined_cap3(n)
    src = jax.jit(lambda c: b3._tile_src_mask3(c, tile_slot, deep,
                                               radius, tt, tc))(ci_f)
    n_src = int(jnp.sum(src))
    s_cap = b3._scatter_cap3(n)
    print(json.dumps({"stage": "compaction occupancy",
                      "refined_cand": n_cand, "refined_cap": cap,
                      "scatter_src": n_src, "scatter_cap": s_cap}),
          flush=True)

    sidx, _ = jax.jit(lambda c: _compact_indices(c, cap))(cand)
    si = jnp.minimum(jax.device_put(sidx), n - 1)

    def apply_compact(pos_, payload_, local_w_, g4k_):
        valid = sidx < n
        return b3._tile_apply3(pos_[si], payload_[si], bulk_pos[si],
                               ci_f[si], b_par[si] & valid, local_w_,
                               g4k_, tile_slot, orig, corner_, size_,
                               deep, radius, eps_sq, tk, tt, tc)

    time_stage("tile apply COMPACT (cap rows)", apply_compact,
               (pos, payload, local_w, g4k), reps=args.reps)

    lw_deep = jnp.zeros(((1 << deep),) * 3, jnp.float32)
    local_deep = tuple(lw_deep for _ in range(19))
    time_stage("tile eval3 SHIPPED (compact scatter+chain+apply)",
               lambda p, pay: b3._tile_refine3(
                   p, pay, bulk_pos, ci_f, b_par, local_deep, corner_,
                   size_, deep, radius, eps_sq, k=tk, t=tt, T=tc),
               (pos, payload), reps=args.reps)


if __name__ == "__main__":
    main()
