"""Stage-by-stage breakdown of the 3D clustered deep+tiles eval (r4).

The aot_mem3d probe measured the 3D galaxy-merger N=1M deep-chain eval at
6.27 s/eval — 6x over the <=1 s auto-dispatch bar (VERDICT r3 #3) and
worse than the 5.9 s exact fallback it replaced. This times each stage of
physics/barneshut3d._bh3_accelerations at those shapes as its own
chained-scan dispatch on the real TPU (profile_config5.py pattern), so
the regression can be attributed before optimizing.

Usage: scripts/tpu_retry.sh /tmp/p3d.log python scripts/profile3d_deep.py
       [--n N] [--reps R] [--whole]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Repo importable from any cwd WITHOUT PYTHONPATH (PYTHONPATH breaks the
# axon plugin registration — CLAUDE.md).
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
    ap.add_argument("--whole", action="store_true",
                    help="also time the WHOLE eval (biggest compile LAST, "
                         "per the CLAUDE.md relay-death hazard)")
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

    # ---- prep ----------------------------------------------------------
    def prep(pos, mass):
        ext = b3._extract_heavy_outliers(pos, mass)
        corner, size = b3._bounding_cube(ext["bulk_pos"])
        return ext["tree_mass"], ext["bulk_pos"], corner, size

    time_stage("extract+bounds", prep, (pos, mass), reps=args.reps)
    tree_mass, bulk_pos, corner, size = jax.jit(prep)(pos, mass)
    tree_mass, bulk_pos = map(jax.device_put, (tree_mass, bulk_pos))

    # ---- pyramid build ---------------------------------------------------
    def build(bulk_pos, tree_mass):
        grids, corner, size, ci_f, flat_f = b3._build_pyramid3(
            bulk_pos, tree_mass, deep, synth_quad=True)
        return grids[deep]

    time_stage("pyramid build (scatter+pools)", build,
               (bulk_pos, tree_mass), reps=args.reps)

    grids, corner_, size_, ci_f, flat_f = jax.jit(
        lambda p, m: b3._build_pyramid3(p, m, deep, synth_quad=True)
    )(bulk_pos, tree_mass)
    ci = ci_f >> (deep - levels)
    flat = (ci[:, 0] * res + ci[:, 1]) * res + ci[:, 2]
    ci, flat = jax.device_put(ci), jax.device_put(flat)

    # ---- M2L per level ---------------------------------------------------
    def m2l_at(lvl):
        g = tuple(jax.device_put(x) for x in grids[lvl])

        def f(*gt):
            return b3._m2l_level3(gt, corner_, size_, eps_sq, radius)

        return time_stage(f"M2L level {lvl} ({1 << lvl}^3)", f, g,
                          reps=args.reps)

    for lvl in range(max(2, levels - 1), deep + 1):
        m2l_at(lvl)

    # ---- L2L upsample at the deep level -----------------------------------
    nineteen = tuple(jax.device_put(jnp.zeros(((1 << (deep - 1)),) * 3,
                                              jnp.float32))
                     for _ in range(19))

    def l2l(*loc):
        return b3._l2l_upsample3(loc, size_ / (1 << deep))

    time_stage(f"L2L upsample {1 << (deep - 1)}->{1 << deep}", l2l,
               nineteen, reps=args.reps)

    # ---- near field --------------------------------------------------------
    is_out = jax.jit(lambda p, m: b3._extract_heavy_outliers(p, m)["is_out"])(
        pos, mass)
    flat_nf = jnp.where(is_out, res**3 + jnp.arange(n), flat)

    def near(pos_, mass_):
        acc, overflow = b3._near_field_buckets3(
            pos_, mass_, ci, flat_nf, levels, eps_sq, 1.0, b3.NEAR_CAP,
            radius, skip_residual=True)
        return acc

    time_stage("near-field buckets (incl. sort)", near,
               (bulk_pos, tree_mass), reps=args.reps)

    nf_sparse = (b3.bh3_bucket_tier_count(pos, mass, config)
                 <= b3._NF_SPARSE_CAP // 2)
    print(json.dumps({"stage": "nf_sparse resolved", "on": bool(nf_sparse)}),
          flush=True)

    # ---- sparse NF pass (r5: compacted targets x compacted sources) ----
    if nf_sparse:
        def hotflags(flat_nf_):
            occ = jnp.zeros((res**3,), jnp.int32).at[flat_nf_].add(
                1, mode="drop")
            return (occ > b3.NEAR_CAP)[flat]

        in_hot = jax.jit(hotflags)(jax.device_put(flat_nf))
        cand_nf = ~in_hot  # superset stand-in for ~b_par (same order)
        cap_nf = b3._nf_sparse_cap(n)
        scap_nf = b3._nf_sparse_src_cap(n)
        from nbodysim_tpu.physics.barneshut import _compact_indices

        sidx_t, n_t = jax.jit(
            lambda c: _compact_indices(c, cap_nf))(cand_nf)
        sidx_s, n_s = jax.jit(
            lambda c: _compact_indices(c, scap_nf))(cand_nf)
        print(json.dumps({"stage": "nf_sparse occupancy",
                          "targets": int(n_t), "cap": cap_nf,
                          "sources": int(n_s), "src_cap": scap_nf}),
              flush=True)
        si_t = jnp.minimum(jax.device_put(sidx_t), n - 1)
        si_s = jnp.minimum(jax.device_put(sidx_s), n - 1)
        vs = jax.device_put(sidx_s < n)

        def sparse_nf(pos_, tm_):
            return b3._near_masked_blocked(
                pos_[si_t], ci[si_t], pos_[si_s],
                jnp.where(vs, tm_[si_s], 0.0), ci[si_s], eps_sq,
                radius - 1)

        time_stage("sparse NF (compact tgts x compact srcs)", sparse_nf,
                   (bulk_pos, tree_mass), reps=args.reps)

    # ---- outlier couplings (r5: were untimed whole-vs-sum gap) ---------
    from nbodysim_tpu.kernels.allpairs import allpairs_accelerations

    ext_full = jax.jit(b3._extract_heavy_outliers)(pos, mass)
    out_i = jax.device_put(ext_full["out_i"])
    o_mass = jax.device_put(
        jnp.where(ext_full["is_heavy"], 0.0, mass))

    def outcouple(pos_, om_):
        a1 = allpairs_accelerations(pos_[out_i], None, eps_sq=eps_sq,
                                    src_pos=pos_, src_mass=om_)
        a2 = allpairs_accelerations(pos_, None, eps_sq=eps_sq,
                                    src_pos=pos_[out_i],
                                    src_mass=om_[out_i])
        return a1, a2

    time_stage("outlier couplings (2x rect Pallas)", outcouple,
               (pos, o_mass), reps=args.reps)

    time_stage("global argsort", lambda f: jnp.argsort(f),
               (jax.device_put(flat_nf.astype(jnp.float32)),),
               reps=args.reps)

    # ---- hot mask ----------------------------------------------------------
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
        return bmask.reshape(-1)[flat].astype(jnp.float32)

    time_stage("hot-cell mask", hotmask, (flat_nf,), reps=args.reps)
    b_par = jax.jit(
        lambda f: hotmask(f) > 0)(flat_nf) & ~is_out

    # ---- deep aggregates -----------------------------------------------------
    payload = jax.jit(b3._moment_payload3)(bulk_pos, tree_mass)
    rin = min(radius - 1, 1)
    g4_pad = jax.jit(lambda g: jnp.stack(
        [jnp.pad(g[i], rin) for i in range(4)], axis=-1))(grids[deep])

    def agg(pos_, payload_, g4_):
        if rin == 1:    # shipped dispatch: z-packed rows (r5)
            return b3._deep_near_aggregates3_packed(
                pos_, payload_, g4_, ci_f, eps_sq, size_ / (1 << deep))
        return b3._deep_near_aggregates3(pos_, payload_, g4_, ci_f, eps_sq,
                                         size_ / (1 << deep), rr=rin)

    time_stage("deep aggregates (3^3 monopole gathers)", agg,
               (pos, payload[:, :4], g4_pad), reps=args.reps)

    # ---- L2P gathers ----------------------------------------------------------
    loc_b = tuple(jax.device_put(jnp.zeros((res,) * 3, jnp.float32))
                  for _ in range(19))

    def l2p(*loc):
        return b3._l2p_eval3(loc, ci, pos, corner_, size_, levels)

    time_stage("L2P bucket gather", l2p, loc_b, reps=args.reps)

    loc_d = tuple(jax.device_put(jnp.zeros(((1 << deep),) * 3, jnp.float32))
                  for _ in range(19))

    def l2p_deep(*loc):
        return b3._l2p_eval3(loc, ci_f, pos, corner_, size_, deep)

    time_stage("L2P deep gather", l2p_deep, loc_d, reps=args.reps)

    # ---- tile stage -------------------------------------------------------------
    if tk:
        payload2 = payload

        def tile_all(pos_, payload_):
            loc = tuple(jnp.zeros(((1 << deep),) * 3, jnp.float32)
                        for _ in range(19))
            refined, far_ref, near_ref = b3._tile_refine3(
                pos_, payload_, pos_, ci_f, b_par, loc, corner_, size_,
                deep, radius, eps_sq, k=tk, t=tt, T=tc)
            return far_ref, near_ref

        time_stage("tile stage TOTAL", tile_all, (pos, payload2),
                   reps=args.reps)

    # ---- whole eval (riskiest compile LAST) ----------------------------------------
    if args.whole:
        def whole(pos_, mass_):
            # production flags: Pallas near field + couplings on the TPU
            return b3._bh3_accelerations(
                pos_, mass_, levels=levels, eps_sq=eps_sq,
                g_const=float(config.g_const), near_cap=b3.NEAR_CAP,
                radius=radius, nf_pallas=True, deep_levels=deep,
                tile_levels=tk, tile_size=tt, tile_count=tc,
                nf_sparse=bool(nf_sparse))

        time_stage("WHOLE eval (deep+tiles)", whole, (pos, mass),
                   reps=args.reps)


if __name__ == "__main__":
    main()
