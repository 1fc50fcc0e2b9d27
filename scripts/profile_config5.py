"""Stage-by-stage breakdown of the config-5 deep-chain eval (VERDICT r2 #3).

Times each stage of physics/barneshut._bh_accelerations at BASELINE
config-5 shapes (N=4M galaxy merger, auto L=10, deep=12) as its own
chained-scan dispatch on the real TPU, so the 5.4 s/step can be attributed
(aggregates gather vs L2L upsample vs transition M2L vs sort, per
STATUS.md round-2 next #1). Prints one JSON line per stage.

Usage: python scripts/profile_config5.py [--n N] [--reps R]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Make the repo importable regardless of cwd WITHOUT PYTHONPATH (setting
# PYTHONPATH breaks the axon TPU plugin registration — measured r3).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def time_stage(name, fn, inputs, reps=2, laps=3):
    """Best-of-laps seconds per eval of fn(*inputs), chained under one
    scan dispatch (tunnel-safe: scalar checksum pull forces completion)."""

    def chained(inputs):
        def body(c, _):
            # Data-depend every float input on the carry so XLA cannot
            # hoist the stage out of the scan; 1e-20*c underflows to a
            # +0.0 perturbation in f32, leaving the math unchanged.
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
    print(json.dumps({"stage": name, "seconds": sec}), flush=True)
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 22)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-whole", action="store_true",
                    help="skip the WHOLE-eval stages (the full fused "
                         "graph compile killed the tunnel relay in r3 — "
                         "get whole-step numbers from bench.py instead)")
    args = ap.parse_args()

    from nbodysim_tpu.config import SimConfig
    from nbodysim_tpu.physics import barneshut as bh
    from nbodysim_tpu.scenes import init_scene

    config = SimConfig(n=args.n, force_backend="bh", bh_deep_levels=-1,
                       enable_collisions=False, dt=0.05)
    state = init_scene("galaxy_merger", config)
    pos = jax.device_put(state.pos)
    mass = jax.device_put(state.mass)
    n = args.n
    levels = bh._resolve_levels(config, n)
    deep = bh._resolve_deep_levels(config, levels)
    radius = bh._resolve_radius(config)
    eps_sq = float(config.eps_sq)
    res = 1 << levels
    print(json.dumps({"stage": "config", "n": n, "levels": levels,
                      "deep": deep, "radius": radius}), flush=True)

    # ---- prep: extraction + bounding + cells -------------------------
    def prep(pos, mass):
        ext = bh._extract_heavy_outliers(pos, mass)
        corner, size = bh._bounding_square(ext["bulk_pos"])
        return ext["tree_mass"], ext["bulk_pos"], corner, size

    time_stage("extract+bounds", prep, (pos, mass), reps=args.reps)

    tree_mass, bulk_pos, corner, size = jax.jit(prep)(pos, mass)
    tree_mass, bulk_pos = map(jax.device_put, (tree_mass, bulk_pos))

    # ---- pyramid build (scatter + pool to level 2) -------------------
    # synth_quad matches the real deep path (3-channel scatter +
    # point-at-COM quadrupole synthesis, r3).
    def build(bulk_pos, tree_mass):
        grids, corner, size, ci_f, flat_f = bh._build_pyramid(
            bulk_pos, tree_mass, deep, synth_quad=True)
        return grids[deep]

    time_stage("pyramid build (scatter+pools)", build,
               (bulk_pos, tree_mass), reps=args.reps)

    grids, corner_, size_, ci_f, flat_f = jax.jit(
        lambda p, m: bh._build_pyramid(p, m, deep, synth_quad=True)
    )(bulk_pos, tree_mass)
    ci = ci_f >> (deep - levels)
    flat = ci[:, 0] * res + ci[:, 1]
    ci, flat = jax.device_put(ci), jax.device_put(flat)

    # ---- M2L per level group ----------------------------------------
    def m2l_at(lvl):
        g = tuple(jax.device_put(x) for x in grids[lvl])

        def f(*g6):
            return bh._m2l_level(g6, corner_, size_, eps_sq, radius)

        return time_stage(f"M2L level {lvl} ({1 << lvl}^2)", f, g,
                          reps=args.reps)

    m2l_bucket = 0.0
    for lvl in range(2, levels + 1):
        if lvl >= levels - 1:
            m2l_bucket += m2l_at(lvl)
        # coarse levels are negligible; time the two finest bucket levels
    for lvl in range(levels + 1, deep + 1):
        m2l_at(lvl)

    # ---- L2L upsample at the two deep levels -------------------------
    nine = tuple(jax.device_put(jnp.zeros(((1 << (deep - 1)),) * 2,
                                          jnp.float32)) for _ in range(9))

    def l2l(*loc):
        return bh._l2l_upsample(loc, size_ / (1 << deep))

    time_stage(f"L2L upsample {1 << (deep - 1)}->{1 << deep}", l2l, nine,
               reps=args.reps)

    # ---- near-field buckets (sort+scatter+stencil+gather) ------------
    def near(pos_, mass_):
        acc, overflow = bh._near_field_buckets(
            pos_, mass_, ci, flat, levels, eps_sq, 1.0, bh.NEAR_CAP,
            radius, use_pallas=True, skip_residual=True)
        return acc

    time_stage("near-field buckets (incl. sort)", near,
               (bulk_pos, tree_mass), reps=args.reps)

    def just_sort(f32flat):
        return jnp.argsort(f32flat)

    time_stage("global argsort", just_sort,
               (jax.device_put(flat.astype(jnp.float32)),), reps=args.reps)

    # ---- deep aggregates ---------------------------------------------
    # Matches the real path (r3): inner 3x3 monopole window only — the
    # cheb>=2 ring folds into the local expansion (_fold_aggregate_ring).
    payload = jax.jit(bh._moment_payload)(bulk_pos, tree_mass)
    rin = min(radius - 1, 1)
    g3d = jax.jit(lambda g: jnp.pad(jnp.stack(g[:3], axis=-1),
                                    ((rin, rin), (rin, rin), (0, 0))))(
        grids[deep])
    pay3 = payload[:, :3]

    def agg(pos_, payload_, g3_):
        if rin == 1:    # shipped dispatch: y-packed rows (r5)
            return bh._deep_near_aggregates_packed(
                pos_, payload_, g3_, ci_f, eps_sq, size_ / (1 << deep))
        return bh._deep_near_aggregates(pos_, payload_, g3_, ci_f, eps_sq,
                                        size_ / (1 << deep), rr=rin)

    time_stage("deep aggregates (3x3 monopole gathers)", agg,
               (bulk_pos, pay3, g3d), reps=args.reps)

    # ---- outlier couplings (r5: untimed whole-vs-sum gap) ---------------
    from nbodysim_tpu.kernels.allpairs import allpairs_accelerations

    ext_full = jax.jit(bh._extract_heavy_outliers)(pos, mass)
    out_i = jax.device_put(ext_full["out_i"])
    o_mass = jax.device_put(jnp.where(ext_full["is_heavy"], 0.0, mass))

    def outcouple(pos_, om_):
        a1 = allpairs_accelerations(pos_[out_i], None, eps_sq=eps_sq,
                                    src_pos=pos_, src_mass=om_)
        a2 = allpairs_accelerations(pos_, None, eps_sq=eps_sq,
                                    src_pos=pos_[out_i],
                                    src_mass=om_[out_i])
        return a1, a2

    time_stage("outlier couplings (2x rect Pallas)", outcouple,
               (pos, o_mass), reps=args.reps)

    # ---- L2P gathers --------------------------------------------------
    loc_b = tuple(jax.device_put(jnp.zeros((res, res), jnp.float32))
                  for _ in range(9))

    def l2p(*loc):
        return bh._l2p_eval(loc, ci, bulk_pos, corner_, size_, levels)

    time_stage("L2P bucket gather", l2p, loc_b, reps=args.reps)

    # (the standalone deep-level L2P graph hung the AOT compile helper in
    # r3 profiling — its cost is the whole-minus-parts remainder instead)

    # ---- ring-fold stencil at the deep level ---------------------------
    radius_ = radius

    def fold(*g6):
        wring = tuple(jnp.pad(g, radius_ - 1) for g in g6)
        loc = tuple(jnp.zeros(((1 << deep),) * 2, jnp.float32)
                    for _ in range(9))
        return bh._fold_aggregate_ring(
            loc, wring, corner_, size_, 1 << deep, eps_sq, radius_,
            row0=jnp.int32(0), rows=1 << deep)

    time_stage(f"fold ring stencil ({1 << deep}^2)", fold,
               tuple(jax.device_put(x) for x in grids[deep]),
               reps=args.reps)

    # ---- tile stage breakdown ------------------------------------------
    tk, tt, tc = bh._resolve_tile_params(config, deep, radius)
    if tk:
        b_par = jnp.ones((n,), bool)    # worst-case: everyone deep-path
        tid, tile_slot, orig = jax.jit(
            lambda c, b: bh._tile_select(c, b, deep, tt, tc, radius)
        )(ci_f, b_par)
        payload2 = jax.jit(bh._moment_payload)(bulk_pos, tree_mass)

        def tile_all(pos_, payload_):
            loc = tuple(
                jnp.zeros(((1 << deep),) * 2, jnp.float32)
                for _ in range(9))
            return bh._tile_refine(pos_, payload_, pos_, ci_f, b_par,
                                   loc, corner_, size_, deep, radius_,
                                   eps_sq, k=tk, t=tt, T=tc)

        time_stage("tile stage TOTAL (select+scatter+chain+eval)",
                   tile_all, (bulk_pos, payload2), reps=args.reps)

        H = radius
        W = tt + 2 * H
        f_sub = 1 << tk
        Wf = W * f_sub

        def tile_scatter(payload_):
            """The real compact home-cell scatter (r3): 3 channels into
            the home candidate for all N + compact boundary subset for
            the 3 halo candidates (see _tile_eval)."""
            rD = 1 << deep
            nt = rD // tt
            u2 = (bulk_pos - corner_) / size_
            ci_sub = jnp.clip((u2 * (rD * f_sub)).astype(jnp.int32), 0,
                              rD * f_sub - 1)
            tx = ci_f[:, 0] // tt
            ty = ci_f[:, 1] // tt
            mx = ci_f[:, 0] % tt
            my2 = ci_f[:, 1] % tt
            sx = jnp.where(mx < H, -1, jnp.where(mx >= tt - H, 1, 0))
            sy = jnp.where(my2 < H, -1, jnp.where(my2 >= tt - H, 1, 0))
            pay3 = payload_[:, :3]

            def cand(cx, cy, tx_, ty_, sx_, sy_, sub_):
                ctx = tx_ + (sx_ if cx else 0)
                cty = ty_ + (sy_ if cy else 0)
                ok = (ctx >= 0) & (ctx < nt) & (cty >= 0) & (cty < nt)
                if cx:
                    ok = ok & (sx_ != 0)
                if cy:
                    ok = ok & (sy_ != 0)
                slot = tile_slot[jnp.where(ok, ctx * nt + cty, nt * nt)]
                ok = ok & (slot < tc)
                rel = sub_ - orig[jnp.minimum(slot, tc - 1)] * f_sub
                return jnp.where(
                    ok, (slot * Wf + rel[:, 0]) * Wf + rel[:, 1],
                    tc * Wf * Wf)

            g3t = (jnp.zeros((tc * Wf * Wf, 3), jnp.float32)
                   .at[cand(0, 0, tx, ty, sx, sy, ci_sub)]
                   .add(pay3, mode="drop"))
            b_cap = min(n, max(n // 4, 65536))
            on_edge = (sx != 0) | (sy != 0)
            bidx = jnp.argsort(~on_edge)[:b_cap]
            b_ok = on_edge[bidx]
            pay_b = jnp.where(b_ok[:, None], pay3[bidx], 0.0)
            for cx, cy in ((1, 0), (0, 1), (1, 1)):
                g3t = g3t.at[cand(cx, cy, tx[bidx], ty[bidx], sx[bidx],
                                  sy[bidx], ci_sub[bidx])].add(
                    pay_b, mode="drop")
            return g3t

        time_stage("tile compact moment scatter", tile_scatter,
                   (payload2,), reps=args.reps)

    # ---- whole eval for reference -------------------------------------
    if args.skip_whole:
        return

    def whole(pos_, mass_):
        return bh.bh_accelerations(pos_, mass_, config)

    time_stage("WHOLE bh eval (deep+tiles on)", whole, (pos, mass),
               reps=args.reps)

    cfg_nt = config.replace(bh_tile_levels=0)

    def whole_nt(pos_, mass_):
        return bh.bh_accelerations(pos_, mass_, cfg_nt)

    time_stage("WHOLE bh eval (tiles off)", whole_nt, (pos, mass),
               reps=args.reps)


if __name__ == "__main__":
    main()
