"""Experiment: M2L deep-level contraction layouts at 4096^2 (config-5
stage 'M2L level 12', 0.27 s/eval — the top remaining M2L term).

Hypothesis: the 25-tap scan-of-dot_generals re-reads the full [X, 4096+2qh,
24] parent-level window from HBM per tap (~400 MB x 25 = 10 GB/eval), so
the stage is bandwidth-bound, not FLOP-bound. Candidates:

  A. current: lax.scan over taps, dot_general HIGHEST        (baseline)
  B. one lax.conv_general_dilated NHWC, k x k kernel, HIGHEST (read once)
  C. conv as B but precision HIGH (bf16x3 ~ f32 accuracy)
  D. scan-of-dots as A but precision HIGH
  E. conv as B but precision DEFAULT (bf16 inputs)

Each variant is timed as a chained-scan dispatch (tunnel-safe) and checked
against A for max relative error on the 9 local terms.

Usage: python scripts/exp_m2l_conv.py [--r 4096] [--reps 2]
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


def time_fn(name, f, inputs, reps, laps=3):
    def chained(inputs):
        def body(c, _):
            scaled = jax.tree.map(
                lambda x: x * (1.0 + 1e-20 * c)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, inputs)
            out = f(*scaled)
            chk = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out))
            return c + 1e-20 * chk, None

        out, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return out

    g = jax.jit(chained)
    np.asarray(g(inputs))
    best = float("inf")
    for _ in range(laps):
        t0 = time.perf_counter()
        np.asarray(g(inputs))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"variant": name, "seconds": best / reps}), flush=True)
    return best / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from nbodysim_tpu.physics import barneshut as bh

    r_full = args.r
    radius = 3
    qh = radius - 1
    k = 2 * radius - 1
    eps_sq = 1.0
    size = jnp.float32(60000.0)
    corner = jnp.array([-30000.0, -30000.0], jnp.float32)
    s_l = size / r_full

    key = jax.random.PRNGKey(0)
    # Random plausible raw moments: mass-like channel positive, others
    # scaled like mass * cell-size offsets.
    km, kx = jax.random.split(key)
    m = jax.random.uniform(km, (r_full, r_full), jnp.float32, 0.0, 4.0)
    # raw first moments about the origin ~ m * position
    iy = lax.broadcasted_iota(jnp.float32, (r_full, r_full), 1)
    ix = lax.broadcasted_iota(jnp.float32, (r_full, r_full), 0)
    px = corner[0] + (ix + 0.5) * s_l
    py = corner[1] + (iy + 0.5) * s_l
    jit_off = jax.random.uniform(kx, (r_full, r_full, 2), jnp.float32,
                                 -0.4, 0.4) * s_l
    sx = m * (px + jit_off[..., 0])
    sy = m * (py + jit_off[..., 1])
    rxx = sx * sx / jnp.maximum(m, 1e-9)
    rxy = sx * sy / jnp.maximum(m, 1e-9)
    ryy = sy * sy / jnp.maximum(m, 1e-9)
    g6 = jnp.stack((m, sx, sy, rxx, rxy, ryy), axis=-1)
    gx = jnp.pad(g6, ((2 * qh, 2 * qh), (0, 0), (0, 0)))
    gx = jax.device_put(gx)

    # ---- A: current implementation ------------------------------------
    def variant_a(gx_):
        return bh._m2l_conv(gx_, corner, size, r_full, eps_sq, radius,
                            row0=jnp.int32(0), rows=r_full)

    # ---- shared pieces for conv variants -------------------------------
    def make_conv_variant(precision):
        def f(gx_):
            R = radius
            Rp = radius
            qh_ = Rp - 1
            h = r_full // 2
            hb = r_full // 2
            dtype = gx_.dtype
            ch = bh._center_channels(gx_, corner, size, r_full,
                                     jnp.int32(0) - 2 * qh_)
            X = r_full + 4 * qh_
            m4 = (ch.reshape(X // 2, 2, h, 2, 6)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(X // 2, h, 24))
            m4 = jnp.pad(m4, ((0, 0), (qh_, qh_), (0, 0)))
            W = bh._m2l_conv_weights(R, Rp, eps_sq / (s_l * s_l), dtype)
            kk = 2 * Rp - 1
            # conv kernel HWIO: [kk, kk, 24, 36]
            Wk = W.reshape(kk, kk, 24, 36)
            out = lax.conv_general_dilated(
                m4[None], Wk, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision)[0]          # [hb, h, 36]
            out = out.reshape(hb * h, 36)
            inv_s = 1.0 / s_l
            s2 = inv_s * inv_s
            scales = (s2, s2, s2 * inv_s, s2 * inv_s, s2 * inv_s,
                      s2 * s2, s2 * s2, s2 * s2, s2 * s2)
            terms = []
            for t in range(9):
                a = [[out[:, (2 * c + d) * 9 + t].reshape(hb, h)
                      for d in (0, 1)] for c in (0, 1)]
                r0 = jnp.stack([a[0][0], a[0][1]], axis=-1).reshape(hb, r_full)
                r1 = jnp.stack([a[1][0], a[1][1]], axis=-1).reshape(hb, r_full)
                terms.append(jnp.stack([r0, r1], axis=1)
                             .reshape(r_full, r_full) * scales[t])
            return tuple(terms)

        return f

    def make_scan_variant(precision):
        def f(gx_):
            R = radius
            Rp = radius
            qh_ = Rp - 1
            h = r_full // 2
            hb = r_full // 2
            dtype = gx_.dtype
            ch = bh._center_channels(gx_, corner, size, r_full,
                                     jnp.int32(0) - 2 * qh_)
            X = r_full + 4 * qh_
            m4 = (ch.reshape(X // 2, 2, h, 2, 6)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(X // 2, h, 24))
            m4 = jnp.pad(m4, ((0, 0), (qh_, qh_), (0, 0)))
            W = bh._m2l_conv_weights(R, Rp, eps_sq / (s_l * s_l), dtype)
            kk = 2 * Rp - 1
            po = jnp.asarray([(a, b) for a in range(kk) for b in range(kk)],
                             jnp.int32)

            def body(acc, args):
                o, wk = args
                sl = lax.dynamic_slice(m4, (o[0], o[1], 0), (hb, h, 24))
                return acc + lax.dot_general(
                    sl.reshape(-1, 24), wk, (((1,), (0,)), ((), ())),
                    precision=precision), None

            out0 = jnp.zeros((hb * h, 36), dtype) + 0.0 * m4[0, 0, 0]
            out, _ = lax.scan(body, out0, (po, W))
            inv_s = 1.0 / s_l
            s2 = inv_s * inv_s
            scales = (s2, s2, s2 * inv_s, s2 * inv_s, s2 * inv_s,
                      s2 * s2, s2 * s2, s2 * s2, s2 * s2)
            terms = []
            for t in range(9):
                a = [[out[:, (2 * c + d) * 9 + t].reshape(hb, h)
                      for d in (0, 1)] for c in (0, 1)]
                r0 = jnp.stack([a[0][0], a[0][1]], axis=-1).reshape(hb, r_full)
                r1 = jnp.stack([a[1][0], a[1][1]], axis=-1).reshape(hb, r_full)
                terms.append(jnp.stack([r0, r1], axis=1)
                             .reshape(r_full, r_full) * scales[t])
            return tuple(terms)

        return f

    ref = jax.jit(variant_a)(gx)
    ref = tuple(np.asarray(t) for t in ref)

    def check(name, f):
        out = jax.jit(f)(gx)
        errs = []
        for t, (a, b) in enumerate(zip(ref, out)):
            b = np.asarray(b)
            den = np.abs(a).max() + 1e-30
            errs.append(float(np.abs(a - b).max() / den))
        print(json.dumps({"variant": name,
                          "max_rel_err_vs_A": max(errs)}), flush=True)

    variants = [
        ("A scan HIGHEST (current)", variant_a),
        ("B conv HIGHEST", make_conv_variant(lax.Precision.HIGHEST)),
        ("C conv HIGH", make_conv_variant(lax.Precision.HIGH)),
        ("D scan HIGH", make_scan_variant(lax.Precision.HIGH)),
        ("E conv DEFAULT (bf16x1)", make_conv_variant(lax.Precision.DEFAULT)),
    ]
    for name, f in variants[1:]:
        check(name, f)
    for name, f in variants:
        time_fn(name, f, (gx,), reps=args.reps)


if __name__ == "__main__":
    main()
