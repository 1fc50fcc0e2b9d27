"""Kill the M2L space-to-depth build (r4 follow-up to exp_m2l_conv3).

exp_m2l_conv3 attributed the 3.5 s deep-level M2L almost entirely to the
m8 space-to-depth landing (3.40 s) — the conv itself is 29-87 ms. The
parent-level contraction does not NEED a channel-minor m8 at all: with
u = 2*po + f (fine offset = 2*parent tap + source child parity, per
axis), the entire level is ONE stride-2 kernel-6^3 conv on the raw
FINE-level per-channel grids stacked on axis 0 (free — no tile padding):

    out[p, (e,t)] = sum_{u, c} K[u, c, (e,t)] * m_c[2p + u]
    K[ux,uy,uz, c, et] = W5[ux//2, uy//2, uz//2,
                            (4(ux%2) + 2(uy%2) + (uz%2))*10 + c, et]

Variants (timing at argv[1] or 256^3; numerics at 64^3 vs the shipped
HIGHEST pipeline):

  S  shipped total: s2d + eye-dot HIGHEST + pad + conv(ship precision)
  S2 shipped, eye-dot HIGH       S3 shipped, eye-dot DEFAULT
  F1 fused stride-2 conv, NCDHW lhs, HIGH
  F2 fused stride-2 conv, NCDHW lhs, DEFAULT
  G  m8 via stack(axis=0) fed to the conv as NCDHW (no eye-dot)

Usage: scripts/tpu_retry.sh /tmp/expm8.log python scripts/exp_m8build.py [r]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nbodysim_tpu.physics import barneshut3d as b3

r_time = int(sys.argv[1]) if len(sys.argv) > 1 else 256
radius = 2
R = Rp = radius
qh = Rp - 1
k = 2 * Rp - 1
eps_sq = 16.0
size = jnp.float32(60000.0)
corner = jnp.array([-30000.0, -30000.0, -30000.0], jnp.float32)


def fine_kernel(W5):
    """[k,k,k,80,152] parent-tap weights -> [2k,2k,2k,10,152] fine-offset
    kernel (pure re-indexing; see module docstring)."""
    W5 = np.asarray(W5)
    K = np.zeros((2 * k, 2 * k, 2 * k, 10, 152), W5.dtype)
    for ux in range(2 * k):
        for uy in range(2 * k):
            for uz in range(2 * k):
                fidx = 4 * (ux % 2) + 2 * (uy % 2) + (uz % 2)
                K[ux, uy, uz] = W5[ux // 2, uy // 2, uz // 2,
                                   fidx * 10: fidx * 10 + 10]
    return jnp.asarray(K)


def make_setup(r_full):
    s_l = float(size) / r_full
    W = b3._m2l_conv_weights3(R, Rp, eps_sq / (s_l * s_l), jnp.float32)
    W5 = W.reshape(k, k, k, 80, 152)
    K6 = fine_kernel(W5)
    h = r_full // 2

    @jax.jit
    def gen(key):
        keys = jax.random.split(key, 10)
        return tuple(
            jax.random.uniform(keys[i],
                               (r_full + 4 * qh, r_full, r_full),
                               jnp.float32, 0.0, 1.0)
            for i in range(10))

    gxt = gen(jax.random.PRNGKey(0))

    def shipped(gxt, dot_prec, conv_prec):
        ch = b3._center_channels3(gxt, corner, size, r_full,
                                  jnp.int32(-2 * qh))
        flat = jnp.stack(
            [ch[c][a::2, b::2, d::2].reshape(-1)
             for a in (0, 1) for b in (0, 1) for d in (0, 1)
             for c in range(10)], axis=0)
        m8 = lax.dot_general(
            flat, jnp.eye(80, dtype=jnp.float32), (((0,), (0,)), ((), ())),
            precision=dot_prec)
        m8 = m8.reshape(h + 2 * qh, h, h, 80)
        m8 = jnp.pad(m8, ((0, 0), (qh, qh), (qh, qh), (0, 0)))
        return lax.conv_general_dilated(
            m8[None], W5, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=conv_prec)[0]

    def fused(gxt, prec):
        ch = b3._center_channels3(gxt, corner, size, r_full,
                                  jnp.int32(-2 * qh))
        fine = jnp.stack(ch, axis=0)[None]       # [1, 10, X, r, r] — free
        fine = jnp.pad(fine, ((0, 0), (0, 0), (0, 0),
                              (2 * qh, 2 * qh), (2 * qh, 2 * qh)))
        return lax.conv_general_dilated(
            fine, K6, window_strides=(2, 2, 2), padding="VALID",
            dimension_numbers=("NCDHW", "DHWIO", "NDHWC"),
            precision=prec)[0]

    def m8_nc(gxt, prec):
        ch = b3._center_channels3(gxt, corner, size, r_full,
                                  jnp.int32(-2 * qh))
        st = jnp.stack(
            [ch[c][a::2, b::2, d::2]
             for a in (0, 1) for b in (0, 1) for d in (0, 1)
             for c in range(10)], axis=0)[None]  # [1, 80, X/2, h, h]
        st = jnp.pad(st, ((0, 0), (0, 0), (0, 0),
                          (qh, qh), (qh, qh)))
        return lax.conv_general_dilated(
            st, W5, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NCDHW", "DHWIO", "NDHWC"),
            precision=prec)[0]

    return gxt, shipped, fused, m8_nc


def variants(shipped, fused, m8_nc, r_full):
    ship = lax.Precision.HIGH if r_full >= 256 else lax.Precision.HIGHEST
    HST, H, D = (lax.Precision.HIGHEST, lax.Precision.HIGH,
                 lax.Precision.DEFAULT)
    return [
        ("S shipped (eye HIGHEST)", lambda g: shipped(g, HST, ship)),
        ("S2 shipped (eye HIGH)", lambda g: shipped(g, H, ship)),
        ("S3 shipped (eye DEFAULT)", lambda g: shipped(g, D, ship)),
        ("F1 fused stride2 HIGH", lambda g: fused(g, H)),
        ("F2 fused stride2 DEFAULT", lambda g: fused(g, D)),
        ("G m8 NCDHW conv HIGH", lambda g: m8_nc(g, H)),
    ]


def time_fn(name, fn, inputs, reps=2, laps=3):
    def chained(inputs):
        def body(c, _):
            scaled = jax.tree.map(lambda x: x * (1.0 + 1e-20 * c), inputs)
            out = fn(scaled)
            return c + 1e-20 * jnp.sum(out), None

        out, _ = lax.scan(body, jnp.float32(0.0), None, length=reps)
        return out

    f = jax.jit(chained)
    np.asarray(f(inputs))
    best = float("inf")
    for _ in range(laps):
        t0 = time.perf_counter()
        np.asarray(f(inputs))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"variant": name, "seconds": round(best / reps, 4)}),
          flush=True)


# ---- numerics at 64^3 ----------------------------------------------------
r_num = 64
gxt, shipped, fused, m8_nc = make_setup(r_num)
ref = jax.jit(lambda g: shipped(g, lax.Precision.HIGHEST,
                                lax.Precision.HIGHEST))(gxt)
print(json.dumps({"numerics_at": r_num}), flush=True)
for name, fn in variants(shipped, fused, m8_nc, r_num):
    err = float(np.asarray(jax.jit(
        lambda g, r, f=fn: jnp.abs(f(g) - r).max() / jnp.abs(r).max()
    )(gxt, ref)))
    print(json.dumps({"variant": name, "max_rel_err": err}), flush=True)
del gxt, ref

# ---- timing ----------------------------------------------------------------
gxt, shipped, fused, m8_nc = make_setup(r_time)
print(json.dumps({"timing_at": r_time}), flush=True)
for name, fn in variants(shipped, fused, m8_nc, r_time):
    time_fn(name, fn, gxt)
