"""3D deep-level M2L contraction variants (r4 — the 6.27 s attribution).

profile3d_deep.py measured the clustered-1M eval's M2L at the 256^3 deep
level at 3.51 s (level 7 at 0.53 s) — together 65% of the eval, yet only
~1.4 TFLOP of ideal MXU work (tens of ms at peak). The 3D
conv_general_dilated runs at ~1 TFLOP/s effective. This times the
contraction stage (everything after the shared space-to-depth m8 build)
under each formulation at the real 256^3 shape, and checks numerics at
64^3 (a HIGHEST oracle at 256^3 OOMs: 27 unrolled slice+dot temps of
1 GB each stay live — the scan variant holds one):

  A. conv3d as shipped: one k^3 VALID conv, HIGH at r>=256 else HIGHEST
  B. conv3d with precision DEFAULT (bf16 inputs)
  C. lax.scan over k^3 taps: dynamic_slice + dot_general [.,80]x[80,152]
     (C1 HIGH, C2 DEFAULT)
  D. x-decomposed batched 2D convs: for dx in 0..k-1, conv2d over a
     [D, H, W, 80] slab batch with W[dx] [k,k,80,152], summed
     (D1 HIGH, D2 DEFAULT) — the mature TPU conv path is 2D
  E. the m8 space-to-depth build itself (identity-dot landing)

Usage: scripts/tpu_retry.sh /tmp/expc3.log python scripts/exp_m2l_conv3.py [r_full]
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


def make_setup(r_full):
    s_l = float(size) / r_full
    W = b3._m2l_conv_weights3(R, Rp, eps_sq / (s_l * s_l), jnp.float32)
    W5 = W.reshape(k, k, k, 80, 152)
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

    def build_m8(gxt):
        ch = b3._center_channels3(gxt, corner, size, r_full,
                                  jnp.int32(-2 * qh))
        flat = jnp.stack(
            [ch[c][a::2, b::2, d::2].reshape(-1)
             for a in (0, 1) for b in (0, 1) for d in (0, 1)
             for c in range(10)], axis=0)
        m8 = lax.dot_general(
            flat, jnp.eye(80, dtype=jnp.float32), (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST)
        m8 = m8.reshape(h + 2 * qh, h, h, 80)
        return jnp.pad(m8, ((0, 0), (qh, qh), (qh, qh), (0, 0)))

    def conv3d(m8, prec):
        return lax.conv_general_dilated(
            m8[None], W5, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=prec)[0]

    taps = jnp.array([(dx, dy, dz) for dx in range(k) for dy in range(k)
                      for dz in range(k)], jnp.int32)
    Wt = W5.reshape(k * k * k, 80, 152)

    def scan_dots(m8, prec):
        def body(acc, i):
            o = taps[i]
            sl = lax.dynamic_slice(m8, (o[0], o[1], o[2], 0),
                                   (h, h, h, 80))
            return acc + lax.dot_general(
                sl, Wt[i], (((3,), (0,)), ((), ())), precision=prec), None

        acc0 = jnp.zeros((h, h, h, 152), jnp.float32)
        acc, _ = lax.scan(body, acc0, jnp.arange(k ** 3))
        return acc

    def conv2d_x(m8, prec):
        out = None
        for dx in range(k):
            o = lax.conv_general_dilated(
                lax.slice_in_dim(m8, dx, dx + h, axis=0), W5[dx],
                window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=prec)
            out = o if out is None else out + o
        return out

    return gxt, build_m8, conv3d, scan_dots, conv2d_x


def variants(conv3d, scan_dots, conv2d_x, r_full):
    ship = lax.Precision.HIGH if r_full >= 256 else lax.Precision.HIGHEST
    return [
        ("A conv3d shipped", lambda m: conv3d(m, ship)),
        ("B conv3d DEFAULT", lambda m: conv3d(m, lax.Precision.DEFAULT)),
        ("C1 dots HIGH", lambda m: scan_dots(m, lax.Precision.HIGH)),
        ("C2 dots DEFAULT",
         lambda m: scan_dots(m, lax.Precision.DEFAULT)),
        ("D1 conv2dx HIGH", lambda m: conv2d_x(m, lax.Precision.HIGH)),
        ("D2 conv2dx DEFAULT",
         lambda m: conv2d_x(m, lax.Precision.DEFAULT)),
    ]


def time_fn(name, fn, inputs, reps=2, laps=3):
    def chained(inputs):
        def body(c, _):
            scaled = jax.tree.map(lambda x: x * (1.0 + 1e-20 * c), inputs)
            out = fn(*scaled)
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


# ---- numerics at 64^3 (HIGHEST scan oracle fits easily) ----------------
r_num = 64
gxt, build_m8, conv3d, scan_dots, conv2d_x = make_setup(r_num)
m8 = jax.jit(build_m8)(gxt)
ref = jax.jit(lambda m: scan_dots(m, lax.Precision.HIGHEST))(m8)
print(json.dumps({"numerics_at": r_num}), flush=True)
for name, fn in variants(conv3d, scan_dots, conv2d_x, r_num):
    err = float(np.asarray(jax.jit(
        lambda m, r, f=fn: jnp.abs(f(m) - r).max() / jnp.abs(r).max()
    )(m8, ref)))
    print(json.dumps({"variant": name, "max_rel_err": err}), flush=True)
del gxt, m8, ref

# ---- timing at the real deep-level shape --------------------------------
gxt, build_m8, conv3d, scan_dots, conv2d_x = make_setup(r_time)
m8 = jax.device_put(jax.jit(build_m8)(gxt))
print(json.dumps({"timing_at": r_time, "k": k}), flush=True)
for name, fn in variants(conv3d, scan_dots, conv2d_x, r_time):
    time_fn(name, fn, (m8,))
time_fn("E m8 build (space-to-depth + identity dot)",
        lambda *g: build_m8(g), gxt)
