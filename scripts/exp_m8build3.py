"""3D M2L space-to-depth (m8 build) variants — the real 3.4 s (r4).

exp_m2l_conv3.py attributed the 256^3 deep-level M2L stage: the MXU
contraction is fine (conv3d HIGH 0.087 s, conv2dx HIGH 0.044 s) — the
cost is build_m8 itself (3.41 s): 80 stride-2-on-every-axis slices of the
per-channel grids. This script sub-attributes the build and times two
slice-free reformulations at the real shape:

  E1. _center_channels3 alone (10 grids -> 10 centered grids, elementwise)
  E2. the 80 [a::2, b::2, d::2] strided slices + stack axis=0 (no dot)
  E3. the identity-dot landing + reshape + pad (flat -> m8)
  F.  parity selection on the MXU: per (channel, x-parity), two
      permutation-matrix dot_generals reorder the y and z lanes to
      (even-half | odd-half); the 8 parity pieces become tile-aligned
      contiguous slices; landing as shipped (flat stack + identity dot).
      The only strided slices left are outer-axis x slabs.
  H.  no m8 at all: fold the space-to-depth into the contraction — per
      channel, one stride-2 conv with a [6,6,6,1,152] kernel built by
      scattering W5[po, f*10+c, :] to child-window offset u = 2*po + f;
      summed over the 10 channels (H1 HIGH, H2 DEFAULT).

Numerics at 64^3 vs the shipped full path; timing at 256^3 (the
clustered-1M deep level).

Usage: scripts/tpu_retry.sh /tmp/m8b.log python scripts/exp_m8build3.py
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

radius = 2
R = Rp = radius
qh = Rp - 1
k = 2 * Rp - 1
eps_sq = 16.0
size = jnp.float32(60000.0)
corner = jnp.array([-30000.0, -30000.0, -30000.0], jnp.float32)
HI = lax.Precision.HIGHEST


def make(r_full):
    s_l = float(size) / r_full
    W = b3._m2l_conv_weights3(R, Rp, eps_sq / (s_l * s_l), jnp.float32)
    W5 = W.reshape(k, k, k, 80, 152)
    h = r_full // 2
    X = r_full + 4 * qh

    def gen(key):
        keys = jax.random.split(key, 10)
        return tuple(
            jax.random.uniform(keys[i], (X, r_full, r_full), jnp.float32)
            for i in range(10))

    gxt = jax.jit(gen)(jax.random.PRNGKey(0))

    def center(gxt):
        return b3._center_channels3(gxt, corner, size, r_full,
                                    jnp.int32(-2 * qh))

    def slices(ch):
        return jnp.stack(
            [ch[c][a::2, b::2, d::2].reshape(-1)
             for a in (0, 1) for b in (0, 1) for d in (0, 1)
             for c in range(10)], axis=0)

    def land(flat):
        m8 = lax.dot_general(flat, jnp.eye(80, dtype=jnp.float32),
                             (((0,), (0,)), ((), ())), precision=HI)
        m8 = m8.reshape(h + 2 * qh, h, h, 80)
        return jnp.pad(m8, ((0, 0), (qh, qh), (qh, qh), (0, 0)))

    def build_shipped(gxt):
        return land(slices(center(gxt)))

    # F: lane-reorder permutation dots; x stays an outer-axis slab slice.
    P = np.zeros((r_full, r_full), np.float32)
    idx = np.arange(h)
    P[2 * idx, idx] = 1.0
    P[2 * idx + 1, idx + h] = 1.0
    Pj = jnp.asarray(P)

    def build_sel(gxt):
        ch = center(gxt)
        pieces = {}
        for c in range(10):
            for a in (0, 1):
                g = ch[c][a::2]                        # [X/2, y, z]
                gy = lax.dot_general(g, Pj, (((1,), (0,)), ((), ())),
                                     precision=HI)     # [X/2, z, y']
                gz = lax.dot_general(gy, Pj, (((1,), (0,)), ((), ())),
                                     precision=HI)     # [X/2, y', z']
                for b in (0, 1):
                    for d in (0, 1):
                        pieces[(a, b, d, c)] = lax.slice(
                            gz, (0, b * h, d * h),
                            (gz.shape[0], b * h + h, d * h + h))
        flat = jnp.stack(
            [pieces[(a, b, d, c)].reshape(-1)
             for a in (0, 1) for b in (0, 1) for d in (0, 1)
             for c in range(10)], axis=0)
        return land(flat)

    def conv3d(m8, prec):
        return lax.conv_general_dilated(
            m8[None], W5, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=prec)[0]

    # H: child-level stride-2 convs; kernel scattered from W5.
    u = np.arange(-2, 4)
    f1 = u % 2
    po1 = (u - f1) // 2
    UX, UY, UZ = np.meshgrid(np.arange(6), np.arange(6), np.arange(6),
                             indexing="ij")
    PX, PY, PZ = po1[UX] + 1, po1[UY] + 1, po1[UZ] + 1
    FX, FY, FZ = f1[UX], f1[UY], f1[UZ]
    C = np.arange(10)
    ci = ((4 * FX + 2 * FY + FZ)[..., None] * 10 + C)          # [6,6,6,10]
    K6 = W5[PX[..., None], PY[..., None], PZ[..., None], ci, :]

    def conv_fused(gxt, prec):
        ch = center(gxt)
        out = None
        for c in range(10):
            gp = jnp.pad(ch[c], ((0, 0), (2, 2), (2, 2)))
            o = lax.conv_general_dilated(
                gp[None, :, :, :, None], K6[:, :, :, c:c + 1, :],
                window_strides=(2, 2, 2), padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                precision=prec)
            out = o if out is None else out + o
        return out[0]

    return gxt, center, slices, land, build_shipped, build_sel, \
        conv3d, conv_fused


def time_fn(name, fn, inputs, reps=2, laps=3):
    def chained(inputs):
        def body(c, _):
            scaled = jax.tree.map(lambda x: x * (1.0 + 1e-20 * c), inputs)
            out = fn(*scaled)
            chk = sum(jnp.sum(x) for x in jax.tree.leaves(out))
            return c + 1e-20 * chk, None

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
(gxt, center, slices, land, build_shipped, build_sel, conv3d,
 conv_fused) = make(r_num)
ref = jax.jit(lambda g: conv3d(build_shipped(g), HI))(gxt)
print(json.dumps({"numerics_at": r_num}), flush=True)
for name, fn in [
    ("F sel-build + conv HIGHEST",
     lambda g: conv3d(build_sel(g), HI)),
    ("H1 fused conv HIGH",
     lambda g: conv_fused(g, lax.Precision.HIGH)),
    ("H2 fused conv DEFAULT",
     lambda g: conv_fused(g, lax.Precision.DEFAULT)),
]:
    err = float(np.asarray(jax.jit(
        lambda g, r, f=fn: jnp.abs(f(g) - r).max() / jnp.abs(r).max()
    )(gxt, ref)))
    print(json.dumps({"variant": name, "max_rel_err": err}), flush=True)
del gxt, ref

# ---- timing at the real deep-level shape ---------------------------------
r_time = 256
(gxt, center, slices, land, build_shipped, build_sel, conv3d,
 conv_fused) = make(r_time)
print(json.dumps({"timing_at": r_time}), flush=True)
ch = tuple(jax.device_put(x) for x in jax.jit(center)(gxt))
flat = jax.device_put(jax.jit(lambda c: slices(c))(ch))
time_fn("E1 center only", lambda *g: center(g), gxt)
time_fn("E2 slices+stack", lambda *c: slices(c), ch)
time_fn("E3 identity-dot landing", land, (flat,))
del flat
time_fn("F sel-build", lambda *g: build_sel(g), gxt)
time_fn("F sel-build + conv3d HIGH",
        lambda *g: conv3d(build_sel(g), lax.Precision.HIGH), gxt)
time_fn("H1 fused conv HIGH",
        lambda *g: conv_fused(g, lax.Precision.HIGH), gxt)
time_fn("H2 fused conv DEFAULT",
        lambda *g: conv_fused(g, lax.Precision.DEFAULT), gxt)
