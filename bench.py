"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: pairwise interactions/sec/chip for the all-pairs force kernel at
N=65,536 (BASELINE.json north star: >= 1e11 at N=1M on one v5e chip;
vs_baseline is measured/1e11). The eval chain runs under a single lax.scan
dispatch because block_until_ready over the axon tunnel does not reliably
block — per-call timing measures dispatch latency, not the kernel.

Usage: python bench.py [--n N] [--reps R] [--full]
  --full also reports fused-step throughput (forces+integrate+collide) and
  the N=1M kernel rate as extra JSON lines (the driver consumes only the
  first line).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

BASELINE_PAIRS_PER_SEC = 1.0e11


def _bench_kernel(n: int, reps: int) -> float:
    """Pairs/sec of the force kernel, chained under one dispatch."""
    from nbodysim_tpu.kernels.allpairs import allpairs_accelerations

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pos = jax.random.uniform(k1, (n, 2), jnp.float32, -30000.0, 30000.0)
    mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)

    def chained(p, m):
        def body(c, _):
            a = allpairs_accelerations(c, m, eps_sq=1.0)
            return c + 1e-9 * a, None

        out, _ = lax.scan(body, p, None, length=reps)
        return out

    f = jax.jit(chained)
    np.asarray(f(pos, mass))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(f(pos, mass))  # device->host copy forces real completion
    dt = (time.perf_counter() - t0) / reps
    return n * n / dt


def _bench_step(n: int, reps: int) -> float:
    """Full fused steps/sec (forces + integrate + collisions)."""
    from nbodysim_tpu.config import SimConfig
    from nbodysim_tpu.physics.integrators import make_rollout
    from nbodysim_tpu.scenes import init_scene

    config = SimConfig(n=n)
    state = init_scene("uniform_disc", config)
    rollout = make_rollout(config, reps)
    np.asarray(rollout(state).pos)  # compile + warm
    t0 = time.perf_counter()
    np.asarray(rollout(state).pos)
    return reps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    rate = _bench_kernel(args.n, args.reps)
    print(json.dumps({
        "metric": f"pairwise interactions/sec/chip (all-pairs kernel, N={args.n})",
        "value": rate,
        "unit": "pairs/s",
        "vs_baseline": rate / BASELINE_PAIRS_PER_SEC,
    }))

    if args.full:
        sps = _bench_step(25_000, args.reps)
        print(json.dumps({
            "metric": "fused steps/sec (N=25000 reference config)",
            "value": sps,
            "unit": "steps/s",
            "vs_baseline": None,
        }))
        rate_1m = _bench_kernel(1 << 20, 2)
        print(json.dumps({
            "metric": "pairwise interactions/sec/chip (N=1M)",
            "value": rate_1m,
            "unit": "pairs/s",
            "vs_baseline": rate_1m / BASELINE_PAIRS_PER_SEC,
        }))
        from nbodysim_tpu.diagnostics.profiling import measure_force_throughput

        bh = measure_force_throughput(1 << 20, backend="bh", reps=3)
        print(json.dumps({
            "metric": "FMM tree-code pairs-equivalent/sec/chip (N=1M)",
            "value": bh["pairs_per_second"],
            "unit": "pairs-equiv/s",
            "vs_baseline": bh["pairs_per_second"] / BASELINE_PAIRS_PER_SEC,
        }))


if __name__ == "__main__":
    main()
