"""Profiling and performance meters.

The reference's only instrumentation is ad-hoc frame timers
(RenderStats/QuadtreeRenderStats, main.cpp:215-224, 384-399) plus DrawFPS.
Here profiling is first-class (SURVEY.md §5):

  * `trace(dir)` — context manager around `jax.profiler` producing
    Perfetto/XProf traces of the device timeline.
  * `Stopwatch` — wall-clock step/pairs meters with the tunnel-safe
    measurement discipline (chain work under one dispatch, force a
    device->host copy to synchronize; `block_until_ready` over the axon
    tunnel does not reliably block).
  * `measure_force_throughput` / `measure_step_throughput` — the
    BASELINE.json meters used by bench.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nbodysim_trace"):
    """Capture a device profile: view with XProf/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Wall-clock meter for repeated device work.

    >>> sw = Stopwatch()
    >>> with sw.lap():
    ...     np.asarray(step(state).pos)   # host sync inside the lap
    >>> sw.rate(units=n_steps)
    """

    def __init__(self):
        self.laps: list[float] = []

    @contextlib.contextmanager
    def lap(self):
        t0 = time.perf_counter()
        yield
        self.laps.append(time.perf_counter() - t0)

    @property
    def best(self) -> float:
        return min(self.laps) if self.laps else float("nan")

    @property
    def total(self) -> float:
        return sum(self.laps)

    def rate(self, units: float = 1.0) -> float:
        """units per second, using the best lap."""
        return units / self.best


def chain_evals(fn: Callable, reps: int):
    """Build a jitted function running `reps` dependent evals of fn under
    one lax.scan dispatch (defeats per-call dispatch latency and any
    non-blocking sync over the device tunnel). Returns a SCALAR checksum,
    not the carry: pulling the full [N, D] result through the tunnel costs
    ~100 ms at N=1M — at reps=3 that inflated per-eval numbers ~30%."""

    def chained(x, a):
        def body(c, _):
            out = fn(c, a)
            return c + 1e-9 * out, None

        out, _ = lax.scan(body, x, None, length=reps)
        return jnp.sum(out)

    return jax.jit(chained)


def measure_force_throughput(
    n: int,
    backend: str = "pallas",
    reps: int = 10,
    dim: int = 2,
    seed: int = 0,
) -> dict:
    """Pairs/sec of a force backend at size n (one chained dispatch)."""
    from nbodysim_tpu.config import SimConfig
    from nbodysim_tpu.physics.forces import compute_accelerations

    config = SimConfig(n=n, dim=dim, force_backend=backend)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pos = jax.random.uniform(k1, (n, dim), jnp.float32, -30000.0, 30000.0)
    mass = jax.random.uniform(k2, (n,), jnp.float32, 0.1, 10.0)

    f = chain_evals(
        lambda p, m: compute_accelerations(p, m, config), reps)
    np.asarray(f(pos, mass))  # compile + warm
    sw = Stopwatch()
    for _ in range(3):  # best-of-3: single tunnel laps vary up to ~1.5x
        with sw.lap():
            np.asarray(f(pos, mass))
    per_eval = sw.best / reps
    return {
        "n": n,
        "backend": backend,
        "seconds_per_eval": per_eval,
        "pairs_per_second": n * n / per_eval,
    }


def measure_step_throughput(
    n: int, reps: int = 10, scene: str = "uniform_disc", laps: int = 3,
    **config_kw
) -> dict:
    """Full fused steps/sec (forces + integrate + collisions). `laps`
    bounds the timed repeats (best-of-laps after one warm lap); the
    default bench run passes laps=1 at N=4M to keep the driver run
    bounded."""
    from nbodysim_tpu.config import SimConfig
    from nbodysim_tpu.physics.integrators import make_rollout
    from nbodysim_tpu.scenes import init_scene

    config = SimConfig(n=n, **config_kw)
    state = init_scene(scene, config)
    # Match api.Simulation: both probes resolve from the ACTUAL
    # distribution (force 'auto' pins the backend + deep chain; clustered
    # large-N collisions switch to the radius-scaled hash). Without this,
    # a benched 'auto' measures a configuration the Simulation API never
    # runs.
    if config.force_backend == "auto":
        from nbodysim_tpu.physics.forces import resolve_config_for_state

        config = resolve_config_for_state(state.pos, state.mass, config)
    if config.enable_collisions:
        from nbodysim_tpu.physics.collisions import (
            resolve_collision_phase_for_state)

        config = resolve_collision_phase_for_state(state, config)
    if config.integrator == "leapfrog_kdk":
        from nbodysim_tpu.physics.integrators import prime_accelerations

        state = prime_accelerations(state, config)
    rollout = make_rollout(config, reps)
    # Scalar checksum: pulling the full [N, D] positions through the
    # tunnel costs ~100 ms/1M rows per lap and would pollute the timing.
    roll_sum = jax.jit(lambda s: jnp.sum(rollout(s).pos))
    np.asarray(roll_sum(state))  # compile + warm
    sw = Stopwatch()
    for _ in range(laps):
        with sw.lap():
            np.asarray(roll_sum(state))
    return {
        "n": n,
        "steps_per_second": reps / sw.best,
        "seconds_per_step": sw.best / reps,
    }
