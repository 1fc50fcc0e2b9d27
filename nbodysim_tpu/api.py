"""High-level user API.

`Simulation` mirrors the reference's `class Simulation` surface
(Simulation.hpp:49-75: construct -> `step()` -> read `bodies` / `frame` /
`dt`) as a thin stateful wrapper over the pure-functional core, so a user of
the reference finds the same mental model; `simulate` is the functional
entry point for on-device rollouts.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState
from nbodysim_tpu.physics.integrators import (
    make_rollout,
    make_step,
    prime_accelerations,
)

# Reference dt slider range (main.cpp:865-893): the raygui slider spans
# [0.001, 0.1] and turns red at the max — values outside are unreachable
# from the reference UI. Runtime dt channels (viewer T/Y keys, CLI
# --control) clamp into this range and surface the clamp to the user.
DT_MIN = 0.001
DT_MAX = 0.1


def clamp_dt(dt: float) -> Tuple[float, bool]:
    """Clamp dt into the reference slider range; returns (dt, was_clamped)."""
    clamped = min(max(dt, DT_MIN), DT_MAX)
    return clamped, clamped != dt


class Simulation:
    """Stateful convenience wrapper (reference: Simulation.hpp:49-75).

    >>> sim = Simulation(SimConfig(n=4096), scene="uniform_disc")
    >>> sim.step()           # one fused device step
    >>> sim.run(100)         # 100 steps under one lax.scan
    >>> sim.state.pos        # SoA field access (reference: sim.bodies)
    """

    def __init__(
        self,
        config: Optional[SimConfig] = None,
        scene: str = "uniform_disc",
        state: Optional[ParticleState] = None,
        **scene_kwargs,
    ):
        self.config = config or SimConfig()
        # Remember which choices the user left on auto: the mid-run
        # re-resolve (re_resolve_auto) may only adapt those.
        self._auto_force = self.config.force_backend == "auto"
        if state is None:
            from nbodysim_tpu.scenes import init_scene

            state = init_scene(scene, self.config, **scene_kwargs)
        if self.config.force_backend == "auto":
            # Pin 'auto' to a concrete backend (and, for clustered
            # scenes, the deep-overflow chain + tile refinement) from the
            # actual particle distribution; see
            # forces.resolve_config_for_state.
            from nbodysim_tpu.physics.forces import resolve_config_for_state

            self.config = resolve_config_for_state(
                state.pos, state.mass, self.config)
        if self.config.enable_collisions:
            # Same probe for the collision broad phase: clustered scenes
            # that overflow the bucket grid switch to the sorted hash with
            # radius-scaled cells (collisions.resolve_collision_phase...).
            from nbodysim_tpu.physics.collisions import (
                resolve_collision_phase_for_state)

            self.config = resolve_collision_phase_for_state(
                state, self.config)
        if self.config.integrator == "leapfrog_kdk":
            state = prime_accelerations(state, self.config)
        self.state = state
        self._step = make_step(self.config)
        self._rollouts: dict[int, Callable] = {}
        self.check_capacity()

    def re_resolve_auto(self, when: str = "mid-run") -> bool:
        """Re-run the init-time auto distribution probes on the CURRENT
        state and adopt any coverage-ENABLING change (VERDICT r3 #6: a
        10k-step merger migrates mass, so the init-time pin can go stale;
        the CLI run loop calls this whenever the periodic capacity check
        trips). Escalation is monotonic — deep-overflow chain ON, bucket
        grid -> sorted hash — never a downgrade, so a long run rebuilds
        its step at most twice and cannot thrash between configs.
        Explicit user choices are never touched (the probes only fire for
        fields that were 'auto' at construction). Returns True when the
        config changed and the step was rebuilt."""
        changed: dict = {}
        if (self._auto_force and self.config.force_backend == "bh"
                and self.config.bh_deep_levels == 0):
            from nbodysim_tpu.physics.forces import resolve_config_for_state

            probed = resolve_config_for_state(
                self.state.pos, self.state.mass,
                self.config.replace(force_backend="auto"))
            if probed.bh_deep_levels != 0:
                changed["bh_deep_levels"] = probed.bh_deep_levels
        if (self.config.enable_collisions
                and self.config.collision_broad_phase == "auto"):
            from nbodysim_tpu.physics.collisions import (
                resolve_collision_phase_for_state)

            probed = resolve_collision_phase_for_state(
                self.state, self.config)
            if (probed.collision_broad_phase
                    != self.config.collision_broad_phase):
                changed["collision_broad_phase"] = \
                    probed.collision_broad_phase
                changed["collision_cell_size"] = probed.collision_cell_size
        if not changed:
            return False
        self.config = self.config.replace(**changed)
        if self.config.integrator == "leapfrog_kdk":
            # Re-prime so the carried half-kick acceleration comes from
            # the newly adopted force discretization.
            self.state = prime_accelerations(self.state, self.config)
        self._step = make_step(self.config)
        self._rollouts.clear()
        return True

    def check_capacity(self, when: str = "the initial state") -> bool:
        """Host-side capacity check (the fixed-shape overflow residuals
        silently degrade past their caps; the device tunnel rejects
        in-kernel host callbacks, so the check runs host-side — at init
        here, and periodically from the CLI run loop, since a scene that
        clusters during evolution can overflow mid-run). Returns True when
        any cap is exceeded (a warning was emitted)."""
        import warnings

        from nbodysim_tpu.physics.forces import resolve_backend

        exceeded = False
        backend = resolve_backend(self.config, self.state.n, self.state.dim)
        deep_on = self.config.bh_deep_levels != 0
        if backend == "bh" and not deep_on:
            # With the deep-overflow chain active, overflow is covered
            # (tree-PM regime) — no residual cap to exceed.
            from nbodysim_tpu.physics.barneshut import (
                _OVERFLOW_CAP, bh_near_overflow)

            if self.state.dim == 3:
                from nbodysim_tpu.physics.barneshut3d import (
                    bh3_near_overflow as bh_near_overflow)

            over = bh_near_overflow(self.state.pos, self.state.mass,
                                    self.config)
            if over > _OVERFLOW_CAP:
                exceeded = True
                warnings.warn(
                    f"BH near-field overflow {over} exceeds the residual "
                    f"capacity {_OVERFLOW_CAP} on {when}; excess "
                    f"particles get no near-field force. Set "
                    f"bh_deep_levels=-1 (deep-overflow chain), or use "
                    f"force_backend='pallas' for this scene.",
                    RuntimeWarning)

        if (self.config.enable_collisions and self.state.dim == 2
                and self.config.collision_broad_phase in ("auto", "bucket")):
            # Scenes already switched to the sorted hash (radius-scaled
            # cells) have full coverage — no bucket cap to exceed.
            from nbodysim_tpu.physics.collisions import (
                DENSE_THRESHOLD, _OVERFLOW_CAP as COLL_CAP,
                collision_bucket_overflow)

            if self.state.n > DENSE_THRESHOLD:
                over = collision_bucket_overflow(self.state, self.config)
                if over > COLL_CAP:
                    exceeded = True
                    warnings.warn(
                        f"collision bucket overflow {over} exceeds the "
                        f"residual capacity {COLL_CAP} on {when}; "
                        f"excess particles get no collision response. Set "
                        f"collision_broad_phase='block' (radius-scaled "
                        f"cells, full coverage) or raise "
                        f"collision_grid_res / collision_max_neighbors.",
                        RuntimeWarning)

        resolves_block = (
            self.config.collision_broad_phase == "block"
            or (self.config.collision_broad_phase == "auto"
                and self.state.dim == 3))
        if (self.config.enable_collisions and resolves_block):
            from nbodysim_tpu.physics.collisions import (
                DENSE_THRESHOLD,
                _OVERFLOW_CAP as COLL_CAP, collision_block_overflow)

            if self.state.n <= DENSE_THRESHOLD \
                    and self.config.collision_broad_phase == "auto":
                return exceeded
            over = collision_block_overflow(self.state, self.config)
            if over > COLL_CAP:
                exceeded = True
                warnings.warn(
                    f"collision block-window overflow {over} exceeds the "
                    f"residual capacity {COLL_CAP} on {when}; excess "
                    f"particles get no collision response. Raise "
                    f"collision_block_size.", RuntimeWarning)
        return exceeded

    @property
    def frame(self) -> int:
        return int(self.state.frame)

    @property
    def dt(self) -> float:
        return self.config.dt

    def set_dt(self, dt: float) -> None:
        """Change the timestep (reference: SIMULATION_DT atomic + T/Y keys)."""
        self.config = self.config.replace(dt=dt)
        self._step = make_step(self.config)
        self._rollouts.clear()

    def step(self) -> ParticleState:
        self.state = self._step(self.state)
        return self.state

    def run(self, num_steps: int) -> ParticleState:
        """num_steps fused on device under lax.scan."""
        if num_steps not in self._rollouts:
            self._rollouts[num_steps] = make_rollout(self.config, num_steps)
        self.state = self._rollouts[num_steps](self.state)
        return self.state

    def diagnostics(self):
        from nbodysim_tpu.diagnostics.metrics import diagnostics

        return diagnostics(self.state, self.config)

    def system_metrics(self):
        from nbodysim_tpu.diagnostics.metrics import system_metrics

        return system_metrics(self.state, self.config)


def simulate(
    state: ParticleState,
    config: SimConfig,
    num_steps: int,
) -> ParticleState:
    """Functional rollout: `num_steps` fused steps on device."""
    if config.integrator == "leapfrog_kdk":
        state = prime_accelerations(state, config)
    return make_rollout(config, num_steps)(state)
