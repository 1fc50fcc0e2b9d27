"""Multi-chip execution: particle-axis sharding over a device mesh.

The reference's only parallelism is std::async host threads over body chunks
(Simulation.hpp:176-214). The TPU-native equivalent is SPMD over a 1-D
`jax.sharding.Mesh` on the particle axis — the N-body analogue of sequence
parallelism — with the all-pairs force reduction done as a **ring exchange**
(the ring-attention structure): each device keeps its target shard resident
and accumulates partial accelerations while source shards rotate around the
ring via `lax.ppermute` over ICI. P-1 hops move N*D*4 bytes each; compute
(N^2/P per device) overlaps the next hop's transfer since XLA schedules the
ppermute DMA asynchronously with the force kernel.

Collisions need cross-shard pairs too; they are short-range, so the ring is
overkill. Below DENSE_THRESHOLD each device all-gathers the (small) particle
arrays and resolves its local targets' collisions (O(N^2/P) per device); at
large N the broad phase itself is banded across the mesh — grid-row bands
for the 2D bucket grid, sorted-chunk bands for the spatial hash — in
`parallel/collisions.py` (the same decomposition parallel/tree.py gives the
FMM).

Everything runs under one `shard_map`-wrapped jit: forces, integration, and
collisions execute per-shard with explicit collectives, from 1 chip to a
full pod — the same code path (SURVEY.md §5 comm-backend row).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState
from nbodysim_tpu.physics.collisions import _pair_deltas
from nbodysim_tpu.physics.integrators import (
    apply_soft_boundary,
    clamp_velocity,
)


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "shards"
) -> Mesh:
    """1-D device mesh over the particle axis."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} available"
        )
    return Mesh(np.array(devices[:n_devices]), (axis_name,))


def shard_state(state: ParticleState, mesh: Mesh, axis_name: str = "shards"):
    """Place a state's particle axis across the mesh (frame replicated)."""
    p = len(mesh.devices)
    if state.n % p != 0:
        raise ValueError(
            f"particle count {state.n} must divide the mesh size {p}; "
            f"pad the scene or choose n as a multiple of the device count"
        )
    arr = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    return ParticleState(
        pos=jax.device_put(state.pos, arr),
        vel=jax.device_put(state.vel, arr),
        acc=jax.device_put(state.acc, arr),
        mass=jax.device_put(state.mass, arr),
        radius=jax.device_put(state.radius, arr),
        frame=jax.device_put(state.frame, rep),
    )


def _local_acc_fn(config: SimConfig) -> Callable:
    """Per-(target-block, source-block) acceleration kernel selection."""
    use_pallas = config.force_backend == "pallas" or (
        config.force_backend == "auto" and jax.default_backend() == "tpu"
    )
    # The positional `mass` argument is the self-interaction source mass and
    # is unused when src_pos/src_mass are supplied; pass None so any future
    # change to that contract fails loudly instead of computing wrong forces.
    if use_pallas:
        from nbodysim_tpu.kernels.allpairs import allpairs_accelerations

        def acc(tgt_pos, src_pos, src_mass):
            return allpairs_accelerations(
                tgt_pos, None,
                eps_sq=config.eps_sq, g_const=config.g_const,
                block_targets=config.force_block_targets,
                block_sources=config.force_block_sources,
                interpret=config.pallas_interpret,
                src_pos=src_pos, src_mass=src_mass,
            )
    else:
        from nbodysim_tpu.physics.forces import direct_accelerations

        def acc(tgt_pos, src_pos, src_mass):
            return direct_accelerations(
                tgt_pos, None,
                eps_sq=config.eps_sq, g_const=config.g_const,
                src_pos=src_pos, src_mass=src_mass,
            )
    return acc


def replicated_tree_accelerations(
    pos_l: jax.Array,      # [N/P, D] local targets (inside shard_map)
    mass_l: jax.Array,     # [N/P]
    config: SimConfig,
    axis_name: str = "shards",
) -> jax.Array:
    """Multi-chip BH v1: all-gather the (small) particle arrays, evaluate
    the stencil FMM redundantly on every device, keep the local slice.

    Particle arrays at N=4M are 48 MB — one all_gather over ICI — while the
    tree build is hundreds of ms, so this trades redundant compute for zero
    algorithmic risk. It makes force_backend='bh' usable under the sharded
    step; scaling the tree itself (banded near field, pyramid halo
    exchange) is future work and is tracked in STATUS.md.
    """
    from nbodysim_tpu.physics.barneshut import bh_accelerations

    pos_g = lax.all_gather(pos_l, axis_name, tiled=True)
    mass_g = lax.all_gather(mass_l, axis_name, tiled=True)
    acc_g = bh_accelerations(pos_g, mass_g, config)
    n_l = pos_l.shape[0]
    my = lax.axis_index(axis_name)
    return lax.dynamic_slice_in_dim(acc_g, my * n_l, n_l, axis=0)


def sharded_accelerations(pos_l, mass_l, config: SimConfig,
                          axis_name: str = "shards") -> jax.Array:
    """Backend dispatch for in-shard force evaluation: the exact kernels go
    through the ring reduction; the tree code through the banded
    (grid-row-sharded) FMM."""
    from nbodysim_tpu.physics.forces import resolve_backend

    n_global = pos_l.shape[0] * lax.axis_size(axis_name)
    if resolve_backend(config, n_global, pos_l.shape[1]) == "bh":
        if pos_l.shape[1] == 3:
            from nbodysim_tpu.parallel.tree3d import (
                banded_tree3_accelerations)

            return banded_tree3_accelerations(
                pos_l, mass_l, config, axis_name)
        from nbodysim_tpu.parallel.tree import banded_tree_accelerations

        return banded_tree_accelerations(pos_l, mass_l, config, axis_name)
    return ring_accelerations(pos_l, mass_l, config, axis_name)


def ring_accelerations(
    pos_l: jax.Array,      # [N/P, D] local targets (inside shard_map)
    mass_l: jax.Array,     # [N/P]
    config: SimConfig,
    axis_name: str = "shards",
) -> jax.Array:
    """Full accelerations on local targets via a P-step source ring.

    Step 0 uses the local shard as sources (self/coincident pairs are
    handled by the kernel); each subsequent step receives the next shard
    around the ring. ppermute transfers overlap the local force kernel.
    """
    p = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % p) for i in range(p)]
    acc_fn = _local_acc_fn(config)

    def body(carry, _):
        acc, src_pos, src_mass = carry
        acc = acc + acc_fn(pos_l, src_pos, src_mass)
        src_pos = lax.ppermute(src_pos, axis_name, perm)
        src_mass = lax.ppermute(src_mass, axis_name, perm)
        return (acc, src_pos, src_mass), None

    init = (jnp.zeros_like(pos_l), pos_l, mass_l)
    (acc, _, _), _ = lax.scan(body, init, None, length=p)
    return acc


def _gathered_collision_pass(
    pos_l, vel_l, mass_l, radius_l, config: SimConfig, axis_name: str
):
    """Back-compat alias: the dense gathered pass now lives in
    parallel/collisions.py next to the banded large-N broad phases."""
    from nbodysim_tpu.parallel.collisions import gathered_dense_deltas

    return gathered_dense_deltas(
        pos_l, vel_l, mass_l, radius_l, config, axis_name)


def prime_accelerations_sharded(
    state: ParticleState,
    config: SimConfig,
    mesh: Mesh,
    axis_name: Optional[str] = None,
) -> ParticleState:
    """Fill state.acc with a(t0) via the ring reduction — required before
    the first sharded leapfrog_kdk step (the single-chip entry points prime
    automatically; a sharded state built from init_scene carries zeros)."""
    axis = axis_name or config.mesh_axis

    def prime(s: ParticleState) -> ParticleState:
        acc = sharded_accelerations(s.pos, s.mass, config, axis)
        return s.replace(acc=acc)

    spec_arr = P(axis)
    spec_state = ParticleState(
        pos=spec_arr, vel=spec_arr, acc=spec_arr,
        mass=spec_arr, radius=spec_arr, frame=P(),
    )
    return jax.jit(jax.shard_map(
        prime, mesh=mesh, in_specs=(spec_state,), out_specs=spec_state,
        check_vma=False,
    ))(state)


def make_sharded_step(
    config: SimConfig,
    mesh: Mesh,
    axis_name: Optional[str] = None,
    jit: bool = True,
) -> Callable[[ParticleState], ParticleState]:
    """Build the fused multi-chip step (forces + integrate + collisions).

    Input/output states are sharded on the particle axis (see shard_state).
    The reference semantics (kick -> clamp -> boundary -> drift -> collide,
    Simulation.hpp:67-75) are preserved per shard; cross-shard coupling
    happens only in the ring force reduction and the gathered collision
    pass. Leapfrog KDK is supported via the same acc-carrying scheme as the
    single-chip integrator.
    """
    axis = axis_name or config.mesh_axis

    def shard_step(state: ParticleState) -> ParticleState:
        pos, vel, mass, radius = state.pos, state.vel, state.mass, state.radius
        dt = jnp.asarray(config.dt, pos.dtype)

        if config.integrator == "leapfrog_kdk":
            half = 0.5 * dt
            vel_h = vel + state.acc * half
            pos_new = pos + vel_h * dt
            acc = sharded_accelerations(pos_new, mass, config, axis)
            vel_new = vel_h + acc * half
        else:
            acc = sharded_accelerations(pos, mass, config, axis)
            vel_new = vel + acc * dt
            pos_new = pos

        if config.enable_velocity_clamp:
            vel_new = clamp_velocity(vel_new, config.max_velocity)
        if config.enable_boundary:
            vel_new = apply_soft_boundary(pos_new, vel_new, dt, config)
        if config.integrator != "leapfrog_kdk":
            pos_new = pos_new + vel_new * dt

        if config.enable_collisions:
            from nbodysim_tpu.parallel.collisions import (
                sharded_collision_deltas)

            for _ in range(max(1, config.collision_iterations)):
                dpos, dvel = sharded_collision_deltas(
                    pos_new, vel_new, mass, radius, config, axis
                )
                pos_new = pos_new + dpos
                vel_new = vel_new + dvel

        return ParticleState(
            pos=pos_new, vel=vel_new, acc=acc, mass=mass, radius=radius,
            frame=state.frame + 1,
        )

    spec_arr = P(axis)
    spec_state = ParticleState(
        pos=spec_arr, vel=spec_arr, acc=spec_arr,
        mass=spec_arr, radius=spec_arr, frame=P(),
    )
    step = jax.shard_map(
        shard_step, mesh=mesh, in_specs=(spec_state,),
        out_specs=spec_state, check_vma=False,
    )
    return jax.jit(step) if jit else step


def make_sharded_rollout(
    config: SimConfig, mesh: Mesh, num_steps: int,
    axis_name: Optional[str] = None,
) -> Callable[[ParticleState], ParticleState]:
    """Multi-step sharded rollout under one jit."""
    step = make_sharded_step(config, mesh, axis_name, jit=False)

    def rollout(state: ParticleState) -> ParticleState:
        def body(s, _):
            return step(s), None

        out, _ = lax.scan(body, state, None, length=num_steps)
        return out

    return jax.jit(rollout)
