"""Typed configuration for the simulator.

The reference hardcodes every physical constant as C++ `constexpr` scattered
across files (Simulation.hpp:120-124 boundary/damping/vmax; Simulation.hpp:59
theta/epsilon; Simulation.hpp:20 collision cell size; Simulation.hpp:61 N;
main.cpp:39 dt). Here every one of those becomes a typed config field with the
reference value as its default, so the default-constructed config reproduces
the reference simulation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static simulation configuration (hashable; safe to close over in jit).

    Defaults reproduce the reference: Simulation.hpp:59 (theta=1, eps=1),
    main.cpp:39 (dt=0.01), Simulation.hpp:61 (n=25000),
    Simulation.hpp:120-124 (boundary constants, vmax).
    """

    # Problem size
    n: int = 25_000
    dim: int = 2  # the reference is 2D; 3D is supported throughout

    # Integration
    dt: float = 0.01           # main.cpp:39 SIMULATION_DT initial value
    integrator: str = "euler_symplectic"  # or "leapfrog_kdk"
    g_const: float = 1.0       # G=1 implicitly (Quadtree.hpp:127)

    # Gravity softening (Plummer): eps^2 added inside the inverse-distance
    softening: float = 1.0     # epsilon; Simulation.hpp:59 ctor arg -> e_sq=1
    # Barnes-Hut opening angle (Simulation.hpp:59); maps to the tree code's
    # acceptance radius when bh_accept_radius is 0 (see physics/barneshut.py)
    theta: float = 1.0

    # Velocity clamp + soft boundary (Simulation.hpp:120-124)
    max_velocity: float = 1000.0
    boundary_radius: float = 100_000.0
    boundary_soft_frac: float = 0.8      # SOFT_BOUNDARY = radius * 0.8
    boundary_force: float = 0.9
    boundary_damping: float = 0.9995
    enable_boundary: bool = True
    enable_velocity_clamp: bool = True

    # Collisions (Simulation.hpp:18-47, 216-346)
    enable_collisions: bool = True
    # Broad phase: "auto" = dense O(N^2) pair test at N <= 64k, dense
    # bucket grid above (2D), sorted spatial hash (3D / clustered scenes —
    # the occupancy probe at Simulation init switches clustered 2D scenes
    # here with radius-scaled cells, where the fixed-res bucket grid would
    # drop pairs beyond its residual capacity).
    collision_broad_phase: str = "auto"  # "auto"|"dense"|"bucket"|"hash"|"block"
    # Spatial-hash cell size; <= 0 means radius-scaled auto (2.05x the
    # 65th-largest radius — the smallest size the big-body extraction
    # permits, minimizing occupancy in clustered scenes).
    collision_cell_size: float = 600.0   # SpatialGrid::CELL_SIZE
    collision_impulse: float = 1.5       # resolve() impulse factor, hpp:338
    collision_iterations: int = 1        # Jacobi sweeps per step (1 = ref-like)
    collision_max_neighbors: int = 16    # grid bucket capacity at large N
    collision_grid_res: int = 512        # bucket grid cells/axis (2D path)
    # Lex-sorted block pass: targets per block (multiple of 256 — the
    # Pallas kernel's tile width; the static neighbor window is 2x this
    # plus alignment margin).
    collision_block_size: int = 256
    # Narrow-phase backend for the dense (N <= 64k) pass: "auto" uses the
    # Pallas kernel on TPU (kernels/collide.py) and blocked XLA elsewhere.
    collision_backend: str = "auto"      # "auto" | "pallas" | "xla"

    # Force backend: "auto" | "pallas" | "xla" | "bh" (Barnes-Hut)
    force_backend: str = "auto"
    # Pallas tile sizes (targets VPU 8x128 lanes; see kernels/allpairs.py;
    # defaults from a measured v5e sweep: 1.99e11 pairs/s at N=64k; larger
    # target tiles OOM scoped VMEM at N=1M)
    force_block_targets: int = 256
    force_block_sources: int = 2048
    # Run Pallas kernels in interpreter mode (CPU testing / the driver's
    # multi-chip dryrun; never set on real TPU runs).
    pallas_interpret: bool = False

    # Barnes-Hut / multilevel grid backend (physics/barneshut.py).
    # bh_levels <= 0 means auto (finest grid ~1 particle/cell).
    # bh_accept_radius: near Chebyshev radius R; accept cells at cheb >= R.
    # 0 (default) derives R from `theta` (R ~ 1 + 1/theta) floored at R=3
    # (~2e-3 uniform field error; only ~15% slower than R=2). Set 2
    # explicitly for the reference's looser theta=1 fidelity (~1e-2).
    # Heavy point masses are handled exactly regardless.
    bh_levels: int = 0
    bh_accept_radius: int = 0
    # Deep-overflow multipole chain: extends the pyramid past the bucket
    # level so arbitrarily clustered scenes (merger nuclei, Plummer cores)
    # keep reference-quality-or-better forces at any cell occupancy.
    # 0 = off, -1 = auto depth (occupancy probe at Simulation init turns
    # this on when clustering exceeds the bucket+residual capacity),
    # > bucket level = explicit deep level.
    bh_deep_levels: int = 0
    # Hot-zone sub-box refinement (tile levels BELOW the deep grid): the T
    # hottest t x t deep-cell tiles continue the chain k more levels with
    # tile-local grids, cutting the PM smoothing scale 2^k in the dense
    # cores without the global-grid HBM cliff. -1 (default) = auto: 3
    # levels whenever the deep chain is active; 0 = off; > 0 = explicit k.
    bh_tile_levels: int = -1
    bh_tile_size: int = 0        # tile side, deep-level cells; 0 = auto
    #                              (32 in 2D, 8 in 3D — explicit values
    #                              are honored in both dims)
    bh_tile_count: int = 8       # max refined tiles per eval
    # Sparse near-field (3D deep chain only): when nearly every particle
    # takes the deep path (r5 probe: 99.6% on the clustered N=1M merger),
    # the dense bucket-stencil near field is almost entirely discarded
    # work — the few bucket-tier targets get an exact cell-masked pairwise
    # pass instead, and targets beyond the static capacity gracefully
    # promote to the deep path. -1 = auto (init probe turns it on when
    # the bucket-tier target count fits the capacity), 0 = off, 1 = on.
    bh_nf_sparse: int = -1

    # Numerics
    dtype: Any = jnp.float32

    # RNG
    seed: int = 0

    # Multi-chip
    mesh_axis: str = "shards"

    def __post_init__(self):
        if self.dim not in (2, 3):
            raise ValueError(f"dim must be 2 or 3, got {self.dim}")
        if self.integrator not in ("euler_symplectic", "leapfrog_kdk"):
            raise ValueError(f"unknown integrator {self.integrator!r}")
        if self.force_backend not in ("auto", "pallas", "xla", "bh"):
            raise ValueError(f"unknown force backend {self.force_backend!r}")
        if self.collision_backend not in ("auto", "pallas", "xla"):
            raise ValueError(
                f"unknown collision backend {self.collision_backend!r}")
        if self.collision_broad_phase not in ("auto", "dense", "bucket",
                                              "hash", "block"):
            raise ValueError(
                f"unknown collision broad phase "
                f"{self.collision_broad_phase!r}")
        if self.collision_block_size < 256 or self.collision_block_size % 256:
            raise ValueError(
                f"collision_block_size must be a positive multiple of 256, "
                f"got {self.collision_block_size}")

    @property
    def eps_sq(self) -> float:
        return self.softening * self.softening

    @property
    def soft_boundary(self) -> float:
        return self.boundary_radius * self.boundary_soft_frac

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)
