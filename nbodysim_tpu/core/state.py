"""Struct-of-arrays particle state.

The reference stores particles as an array-of-structs `std::vector<Body>`
(Body.hpp:6-13: pos, vel, acc, mass, radius) and had an abandoned SoA
experiment (`BodySystem`, Body.hpp:109-279, commented out). On TPU the SoA
layout is the only sensible one — each field is a dense array the VPU/MXU can
tile — so this module is that experiment done properly, as a JAX pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParticleState:
    """SoA particle state; a pytree, so it jits/vmaps/shards transparently.

    Fields (N = particle count, D = 2 or 3):
      pos    [N, D] positions
      vel    [N, D] velocities
      acc    [N, D] accelerations from the last force evaluation
      mass   [N]    masses
      radius [N]    collision radii (reference: radius = cbrt(mass))
      frame  []     int32 step counter (Simulation.hpp:53 `frame`)
    """

    pos: jax.Array
    vel: jax.Array
    acc: jax.Array
    mass: jax.Array
    radius: jax.Array
    frame: jax.Array

    # -- constructors -------------------------------------------------------

    @staticmethod
    def create(
        pos: jax.Array,
        vel: jax.Array,
        mass: jax.Array,
        radius: Optional[jax.Array] = None,
        dtype=jnp.float32,
    ) -> "ParticleState":
        pos = jnp.asarray(pos, dtype)
        vel = jnp.asarray(vel, dtype)
        mass = jnp.asarray(mass, dtype)
        if radius is None:
            # reference: radius = cbrt(mass), Simulation.hpp:579
            radius = jnp.cbrt(mass)
        radius = jnp.asarray(radius, dtype)
        return ParticleState(
            pos=pos,
            vel=vel,
            acc=jnp.zeros_like(pos),
            mass=mass,
            radius=radius,
            frame=jnp.zeros((), jnp.int32),
        )

    @staticmethod
    def zeros(n: int, dim: int = 2, dtype=jnp.float32) -> "ParticleState":
        return ParticleState.create(
            pos=jnp.zeros((n, dim), dtype),
            vel=jnp.zeros((n, dim), dtype),
            mass=jnp.ones((n,), dtype),
            dtype=dtype,
        )

    # -- convenience --------------------------------------------------------

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def dim(self) -> int:
        return self.pos.shape[1]

    def replace(self, **kw) -> "ParticleState":
        return dataclasses.replace(self, **kw)

    def astype(self, dtype) -> "ParticleState":
        return ParticleState(
            pos=self.pos.astype(dtype),
            vel=self.vel.astype(dtype),
            acc=self.acc.astype(dtype),
            mass=self.mass.astype(dtype),
            radius=self.radius.astype(dtype),
            frame=self.frame,
        )


def validate_state(state: ParticleState) -> None:
    """Shape/dtype sanity checks (host-side; not for use under jit)."""
    n, d = state.pos.shape
    assert state.vel.shape == (n, d), state.vel.shape
    assert state.acc.shape == (n, d), state.acc.shape
    assert state.mass.shape == (n,), state.mass.shape
    assert state.radius.shape == (n,), state.radius.shape
    assert d in (2, 3)
