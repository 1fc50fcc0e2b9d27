from nbodysim_tpu.parallel.sharded import (
    make_mesh,
    shard_state,
    make_sharded_step,
    prime_accelerations_sharded,
    ring_accelerations,
)
from nbodysim_tpu.parallel.tree import banded_tree_accelerations

__all__ = [
    "make_mesh",
    "shard_state",
    "make_sharded_step",
    "prime_accelerations_sharded",
    "ring_accelerations",
    "banded_tree_accelerations",
]
