"""Checkpoint / resume.

The reference has no serialization at all — sim state dies with the process
(SURVEY.md §5: no file I/O anywhere in project code). Here: the particle SoA
plus config are written as a single .npz; resume is bitwise-deterministic
(tests/test_render_io.py:55-100 gates state equality after save/load/step vs
uninterrupted stepping).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nbodysim_tpu.config import SimConfig
from nbodysim_tpu.core.state import ParticleState

_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: ParticleState,
                    config: Optional[SimConfig] = None) -> str:
    """Write state (+ config) to a .npz checkpoint; returns the real path
    (np.savez appends '.npz' when missing, so the suffix is normalized
    here to keep save->load round trips working)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "version": np.int32(_FORMAT_VERSION),
        "pos": np.asarray(state.pos),
        "vel": np.asarray(state.vel),
        "acc": np.asarray(state.acc),
        "mass": np.asarray(state.mass),
        "radius": np.asarray(state.radius),
        "frame": np.asarray(state.frame),
    }
    if config is not None:
        cfg = dataclasses.asdict(config)
        cfg["dtype"] = np.dtype(config.dtype).name
        payload["config_json"] = np.frombuffer(
            json.dumps(cfg).encode(), dtype=np.uint8
        )
    np.savez(path, **payload)
    return path


def load_checkpoint(
    path: str,
) -> Tuple[ParticleState, Optional[SimConfig]]:
    """Read a checkpoint; returns (state, config-or-None)."""
    with np.load(path) as z:
        version = int(z["version"])
        if version > _FORMAT_VERSION:
            raise ValueError(f"checkpoint version {version} is newer than "
                             f"supported {_FORMAT_VERSION}")
        state = ParticleState(
            pos=jnp.asarray(z["pos"]),
            vel=jnp.asarray(z["vel"]),
            acc=jnp.asarray(z["acc"]),
            mass=jnp.asarray(z["mass"]),
            radius=jnp.asarray(z["radius"]),
            frame=jnp.asarray(z["frame"]),
        )
        config = None
        if "config_json" in z:
            cfg = json.loads(bytes(z["config_json"]).decode())
            dtypes = {
                "float32": jnp.float32,
                "float64": jnp.float64,
                "bfloat16": jnp.bfloat16,
            }
            cfg["dtype"] = dtypes[cfg["dtype"]]
            # Tolerate same-version schema drift: drop fields this build no
            # longer has (renamed/removed), let missing ones take defaults —
            # the version gate only protects against newer formats.
            names = {f.name for f in dataclasses.fields(SimConfig)}
            config = SimConfig(**{k: v for k, v in cfg.items() if k in names})
    return state, config


def load_checkpoint_sharded(path: str, mesh, axis_name: str = "shards"):
    """Load a checkpoint and place the state across `mesh`'s particle axis.

    Checkpoints are mesh-agnostic: `save_checkpoint` gathers sharded
    arrays to host .npz via np.asarray, so a state saved from one mesh
    restores onto ANY mesh whose size divides N — same-mesh resume is
    bitwise identical to uninterrupted stepping, cross-mesh resume
    matches to collective-reduction roundoff (tests/test_sharding.py).
    The reference keeps all state process-local with no serialization
    at all (SURVEY.md §5)."""
    from nbodysim_tpu.parallel.sharded import shard_state

    state, config = load_checkpoint(path)
    return shard_state(state, mesh, axis_name), config
