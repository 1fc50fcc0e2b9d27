"""ctypes bindings for the native C++ parity oracle (native/oracle.cpp).

The library is built on demand with g++ and cached next to the source; see
SURVEY.md §7 step 5 — this is the host-side correctness yardstick the JAX
physics is gated against before any TPU tuning.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "oracle.cpp"))
_LIB = os.path.abspath(os.path.join(_NATIVE_DIR, "liboracle.so"))

_lib: Optional[ctypes.CDLL] = None


def build_oracle(force: bool = False) -> str:
    """Compile the oracle shared library if stale; returns its path."""
    if force or not os.path.exists(_LIB) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True,
        )
    return _LIB


def _get() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_oracle())
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.nb_direct_acc.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, f32p,
        ]
        lib.nb_potential_energy.restype = ctypes.c_double
        lib.nb_potential_energy.argtypes = [
            f32p, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
        ]
        lib.nb_resolve_pair.restype = ctypes.c_int
        lib.nb_resolve_pair.argtypes = [
            f32p, f32p, f32p, f32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_float,
        ]
        lib.nb_step.argtypes = [
            f32p, f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int,
        ]
        _lib = lib
    return _lib


def _f32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.float32)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def oracle_accelerations(pos, mass, eps_sq: float, g: float = 1.0) -> np.ndarray:
    pos = _f32(pos)
    mass = _f32(mass)
    n, dim = pos.shape
    out = np.zeros_like(pos)
    _get().nb_direct_acc(_ptr(pos), _ptr(mass), n, dim, eps_sq, g, _ptr(out))
    return out


def oracle_potential_energy(pos, mass, eps_sq: float, g: float = 1.0) -> float:
    pos = _f32(pos)
    mass = _f32(mass)
    n, dim = pos.shape
    return float(
        _get().nb_potential_energy(_ptr(pos), _ptr(mass), n, dim, eps_sq, g)
    )


def oracle_resolve_pair(
    p1, p2, v1, v2, m1, m2, r1, r2, impulse: float = 1.5
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, bool]:
    p1, p2, v1, v2 = map(_f32, (p1, p2, v1, v2))
    dim = p1.shape[0]
    hit = _get().nb_resolve_pair(
        _ptr(p1), _ptr(p2), _ptr(v1), _ptr(v2),
        m1, m2, r1, r2, dim, impulse,
    )
    return p1, p2, v1, v2, bool(hit)


def oracle_step(state, config) -> Tuple[np.ndarray, np.ndarray]:
    """One reference-semantics euler_symplectic step; returns (pos, vel)."""
    pos = _f32(state.pos).copy()
    vel = _f32(state.vel).copy()
    mass = _f32(state.mass)
    radius = _f32(state.radius)
    n, dim = pos.shape
    flags = (
        (1 if config.enable_velocity_clamp else 0)
        | (2 if config.enable_boundary else 0)
        | (4 if config.enable_collisions else 0)
    )
    _get().nb_step(
        _ptr(pos), _ptr(vel), _ptr(mass), _ptr(radius), n, dim,
        config.dt, config.eps_sq, config.g_const, config.max_velocity,
        config.boundary_radius, config.boundary_soft_frac,
        config.boundary_force, config.boundary_damping,
        config.collision_impulse, flags,
    )
    return pos, vel
