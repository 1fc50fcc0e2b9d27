"""Shared double-blocked pairwise mapping.

Every O(T x S) pairwise stage in the framework (forces, potential, collision
passes, FMM residuals) needs the same skeleton: pad both sets to block
multiples, lax.map over target blocks, lax.scan over source chunks inside,
accumulate per-target partials, slice the padding off. Writing that skeleton
once keeps the [<=bs_t, <=bs_s] temp bound — the repeated source of
16-32 GB OOMs when a stage forgot to chunk one of the axes — in one place.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _padchop(arrays: Sequence[jax.Array], size: int, blocks: int):
    out = []
    for a in arrays:
        a = jnp.pad(
            a, ((0, blocks * size - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))
        out.append(a.reshape((blocks, size) + a.shape[1:]))
    return tuple(out)


def pairwise_blocked(
    kernel: Callable,
    tgt_arrays: Sequence[jax.Array],
    src_arrays: Sequence[jax.Array],
    out_dims: Sequence[Tuple[int, ...]],
    dtype,
    bs_t: int = 1024,
    bs_s: int = 4096,
):
    """Run `kernel` over all (target-block, source-chunk) pairs.

    kernel(tgt_blk_tuple, src_blk_tuple) -> tuple of arrays, each
    [bs_t, *out_dims[i]]: the PARTIAL accumulation for this source chunk
    (already reduced over the source axis). Partials are summed over source
    chunks and concatenated over target blocks.

    Numeric padding is zeros; kernels must make padded rows/columns inert
    (zero mass, etc.) — the padded TARGET rows are sliced off regardless.
    Returns a tuple of arrays [T, *out_dims[i]].
    """
    t = tgt_arrays[0].shape[0]
    s = src_arrays[0].shape[0]
    bs_t = min(t, bs_t)
    bs_s = min(s, bs_s)
    nb_t = -(-t // bs_t)
    nb_s = -(-s // bs_s)
    tgt_c = _padchop(tgt_arrays, bs_t, nb_t)
    src_c = _padchop(src_arrays, bs_s, nb_s)

    def one_tgt(tgt_blk):
        def one_src(carry, src_blk):
            partials = kernel(tgt_blk, src_blk)
            return tuple(c + p for c, p in zip(carry, partials)), None

        init = tuple(
            jnp.zeros((bs_t,) + tuple(d), dtype) for d in out_dims)
        acc, _ = lax.scan(one_src, init, src_c)
        return acc

    outs = lax.map(one_tgt, tgt_c)
    return tuple(
        o.reshape((nb_t * bs_t,) + o.shape[2:])[:t] for o in outs)


def sorted_first_occurrence(sorted_keys):
    """Index of the first occurrence of each element's key, for SORTED keys.

    Equivalent to jnp.searchsorted(sorted_keys, sorted_keys, side="left")
    but ~40x faster on TPU at 1M elements (185 ms -> a cummax over int32):
    mark segment starts where the key changes, then running-max of the
    start indices.
    """
    n = sorted_keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]])
    return jax.lax.cummax(jnp.where(is_start, idx, 0))
