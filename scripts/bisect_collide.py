"""Bisect the hash-grid collision pass's TPU worker crash (r4).

The isolated `_grid_pass` at N=4M crashes the TPU worker ("kernel fault")
at compile+warm. This probes one (stage, N) combination per process (the
crash kills the client, so the sweep is driven externally):

  python scripts/bisect_collide.py <stage> <log2_n>

stages:
  sort      hash + argsort + rank/in_win only
  window    + the chunked 27-cell window scan (no big/residual passes)
  big       + the exact big-body passes
  residual  the overflow-residual cheb passes alone (overflow forced)
  full      the real _grid_pass
  blockpass the lex-sorted _block_pass (r4 replacement broad phase)
Prints one OK line with the wall time, or dies trying.

r4 findings on one v5e (merger IC, N=4M unless noted): sort OK 0.18 s;
window OK 12.9 s/pass (gather-bound); big OK 0.09 s; full@1M OK
4.7 s/pass; full@4M CRASHES the TPU worker ("kernel fault") — the
residual stage is the remaining suspect.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax                                              # noqa: E402
import jax.numpy as jnp                                 # noqa: E402
import numpy as np                                      # noqa: E402
from jax import lax                                     # noqa: E402


def main():
    stage = sys.argv[1]
    n = 1 << int(sys.argv[2])

    from nbodysim_tpu.config import SimConfig
    from nbodysim_tpu.physics import collisions as C
    from nbodysim_tpu.scenes import init_scene

    cfg = SimConfig(n=n, dt=0.05, integrator="leapfrog_kdk",
                    force_backend="bh", bh_deep_levels=-1,
                    enable_collisions=True,
                    collision_broad_phase="hash", collision_cell_size=0.0)
    state = init_scene("galaxy_merger", cfg)

    if stage == "full":
        fn = lambda s: C._grid_pass(s, cfg).pos          # noqa: E731
    elif stage == "blockstages":
        # Time the block pass's stages separately: structure+sort,
        # window gathers, Pallas dense kernel, corrections.
        bcfg = cfg.replace(collision_broad_phase="block")
        import nbodysim_tpu.kernels.collide_block as CB

        def run(tag, f, *args):
            g = jax.jit(f)
            t0 = time.time()
            out = jax.tree.map(np.asarray, g(*args))
            print(f"{tag}: compile+warm {time.time() - t0:.1f}s",
                  flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.tree.map(np.asarray, g(*args))
                best = min(best, time.perf_counter() - t0)
            print(f"{tag}: lap {best:.3f}s", flush=True)
            return out

        def structure(pos, radius):
            s = C._block_structure(pos, radius, bcfg)
            return (s["order"], s["start_row"], s["ok_blk"], s["w_lo"],
                    s["w_hi"])

        run("structure+sort", structure, state.pos, state.radius)

        def dense(pos, vel, mass, radius):
            st = C.ParticleState.create(pos=pos, vel=vel, mass=mass,
                                        radius=radius)
            out = C._block_pass(st, bcfg)
            return jnp.sum(out.pos)

        orig = C._exact_corrections
        C._exact_corrections = lambda dp, dv, *a, **k: (dp, dv)
        try:
            run("sort+gathers+kernel (no corrections)", dense,
                state.pos, state.vel, state.mass, state.radius)
        finally:
            C._exact_corrections = orig
        run("full block pass", dense, state.pos, state.vel, state.mass,
            state.radius)
        return
    elif stage == "blockpass":
        bcfg = cfg.replace(collision_broad_phase="block")
        over = C.collision_block_overflow(state, bcfg)
        print(f"block overflow at IC: {over}", flush=True)
        fn = lambda s: C._block_pass(s, bcfg).pos        # noqa: E731
    elif stage == "residual":
        def fn(s):
            pos, vel, mass, radius = s.pos, s.vel, s.mass, s.radius
            dim = pos.shape[1]
            cell = jnp.floor(pos / 2.58).astype(jnp.int32)
            # Force a full-cap overflow set: the first _OVERFLOW_CAP rows.
            m_cap = min(n, C._OVERFLOW_CAP)
            keep = jnp.arange(n) >= m_cap
            o_idx = jnp.argsort(keep)[:m_cap]
            o_valid = ~keep[o_idx]
            everyone = (pos, vel, mass, radius, cell)
            o = (pos[o_idx], vel[o_idx],
                 jnp.where(o_valid, mass[o_idx], 0.0),
                 radius[o_idx], cell[o_idx])
            dp_b, dv_b = C._cheb_pair_deltas_blocked(
                everyone, o, dim, cfg.collision_impulse)
            dp_c, dv_c = C._cheb_pair_deltas_blocked(
                o, everyone, dim, cfg.collision_impulse)
            return (jnp.sum(dp_b) + jnp.sum(dp_c)
                    + jnp.sum(dv_b) + jnp.sum(dv_c))
    else:
        # Re-create the pass's prefix stages standalone (mirrors
        # _grid_pass; collisions.py:195-392).
        window = cfg.collision_max_neighbors
        n_buckets = 1 << max(1, (2 * n - 1).bit_length())

        def prefix(s):
            pos, radius = s.pos, s.radius
            k_big = min(64, n)
            top_r, top_i = lax.top_k(radius, min(k_big + 1, n))
            cell_size = jnp.maximum(
                jnp.asarray(0.0, pos.dtype),
                jnp.maximum(2.05 * top_r[min(k_big, n - 1)], 1e-6))
            big_sel = top_r[:k_big] > 0.5 * cell_size
            is_big = jnp.zeros((n,), bool).at[top_i[:k_big]].set(big_sel)
            cell = jnp.floor(pos / cell_size).astype(jnp.int32)
            h = C._cell_hash(cell, n_buckets)
            order = jnp.argsort(h)
            from nbodysim_tpu.core.blocking import sorted_first_occurrence
            first = sorted_first_occurrence(h[order])
            rank = jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)
            in_win = (rank < window) & ~is_big[order]
            return cell, h, order, in_win, is_big

        if stage == "sort":
            def fn(s):
                cell, h, order, in_win, is_big = prefix(s)
                return (jnp.sum(in_win), jnp.sum(order), jnp.sum(cell))
        elif stage == "window":
            def fn(s):
                pos, vel, mass, radius = s.pos, s.vel, s.mass, s.radius
                dim = pos.shape[1]
                cell, h, order, in_win, is_big = prefix(s)
                h_sorted = h[order]
                pos_s, vel_s = pos[order], vel[order]
                mass_s, radius_s = mass[order], radius[order]
                cell_s = cell[order]
                offs = jnp.array(
                    [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                    jnp.int32) if dim == 2 else jnp.array(
                    [(dx, dy, dz) for dx in (-1, 0, 1)
                     for dy in (-1, 0, 1) for dz in (-1, 0, 1)], jnp.int32)
                n_off = offs.shape[0]

                def window_scan(tgt):
                    cell_t, pos_t, vel_t, mass_t, radius_t, inwin_t, \
                        sidx_t = tgt
                    b = sidx_t.shape[0]
                    nbr_cells = cell_t[:, None, :] + offs[None, :, :]
                    nbr_hash = C._cell_hash(nbr_cells, n_buckets)
                    starts = jnp.searchsorted(
                        h_sorted, nbr_hash.reshape(-1)).reshape(b, n_off)
                    win = jnp.arange(window, dtype=jnp.int32)
                    cand = (starts[:, :, None] + win[None, None, :]
                            ).reshape(b, n_off * window)
                    in_range = cand < n
                    cand = jnp.minimum(cand, n - 1)
                    cand_hash = h_sorted[cand]
                    want_hash = jnp.repeat(nbr_hash, window, axis=1)
                    want_cell = jnp.repeat(nbr_cells, window, axis=1)
                    cand_cell = cell_s[cand]
                    cell_match = jnp.all(cand_cell == want_cell, axis=-1)
                    valid = (in_range & (cand_hash == want_hash)
                             & cell_match & (cand != sidx_t[:, None])
                             & inwin_t[:, None] & in_win[cand])
                    d = pos_s[cand] - pos_t[:, None, :]
                    v = vel_s[cand] - vel_t[:, None, :]
                    m_j = mass_s[cand]
                    msum = mass_t[:, None] + m_j
                    valid = valid & (msum > 0)
                    w1 = jnp.where(
                        valid, m_j / jnp.where(msum > 0, msum, 1.0), 0.0)
                    r = radius_t[:, None] + radius_s[cand]
                    dpos, dvel = C._pair_deltas(
                        d, v, w1, r, valid, cfg.collision_impulse)
                    return jnp.sum(dpos, axis=1), jnp.sum(dvel, axis=1)

                sidx = jnp.arange(n, dtype=jnp.int32)
                tgt_full = (cell_s, pos_s, vel_s, mass_s, radius_s,
                            in_win, sidx)
                chunk = C._WINDOW_CHUNK
                if n > chunk:
                    pad = (-n) % chunk

                    def prep(a):
                        if pad:
                            a = jnp.pad(
                                a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
                        return a.reshape(-1, chunk, *a.shape[1:])

                    dpos_s, dvel_s = lax.map(
                        window_scan, tuple(prep(a) for a in tgt_full))
                    dpos_s = dpos_s.reshape(-1, dim)[:n]
                else:
                    dpos_s, dvel_s = window_scan(tgt_full)
                return jnp.sum(dpos_s)
        elif stage == "big":
            def fn(s):
                pos, vel, mass, radius = s.pos, s.vel, s.mass, s.radius
                dim = pos.shape[1]
                cell, h, order, in_win, is_big = prefix(s)
                pos_s, vel_s = pos[order], vel[order]
                mass_s, radius_s = mass[order], radius[order]
                cell_s = cell[order]
                big_s = is_big[order]
                k_big = min(64, n)
                top_r, top_i = lax.top_k(radius, min(k_big + 1, n))
                cell_size = jnp.maximum(
                    jnp.asarray(0.0, pos.dtype),
                    jnp.maximum(2.05 * top_r[min(k_big, n - 1)], 1e-6))
                big_sel = top_r[:k_big] > 0.5 * cell_size
                top_i = top_i[:k_big]
                everyone = (pos_s, vel_s, mass_s, radius_s, cell_s)
                big_src = (pos[top_i], vel[top_i],
                           jnp.where(big_sel, mass[top_i], 0.0),
                           radius[top_i], cell[top_i])
                dp_b1, dv_b1 = C._cheb_pair_deltas_blocked(
                    everyone, big_src, dim, cfg.collision_impulse,
                    max_cheb=None)
                small_src = (pos_s, vel_s, jnp.where(big_s, 0.0, mass_s),
                             radius_s, cell_s)
                dp_b2, dv_b2 = C._cheb_pair_deltas_blocked(
                    big_src, small_src, dim, cfg.collision_impulse,
                    max_cheb=None)
                return jnp.sum(dp_b1) + jnp.sum(dp_b2)
        else:
            raise SystemExit(f"unknown stage {stage}")

    f = jax.jit(fn)
    t0 = time.time()
    out = f(state)
    out = jax.tree.map(np.asarray, out)
    print(f"OK stage={stage} n={n} compile+warm {time.time() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    jax.tree.map(np.asarray, f(state))
    print(f"OK lap {time.perf_counter() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
