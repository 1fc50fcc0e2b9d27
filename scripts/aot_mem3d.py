"""AOT memory analysis of the 3D clustered force eval (r4 OOM check).

bench3d_clustered's N=1M deep-chain eval OOMed HBM on the width-1
lane-minor space-to-depth temps (450 MB per remat copy). This compiles
the same force eval WITHOUT running it and prints XLA's memory analysis,
so the fix can be validated before risking a real 16 GB allocation.

Usage: scripts/tpu_retry.sh /tmp/aot_mem3d.log python scripts/aot_mem3d.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax                                              # noqa: E402
import numpy as np                                      # noqa: E402

N = 1 << 20


def main():
    from nbodysim_tpu.config import SimConfig
    from nbodysim_tpu.physics.forces import (
        compute_accelerations, resolve_config_for_state)
    from nbodysim_tpu.scenes import init_scene

    cfg = SimConfig(n=N, dim=3, dt=0.05, integrator="leapfrog_kdk",
                    force_backend="bh", enable_collisions=False)
    state = init_scene("galaxy_merger", cfg)
    cfg = resolve_config_for_state(state.pos, state.mass,
                                   cfg.replace(force_backend="auto"))
    print(f"resolved: backend={cfg.force_backend} levels={cfg.bh_levels} "
          f"deep={cfg.bh_deep_levels} tiles={cfg.bh_tile_levels}",
          flush=True)
    def acc(p, m):
        return compute_accelerations(p, m, cfg)

    t0 = time.time()
    compiled = jax.jit(acc).lower(state.pos, state.mass).compile()
    print(f"compiled in {time.time() - t0:.1f}s", flush=True)
    ma = compiled.memory_analysis()
    print(ma, flush=True)
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"{k}: {v / 1e9:.3f} GB", flush=True)
    # If the compile-side numbers fit, run one real eval + lap.
    t0 = time.time()
    out = compiled(state.pos, state.mass)
    s = float(np.asarray(out.sum()))
    print(f"eval ok checksum={s:.3e} warm {time.time() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    np.asarray(compiled(state.pos, state.mass).sum())
    print(f"lap {time.perf_counter() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
