"""AOT memory analysis of the 2D config-5 force eval (r5 OOM check).

bench.py --config 5 (N=4M galaxy merger, BH + deep + tiles) OOMed HBM in
r5: feeding the standard Pallas all-pairs kernel a [4M, 2] target operand
forced a {1,0} dense operand layout (2 GB tile-padded copy, 64x
expansion) and the constraint propagated {1,0} layouts onto every
[N, 1]/[N, 2] temp of the tree graph — 13 such 2 GB remat copies = a
27 GB program on a 15.75 GB chip. This compiles the same force eval
WITHOUT committing to the full bench and prints XLA's memory analysis,
so the transposed-IO fix (kernels/allpairs.allpairs_accelerations_wide)
can be validated cheaply; if the numbers fit it runs one real eval+lap.

Usage: /tmp/tpu_retry.sh /tmp/aot2d.log python scripts/aot_mem2d.py [N]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax                                              # noqa: E402
import numpy as np                                      # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22


def main():
    from nbodysim_tpu.config import SimConfig
    from nbodysim_tpu.physics.forces import (
        compute_accelerations, resolve_config_for_state)
    from nbodysim_tpu.scenes import init_scene

    cfg = SimConfig(n=N, dim=2, dt=0.05, integrator="leapfrog_kdk",
                    force_backend="bh", bh_deep_levels=-1,
                    enable_collisions=False)
    state = init_scene("galaxy_merger", cfg)
    cfg = resolve_config_for_state(state.pos, state.mass, cfg)
    print(f"resolved: backend={cfg.force_backend} levels={cfg.bh_levels} "
          f"deep={cfg.bh_deep_levels} tiles={cfg.bh_tile_levels}",
          flush=True)

    def acc(p, m):
        return compute_accelerations(p, m, cfg)

    t0 = time.time()
    compiled = jax.jit(acc).lower(state.pos, state.mass).compile()
    print(f"compiled in {time.time() - t0:.1f}s", flush=True)
    ma = compiled.memory_analysis()
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"{k}: {v / 1e9:.3f} GB", flush=True)
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
