"""Per-component timing of the cellpad runner at bench scale (v5e).

Times, separately jitted with anti-hoist data deps:
  - relayout_incremental (the per-epoch cost)
  - one fused step without the OBMD stage
  - one fused step with the OBMD stage
  - the production run() rate for reference
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cellpad import relayout_incremental


def timeit(fn, state, iters=30):
    s = fn(state)
    np.asarray(s.x)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    np.asarray(s.x)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    scale = float(os.environ.get("BENCH_SCALE", "8"))
    sc = scenes.obmd_dpd_scene(scale=scale, seed=7)
    cfg = sc.cfg.finalize()
    state = setup(cfg, sc.state)
    state = equilibrate(cfg, state, 1500)
    np.asarray(state.x)
    print("natoms", int(state.natoms), "r_every", ec.auto_rebuild_every(cfg))

    geom = ec.make_geometry(cfg)
    kern = ec._make_kernel(cfg, geom)
    has_bonds = False

    relay = jax.jit(lambda s: relayout_incremental(geom, cfg.box, s,
                                                   has_bonds=has_bonds))
    step_full = jax.jit(lambda s: ec._plain_step(cfg, geom, kern, s))
    step_nost = jax.jit(lambda s: ec._plain_step(cfg, geom, kern, s,
                                                 with_stage=False))

    print("relayout_incremental  %.3f ms" % timeit(relay, state))
    print("step (no stage)       %.3f ms" % timeit(step_nost, state))
    print("step (with stage)     %.3f ms" % timeit(step_full, state))

    run = ec.make_run_cellpad(cfg, 400)
    s = run(state)
    np.asarray(s.x)
    t0 = time.perf_counter()
    s = run(s)
    np.asarray(s.x)
    dt = time.perf_counter() - t0
    print("run 400 steps: %.1f ms total, %.3f ms/step, %.2f Mps/s"
          % (dt * 1e3, dt / 400 * 1e3,
             400 / dt * int(s.natoms) / 1e6))


if __name__ == "__main__":
    main()
