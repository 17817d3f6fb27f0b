"""TPU parameter sweep for the flagship bench: (cell_capacity, skin,
rebuild_every) matrix, each measured with the production fused runner.
Run when the chip is available; prints one table line per config."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.observe import check_invariants


def rate(cfg, state, nsteps=400):
    run = ec.make_run_cellpad(cfg, nsteps)
    s = run(state)
    np.asarray(s.x)
    t0 = time.perf_counter()
    s = run(s)
    np.asarray(s.x)
    dt = time.perf_counter() - t0
    try:
        check_invariants(cfg, s)
        ok = "ok"
    except RuntimeError as e:
        ok = "VIOLATION"
    return nsteps / dt * int(s.natoms) / 1e6, ok


def main():
    scale = float(os.environ.get("BENCH_SCALE", "8"))
    configs = [
        # (cell_capacity, skin, rebuild_every-override)  0 = auto
        (24, 0.4, 0),     # current production
        (20, 0.4, 0),
        (18, 0.4, 0),
        (24, 0.3, 0),
        (20, 0.3, 0),
        (24, 0.5, 0),
    ]
    for cap, skin, r_every in configs:
        try:
            sc = scenes.obmd_dpd_scene(scale=scale, seed=7,
                                       cell_capacity=cap, skin=skin)
            cfg = sc.cfg.finalize()
            if r_every:
                import dataclasses
                cfg = dataclasses.replace(cfg, rebuild_every=r_every)
            state = setup(cfg, sc.state)
            state = equilibrate(cfg, state, 1500)
            np.asarray(state.x)
            mps, ok = rate(cfg, state)
            print(f"cap={cap} skin={skin} r_every={r_every or 'auto'}: "
                  f"{mps:.2f} Mps/s [{ok}]", flush=True)
        except Exception as e:
            print(f"cap={cap} skin={skin}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
