"""Benchmark: Mparticle-steps/s on the north-star workload — ~100k-particle
OBMD_DPD open-boundary run on one chip (BASELINE.md: target >= 50 Mps/s on
TPU v5e; the reference's own strongest published anchor is 1.41 Mps/s for
32k-atom LJ on one CPU core, bench/log.6Oct16.lj.fixed.icc.1).

Runs the cellpad engine (padded cell-major state + Pallas slab DPD kernel).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / 50 (the north-star target).
"""
import json
import os
import time


def main():
    import jax
    import numpy as np

    from obmd_tpu import scenes
    from obmd_tpu.integrate import equilibrate, make_run, setup

    scale = float(os.environ.get("BENCH_SCALE", "8"))   # 8 -> ~101k atoms
    nsteps = int(os.environ.get("BENCH_STEPS", "400"))
    equil = int(os.environ.get("BENCH_EQUIL", "1500"))

    sc = scenes.obmd_dpd_scene(scale=scale, seed=7)
    state = setup(sc.cfg, sc.state)
    state = equilibrate(sc.cfg, state, equil)
    _ = np.asarray(state.x)

    run = make_run(sc.cfg, nsteps)
    state = run(state)            # compile + settle
    _ = np.asarray(state.x)

    start_step = int(state.step)
    t0 = time.perf_counter()
    state = run(state)
    _ = np.asarray(state.x)      # force full sync through the transport
    dt_wall = time.perf_counter() - t0
    steps_done = int(state.step) - start_step

    natoms = int(state.natoms)
    mps = steps_done / dt_wall * natoms / 1e6
    print(json.dumps({
        "metric": "OBMD_DPD Mparticle-steps/s (1 chip, %dk atoms)" % (natoms // 1000),
        "value": round(mps, 3),
        "unit": "Mparticle-steps/s",
        "vs_baseline": round(mps / 50.0, 4),
    }))


if __name__ == "__main__":
    main()
