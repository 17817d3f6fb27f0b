"""The reference's own headline benchmark: LJ melt, 32k atoms, 100 steps
(code/bench/in.lj; published: 44.212 steps/s = 1.41 Mparticle-steps/s on
one 2016 CPU core, log.6Oct16.lj.fixed.icc.1; 157.2 steps/s on 4 cores).

Runs the same physics (fcc @ rho*=0.8442, T0=1.44, rc=2.5, dt=0.005, NVE)
on one TPU chip via the cellpad Pallas engine and prints one JSON line.
"""
import json
import os
import time


def main():
    import numpy as np

    from obmd_tpu import scenes
    from obmd_tpu.integrate import make_run, setup

    nx = int(os.environ.get("BENCH_LJ_NX", "20"))   # 4*nx^3 atoms
    nsteps = int(os.environ.get("BENCH_LJ_STEPS", "400"))

    sc = scenes.lj_melt_scene(nx=nx)
    state = setup(sc.cfg, sc.state)
    run = make_run(sc.cfg, nsteps)
    state = run(state)
    _ = np.asarray(state.x)

    start_step = int(state.step)
    t0 = time.perf_counter()
    state = run(state)
    _ = np.asarray(state.x)
    wall = time.perf_counter() - t0
    steps_done = int(state.step) - start_step

    # Loud validity gate (same as bench.py): overflow/stale layout voids it.
    from obmd_tpu.observe import check_invariants
    check_invariants(sc.cfg, state)

    natoms = int(state.natoms)
    steps_s = steps_done / wall
    mps = steps_s * natoms / 1e6
    print(json.dumps({
        "metric": "LJ melt steps/s (%dk atoms, 1 chip)" % (natoms // 1000),
        "value": round(steps_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_s / 44.212, 3),   # ref 1-core published
        "mparticle_steps_per_s": round(mps, 3),
    }))


if __name__ == "__main__":
    main()
