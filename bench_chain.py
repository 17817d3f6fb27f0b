"""The reference's chain headline benchmark: FENE bead-spring melt, 32k
beads (code/bench/in.chain + data.chain; published: 102.286 steps/s = 3.27
Mparticle-steps/s on one 2016 CPU core, log.6Oct16.chain.fixed.icc.1).

Same physics (WCA pair with special_bonds fene exclusion, bond fene
30/1.5/1/1, Langevin T=1 damp=10, dt=0.012) on one TPU chip via the cellpad
Pallas engine + symmetric per-slot FENE evaluation.
"""
import json
import os
import time


def main():
    import numpy as np

    from obmd_tpu import scenes
    from obmd_tpu.integrate import make_run, setup

    nsteps = int(os.environ.get("BENCH_CHAIN_STEPS", "400"))
    sc = scenes.chain_scene()
    state = setup(sc.cfg, sc.state)
    run = make_run(sc.cfg, nsteps)
    state = run(state)
    _ = np.asarray(state.x)

    start = int(state.step)
    t0 = time.perf_counter()
    state = run(state)
    _ = np.asarray(state.x)
    wall = time.perf_counter() - t0
    steps_done = int(state.step) - start

    # Loud validity gate (same as bench.py): overflow/stale layout voids it.
    from obmd_tpu.observe import check_invariants
    check_invariants(sc.cfg, state)

    natoms = int(state.natoms)
    steps_s = steps_done / wall
    print(json.dumps({
        "metric": "FENE chain steps/s (%dk beads, 1 chip)" % (natoms // 1000),
        "value": round(steps_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_s / 102.286, 3),
        "mparticle_steps_per_s": round(steps_s * natoms / 1e6, 3),
    }))


if __name__ == "__main__":
    main()
