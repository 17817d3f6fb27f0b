"""Benchmark: Mparticle-steps/s on the north-star workload — 100k-particle
OBMD_DPD open-boundary run on one chip (BASELINE.md: target >= 50 Mps/s on
TPU v5e; the reference's own anchor is 1.41 Mps/s for 32k-atom LJ on one
2016 CPU core).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 50 (the north-star target).
"""
import json
import os
import sys
import time


def main():
    import jax

    from obmd_tpu import scenes
    from obmd_tpu.integrate import make_run, setup

    scale = float(os.environ.get("BENCH_SCALE", "8"))   # 8 -> ~101k atoms
    nsteps = int(os.environ.get("BENCH_STEPS", "200"))
    warm = int(os.environ.get("BENCH_WARMUP", "50"))

    sc = scenes.obmd_dpd_scene(scale=scale, seed=7)
    state = setup(sc.cfg, sc.state)
    natoms = int(state.natoms)

    run_warm = make_run(sc.cfg, warm)
    state = run_warm(state)
    jax.block_until_ready(state.x)

    run = make_run(sc.cfg, nsteps)
    state = run(state)            # compile
    jax.block_until_ready(state.x)

    t0 = time.perf_counter()
    state = run(state)
    jax.block_until_ready(state.x)
    dt_wall = time.perf_counter() - t0

    steps_per_s = nsteps / dt_wall
    mps = steps_per_s * natoms / 1e6
    print(json.dumps({
        "metric": "OBMD_DPD Mparticle-steps/s (1 chip, %dk atoms)" % (natoms // 1000),
        "value": round(mps, 3),
        "unit": "Mparticle-steps/s",
        "vs_baseline": round(mps / 50.0, 4),
    }))


if __name__ == "__main__":
    main()
