"""In-context timing of the pair-noise hash depth: production (3
avalanche rounds) vs lite (multiplicative mix + 1 round) inside the REAL
production run — the decision input for whether a cheaper hash is worth
re-running the golden gate over."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cellpad import layout_build


def rate(run, state, nsteps):
    s = run(state)
    np.asarray(s.x)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s2 = run(s)
        np.asarray(s2.x)
        best = min(best, time.perf_counter() - t0)
    return best / nsteps * 1e3


def main():
    scale = float(os.environ.get("BENCH_SCALE", "9"))
    cap = int(os.environ.get("BENCH_CAP", "15"))
    nsteps = 400
    sc = scenes.obmd_dpd_scene(scale=scale, seed=7)
    state = setup(sc.cfg, sc.state)
    state = equilibrate(sc.cfg, state, 1500)
    np.asarray(state.x)
    cfg = dataclasses.replace(
        sc.cfg, capacity=dataclasses.replace(
            sc.cfg.capacity, cell_capacity=cap)).finalize()
    geom = ec.make_geometry(cfg)
    state = jax.jit(lambda s: layout_build(geom, cfg.box, s))(state)
    n = int(state.natoms)
    print("natoms", n)

    real = ec.make_pair_kernel
    for name, var in (("hash-full", None), ("hash-lite", {"hash": "lite"}),
                      ("hash-full2", None)):
        def mk(geom_, **kw):
            if var:
                kw = dict(kw, variant=var)
            return real(geom_, **kw)
        ec.make_pair_kernel = mk
        try:
            t = rate(ec.make_run_cellpad(cfg, nsteps), state, nsteps)
        finally:
            ec.make_pair_kernel = real
        print("%-10s %.3f ms/step  (%.2f Mps/s)" % (name, t, n / t / 1e3))


if __name__ == "__main__":
    main()
