"""In-context A/B of the cellpad epoch costs: run the production 400-step
runner with pieces disabled (physically wrong, timing only)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup
from obmd_tpu import engine_cellpad as ec


def rate(cfg, state, nsteps=400):
    run = ec.make_run_cellpad(cfg, nsteps)
    s = run(state)
    np.asarray(s.x)
    t0 = time.perf_counter()
    s = run(s)
    np.asarray(s.x)
    dt = time.perf_counter() - t0
    return dt / nsteps * 1e3, nsteps / dt * int(s.natoms) / 1e6


def main():
    sc = scenes.obmd_dpd_scene(scale=float(os.environ.get("BENCH_SCALE", "8")),
                               seed=7)
    cfg = sc.cfg.finalize()
    state = setup(cfg, sc.state)
    state = equilibrate(cfg, state, 1500)
    np.asarray(state.x)

    ms, mps = rate(cfg, state)
    print("A normal            %.3f ms/step  %.2f Mps/s" % (ms, mps))

    real_relayout = ec.relayout_incremental
    ec.relayout_incremental = lambda geom, box, s, has_bonds=True: s
    ms, mps = rate(cfg, state)
    print("B no relayout       %.3f ms/step  %.2f Mps/s" % (ms, mps))
    ec.relayout_incremental = real_relayout

    real_note = ec.note_skin_check
    ec.note_skin_check = lambda box, skin, s: s
    ms, mps = rate(cfg, state)
    print("C no skin check     %.3f ms/step  %.2f Mps/s" % (ms, mps))
    ec.note_skin_check = real_note


if __name__ == "__main__":
    main()
