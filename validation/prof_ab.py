"""In-context A/B of the production runner's epoch costs: run the 400-step
fused runner with pieces disabled (physically wrong, timing only).
Standalone jit timings of the relayout have twice misled (non-donated
buffer copies dominate them); this in-graph subtraction is the only
honest per-component number."""
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
    cap = int(os.environ.get("BENCH_CAP", "16"))
    sc = scenes.obmd_dpd_scene(scale=float(os.environ.get("BENCH_SCALE", "8")),
                               seed=7)
    cfg = sc.cfg.finalize()
    state = setup(cfg, sc.state)
    state = equilibrate(cfg, state, 1500)
    np.asarray(state.x)
    if cap != cfg.capacity.cell_capacity:
        cfg = dataclasses.replace(
            cfg, capacity=dataclasses.replace(cfg.capacity,
                                              cell_capacity=cap)).finalize()
        geom = ec.make_geometry(cfg)
        state = jax.jit(lambda s: layout_build(geom, cfg.box, s))(state)

    ms, mps = rate(cfg, state)
    print("A normal            %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)

    real_relayout = ec.relayout_incremental
    ec.relayout_incremental = lambda geom, box, s, **kw: s
    ms, mps = rate(cfg, state)
    print("B no relayout       %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)
    ec.relayout_incremental = real_relayout

    real_note = ec.note_skin_check
    ec.note_skin_check = lambda box, skin, s: s
    ms, mps = rate(cfg, state)
    print("C no skin check     %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)
    ec.note_skin_check = real_note

    real_stage = ec._obmd_stage
    ec._obmd_stage = lambda cfg, geom, s, with_rebuild=True: s
    ms, mps = rate(cfg, state)
    print("D no OBMD stage     %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)
    ec._obmd_stage = real_stage

    real_forces = ec._forces
    ec._forces = lambda cfg, geom, kern, s: s.f
    ms, mps = rate(cfg, state)
    print("E no forces         %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)
    ec._forces = real_forces


if __name__ == "__main__":
    main()
