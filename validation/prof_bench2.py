"""Secondary-bench tuning sweep (LJ melt + FENE chain): skin / cell
capacity / relayout period, each measured with the production runner and
gated by check_invariants.  Chain configs with cap < the t=0 data-file
occupancy are warmed at the file layout first and repacked (the melted
liquid is far more uniform than the as-read chain coil packing)."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from obmd_tpu import scenes
from obmd_tpu.integrate import make_run, setup
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cellpad import layout_build
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
        ok = "VIOLATION " + str(e)[:70]
    n = int(s.natoms)
    return nsteps / dt, nsteps / dt * n / 1e6, ok


def main():
    which = os.environ.get("SWEEP", "lj,chain")
    if "lj" in which:
        print("== LJ melt 32k ==", flush=True)
        for skin, cap, r_ev in [(0.3, 40, 0), (0.55, 40, 0), (0.55, 32, 0),
                                (0.55, 32, 6), (0.55, 32, 8)]:
            try:
                sc = scenes.lj_melt_scene(skin=skin, cell_capacity=cap,
                                          rebuild_every=r_ev)
                st = setup(sc.cfg, sc.state)
                sps, mps, ok = rate(sc.cfg, st)
                print(f"lj skin={skin} cap={cap} r={r_ev or 'auto'}: "
                      f"{sps:.1f} steps/s {mps:.2f} Mps/s [{ok}]", flush=True)
            except Exception as e:
                print(f"lj skin={skin} cap={cap}: FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
    if "chain" in which:
        print("== FENE chain 32k ==", flush=True)
        # warm at the file-packing-safe cap, then repack tight
        base = scenes.chain_scene()
        st0 = setup(base.cfg, base.state)
        warm = make_run(base.cfg, 400)
        st0 = warm(st0)
        np.asarray(st0.x)
        for skin, cap, r_ev in [(0.98, 34, 0), (0.98, 16, 0), (0.98, 16, 6),
                                (0.98, 16, 8), (1.28, 24, 0)]:
            try:
                sc = scenes.chain_scene(skin=skin, cell_capacity=cap)
                cfg = dataclasses.replace(sc.cfg,
                                          rebuild_every=r_ev).finalize()
                geom = ec.make_geometry(cfg)
                st = jax.jit(lambda s: layout_build(geom, cfg.box, s))(st0)
                sps, mps, ok = rate(cfg, st)
                print(f"chain skin={skin} cap={cap} r={r_ev or 'auto'}: "
                      f"{sps:.1f} steps/s {mps:.2f} Mps/s [{ok}]", flush=True)
            except Exception as e:
                print(f"chain skin={skin} cap={cap}: FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
