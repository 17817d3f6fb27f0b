"""Clean component A/B at two cell capacities: equilibrate once at cap=24
(the uniform random t=0 gas needs Poisson headroom), repack the equilibrated
liquid into each candidate layout, and time relayout / fused step / the
production runner separately.  Run on the chip."""
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
from obmd_tpu.cellpad import layout_build, relayout_incremental
from obmd_tpu.observe import check_invariants


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
    sc = scenes.obmd_dpd_scene(scale=scale, seed=7, cell_capacity=24)
    cfg0 = sc.cfg.finalize()
    state0 = setup(cfg0, sc.state)
    state0 = equilibrate(cfg0, state0, 1500)
    np.asarray(state0.x)

    for cap in (24, 16):
        cfg = dataclasses.replace(
            cfg0, capacity=dataclasses.replace(cfg0.capacity,
                                               cell_capacity=cap)).finalize()
        geom = ec.make_geometry(cfg)
        kern = ec._make_kernel(cfg, geom)
        state = jax.jit(lambda s: layout_build(geom, cfg.box, s))(state0)
        flags = ec.relayout_flags(cfg)

        relay = jax.jit(lambda s: relayout_incremental(geom, cfg.box, s,
                                                       **flags))
        step_full = jax.jit(lambda s: ec._plain_step(cfg, geom, kern, s))
        step_nost = jax.jit(lambda s: ec._plain_step(cfg, geom, kern, s,
                                                     with_stage=False))
        print(f"--- cap={cap} (r_every {ec.auto_rebuild_every(cfg)}, "
              f"n_slots {geom.n_slots}) ---", flush=True)
        print("relayout_incremental  %.3f ms" % timeit(relay, state),
              flush=True)
        print("step (no stage)       %.3f ms" % timeit(step_nost, state),
              flush=True)
        print("step (with stage)     %.3f ms" % timeit(step_full, state),
              flush=True)

        run = ec.make_run_cellpad(cfg, 400)
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
            ok = "VIOLATION " + str(e)[:80]
        print("run 400: %.3f ms/step, %.2f Mps/s [%s]"
              % (dt / 400 * 1e3, 400 / dt * int(s.natoms) / 1e6, ok),
              flush=True)


if __name__ == "__main__":
    main()
