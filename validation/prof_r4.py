"""Round-4 attribution profile at the EXACT bench.py production config
(equilibrated scene repacked to cap 16).

Times 400-step fused runs under controlled deltas:
  - production run (bench baseline)
  - stage disabled        -> OBMD stage cost/step
  - r_every x2            -> relayout amortized cost/step
  - kernel-only scan      -> pair kernel cost/step (no integrate/stage)
"""
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
    t0 = time.perf_counter()
    s = run(s)
    np.asarray(s.x)
    dt = time.perf_counter() - t0
    return dt / nsteps * 1e3


def main():
    scale = float(os.environ.get("BENCH_SCALE", "8"))
    cap = int(os.environ.get("BENCH_CAP", "16"))
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
    r_every = ec.auto_rebuild_every(cfg)
    print("natoms", n, "cap", cap, "r_every", r_every)

    t_prod = rate(ec.make_run_cellpad(cfg, nsteps), state, nsteps)
    print("production        %.3f ms/step  (%.2f Mps/s)" % (t_prod, n / t_prod / 1e3))

    # stage off: same engine, obmd config stripped (open box ignored for timing)
    cfg_ns = dataclasses.replace(cfg, obmd=None).finalize()
    try:
        t_ns = rate(ec.make_run_cellpad(cfg_ns, nsteps), state, nsteps)
        print("stage disabled    %.3f ms/step  -> stage %.3f ms/step" % (t_ns, t_prod - t_ns))
    except Exception as e:
        print("stage-off variant failed:", e)

    # relayout halved in frequency
    cfg_r2 = dataclasses.replace(cfg, rebuild_every=2 * r_every).finalize()
    t_r2 = rate(ec.make_run_cellpad(cfg_r2, nsteps), state, nsteps)
    print("r_every x2        %.3f ms/step  -> relayout/step ~ %.3f ms" % (t_r2, 2 * (t_prod - t_r2)))

    # forces-only scan (pair kernel + boundary force + field pack)
    kern = ec._make_kernel(cfg, geom)

    @jax.jit
    def kernel_scan(s):
        def body(carry, _):
            st = carry
            f = ec._forces(cfg, geom, kern, st)
            # cheap data dep to stop hoisting
            st = st.replace(v=st.v + 1e-30 * f)
            return st, None
        s, _ = jax.lax.scan(body, s, None, length=100)
        return s

    s2 = kernel_scan(state)
    np.asarray(s2.v)
    t0 = time.perf_counter()
    s2 = kernel_scan(state)
    np.asarray(s2.v)
    t_k = (time.perf_counter() - t0) / 100 * 1e3
    print("kernel-only       %.3f ms/step" % t_k)


if __name__ == "__main__":
    main()
