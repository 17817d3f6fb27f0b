"""Round-5 kernel-in-context attribution: the bare-kernel scans
(prof_ab3.py, prof_r4.py kernel-only) measure MORE than the whole
production step, so they are not a valid decomposition.  Here the kernel
cost is measured by substitution inside the REAL production run:
baseline vs the same run with the pallas call returning zeros (everything
else — pack, boundary force, integrate, stage, relayout — unchanged).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cellpad import layout_build
from obmd_tpu.forces import pallas_dpd


def rate(run, state, nsteps):
    s = run(state)
    np.asarray(s.x)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        s2 = run(s)
        np.asarray(s2.x)
        best = min(best, time.perf_counter() - t0)
    return best / nsteps * 1e3


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
    print("natoms", n, "cap", cap, "geom dims", geom.dims, "nb",
          geom.n_blocks, "lanes", geom.lanes, "n_slots", geom.n_slots)

    t_prod = rate(ec.make_run_cellpad(cfg, nsteps), state, nsteps)
    print("production        %.3f ms/step  (%.2f Mps/s)"
          % (t_prod, n / t_prod / 1e3))

    # kernel -> zeros (same signature, same wrapper), rest identical.
    # engine_cellpad binds make_pair_kernel by name at import, so patch
    # ITS reference.
    real = ec.make_pair_kernel

    def fake(geom_, **kw):
        nb, cap_, lanes = geom_.n_blocks, geom_.cap, geom_.lanes

        def zero_fn(fld, tag, salt, occ, pbond=None, sig_scale=None):
            return jnp.zeros((nb, 3, cap_, lanes), jnp.float32) \
                + 1e-30 * fld[:, :3]
        return zero_fn

    ec.make_pair_kernel = fake
    try:
        t_nok = rate(ec.make_run_cellpad(cfg, nsteps), state, nsteps)
    finally:
        ec.make_pair_kernel = real
    print("kernel-as-zeros   %.3f ms/step  -> kernel-in-context %.3f ms"
          % (t_nok, t_prod - t_nok))


if __name__ == "__main__":
    main()
