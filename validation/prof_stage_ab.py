"""In-graph bisect of the OBMD stage at production scale: run the fused
runner with individual stage pieces stubbed out (physically wrong, timing
only) and subtract."""
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
from obmd_tpu.obmd import stage as st_mod


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
    cfg = dataclasses.replace(
        cfg, capacity=dataclasses.replace(cfg.capacity,
                                          cell_capacity=cap)).finalize()
    geom = ec.make_geometry(cfg)
    state = jax.jit(lambda s: layout_build(geom, cfg.box, s))(state)

    ms, mps = rate(cfg, state)
    print("A normal              %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)

    real = ec.delete_outside
    ec.delete_outside = lambda cfg, s: (s, jnp.zeros(3, s.x.dtype),
                                        jnp.zeros(3, s.x.dtype))
    ms, mps = rate(cfg, state)
    print("B no delete           %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)
    ec.delete_outside = real

    real = ec.region_count
    ec.region_count = lambda s, r, g=None: jnp.int32(1200)
    ms, mps = rate(cfg, state)
    print("C no census           %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)
    ec.region_count = real

    from obmd_tpu.obmd.subset import Subset
    real = ec._subset_slice

    def fake_subset(cfg, geom, state, region, pad):
        b_max = 4096
        return Subset(idx=jnp.zeros(b_max, jnp.int32),
                      x=jnp.full((b_max, 3), 1e8, state.x.dtype),
                      type=jnp.zeros(b_max, jnp.int32),
                      q=jnp.zeros(b_max, state.x.dtype),
                      valid=jnp.zeros(b_max, bool),
                      overflow=jnp.zeros((), bool))
    ec._subset_slice = fake_subset
    ms, mps = rate(cfg, state)
    print("D no subset build     %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)
    ec._subset_slice = real

    real = ec._insert

    def fake_insert(cfg, geom, s, nl, nr, sl, sr):
        z = jnp.zeros(3, s.x.dtype)
        return s, z, z
    ec._insert = fake_insert
    ms, mps = rate(cfg, state)
    print("E no insert           %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)
    ec._insert = real

    real = ec._boundary_force_sliced
    ec._boundary_force_sliced = lambda cfg, geom, s, f: f
    ms, mps = rate(cfg, state)
    print("F no boundary force   %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)
    ec._boundary_force_sliced = real

    real = ec._region_count_sliced
    ec._region_count_sliced = lambda cfg, geom, s, r: jnp.int32(
        int(0.7 * cfg.obmd.nbuf))
    ms, mps = rate(cfg, state)
    print("G census=setpoint     %.3f ms/step  %.2f Mps/s" % (ms, mps),
          flush=True)
    ec._region_count_sliced = real


if __name__ == "__main__":
    main()
