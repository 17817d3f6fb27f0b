"""Momentum-conservation audit for the OBMD stage.

The OBMD force law conserves total x-momentum exactly in exact arithmetic:
deleted momentum is re-injected via vnew/dt, +pxx*A (left) cancels -pxx*A
(right), insertion adds rest-mass only.  The golden runs instead develop a
systematic leftward wind (vx ~ -0.013 by 60-120k steps), so something leaks
-x momentum.  This script runs the real OBMD_DPD deck and tracks, per step,
with float64 accumulators:

  px_after - px_before                       (actual)
  dt/2 * [sum f_before + sum f_after]        (what the kicks inject)
  px of atoms deleted this step              (tally check)
  sum of f_after vs (mfl+mfr+sfl+sfr)        (force-sum invariant)

Any systematic gap localizes the leak.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import os
if os.environ.get("AUDIT_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["AUDIT_PLATFORM"]
import jax
if os.environ.get("AUDIT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["AUDIT_PLATFORM"])
import jax.numpy as jnp

from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig, UsherParams
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.io import lammps_data
from obmd_tpu.state import init_state


def build_cfg(force_path="nlist", mode="usher", pxx=188.0):
    df = lammps_data.read_data(
        "/root/reference/examples/OBMD_DPD/dpd_8map_obmd.data")
    xhi, yhi, zhi = (float(v) for v in df.box_hi)
    buf = 0.15 * xhi
    box = Box((0.0, 0.0, 0.0), (xhi, yhi, zhi), (False, True, True))
    r1 = RegionBlock((0.0, 0.0, 0.0), (buf, yhi, zhi))
    r2 = RegionBlock((xhi - buf, 0.0, 0.0), (xhi, yhi, zhi))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=8893, a0=209.6,
                            gamma=4.5, ntypes=1)
    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=777, pxx=pxx, alpha=0.7, tau=0.005,
        nbuf=1327.0, region1=r1, region2=r2, region3=deg, region4=deg,
        region5=r1, region6=r2, buffer_size=buf, g_fac=0.25, maxattempt=1,
        usher=(UsherParams(etarget=31.03, ds0=1.0, dtheta0=0.02, uovlp=1e4,
                           dsovlp=1.5, eps=1.0, nattempt=40)
               if mode == "usher" else None),
        near=(0.35 if mode == "near" else None),
        insert_kmax=16)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.001464,
                      capacity=Capacity(n_max=int(df.natoms * 1.3),
                                        max_neighbors=72, cell_capacity=24),
                      obmd=obmd, force_path=force_path).finalize()
    return cfg, df


def main(nsteps=2000, force_path="nlist", report_every=100):
    cfg, df = build_cfg(force_path=force_path)
    state = init_state(cfg, df.x, v=df.v, types=df.types, tags=df.tags)
    state = setup(cfg, state)
    step = jax.jit(make_step(cfg))

    @jax.jit
    def probes(state):
        alive = state.alive
        v = state.v
        f = state.f
        px = jnp.sum(jnp.where(alive, v[:, 0], 0.0), dtype=jnp.float64) \
            if v.dtype == jnp.float64 else \
            jnp.sum(jnp.where(alive, v[:, 0].astype(jnp.float32), 0.0))
        fx = jnp.sum(jnp.where(alive, f[:, 0], 0.0))
        mf = (state.obmd.momentum_force_left[0]
              + state.obmd.momentum_force_right[0]
              + state.obmd.shear_force_left[0]
              + state.obmd.shear_force_right[0])
        return (px, fx, mf, state.obmd.ndeleted, state.obmd.ninserted,
                jnp.sum(alive.astype(jnp.int32)))

    dt = float(cfg.dt)
    px0 = None
    cum_fx_gap = 0.0        # sum over steps of (sum fx - prescribed mf)
    cum_mf_dt = 0.0         # prescribed boundary impulse
    t0 = time.time()
    prev = [None]
    for s in range(nsteps + 1):
        px, fx, mf, ndel, nins, n = (float(np.asarray(p)) for p in probes(state))
        if px0 is None:
            px0 = px
        cum_fx_gap += (fx - mf) * dt
        cum_mf_dt += mf * dt
        if s % report_every == 0:
            print(f"step {s:6d} N={int(n)} px={px - px0:+10.4f} "
                  f"cum(sumF-mf)*dt={cum_fx_gap:+10.4f} "
                  f"cum mf*dt={cum_mf_dt:+10.4f} "
                  f"del={int(ndel)} ins={int(nins)} "
                  f"({(time.time()-t0):.0f}s)", flush=True)
        if s < nsteps:
            state = step(state)
    print("done")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--force-path", default="nlist")
    ap.add_argument("--report-every", type=int, default=100)
    a = ap.parse_args()
    main(nsteps=a.steps, force_path=a.force_path,
         report_every=a.report_every)
