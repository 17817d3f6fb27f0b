"""Bisect the flaky TPU worker crash seen on deck-driven runs."""
import sys, time
import jax, numpy as np
from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig, UsherParams
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.state import init_state
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.observe import make_thermo_fn

mode = sys.argv[1] if len(sys.argv) > 1 else "near-thermo-donate"
box = Box((0,0,0), (8.0,4.0,4.0), (False, True, True))
r1 = RegionBlock((0,0,0),(1.6,4,4)); r2 = RegionBlock((6.4,0,0),(8,4,4))
deg = RegionBlock((0,0,0),(0,0,0))
pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=4321, a0=25.0, gamma=4.5)
obmd = ObmdParams(ntype=0, nfreq=1, seed=987, pxx=10.0, alpha=0.7, tau=0.01,
                  nbuf=130.0, region1=r1, region2=r2, region3=deg, region4=deg,
                  region5=r1, region6=r2, buffer_size=1.6,
                  usher=None if "near" in mode else UsherParams(etarget=10.0, nattempt=10),
                  near=0.5 if "near" in mode else None, insert_kmax=16)
cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                  capacity=Capacity(n_max=520, cell_capacity=24),
                  obmd=obmd, skin=0.3, force_path="cellpad")
th_fn = make_thermo_fn(cfg) if "thermo" in mode else None
for trial in range(4):
    r = np.random.default_rng(trial)
    st = init_state(cfg, r.uniform([0,0,0],[8,4,4],(400,3)), v=r.normal(0,1,(400,3)))
    st = setup(cfg, st)
    donate = "donate" in mode
    step = jax.jit(make_step(cfg), donate_argnums=0) if donate else jax.jit(make_step(cfg))
    for i in range(30):
        st = step(st)
        if th_fn is not None and (i+1) % 10 == 0:
            th = th_fn(st)
            _ = float(th.temp)
    print("trial", trial, "ok: natoms", int(st.natoms), flush=True)
print("REPRO-SURVIVED", mode)
