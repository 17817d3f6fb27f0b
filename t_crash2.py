import sys
import jax, numpy as np
from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.state import init_state
from obmd_tpu.integrate import make_step, setup

fp = sys.argv[1] if len(sys.argv) > 1 else "cellpad"
box = Box((0,0,0), (8.0,4.0,4.0), (False, True, True))
r1 = RegionBlock((0,0,0),(1.6,4,4)); r2 = RegionBlock((6.4,0,0),(8,4,4))
deg = RegionBlock((0,0,0),(0,0,0))
pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=4321, a0=25.0, gamma=4.5)
obmd = ObmdParams(ntype=0, nfreq=1, seed=987, pxx=10.0, alpha=0.7, tau=0.01,
                  nbuf=130.0, region1=r1, region2=r2, region3=deg, region4=deg,
                  region5=r1, region6=r2, buffer_size=1.6,
                  usher=None, near=0.5, insert_kmax=16)
cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                  capacity=Capacity(n_max=520, cell_capacity=24),
                  obmd=obmd, skin=0.3, force_path=fp)
r = np.random.default_rng(0)
st = init_state(cfg, r.uniform([0,0,0],[8,4,4],(400,3)), v=r.normal(0,1,(400,3)))
st = setup(cfg, st)
print("setup ok", int(st.natoms), flush=True)
step = jax.jit(make_step(cfg))
for i in range(30):
    st = step(st)
    n = int(st.natoms)   # hard sync every step
    print("step", i, "natoms", n, flush=True)
print("SURVIVED", fp)
