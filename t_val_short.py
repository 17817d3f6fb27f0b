"""Short validation diagnostic: counters + T after 4000 steps."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from obmd_tpu.io import lammps_data
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig, UsherParams
from obmd_tpu.integrate import make_run, setup
from obmd_tpu.state import init_state, temperature

df = lammps_data.read_data("/root/reference/examples/OBMD_DPD/dpd_8map_obmd.data")
xhi, yhi, zhi = (float(v) for v in df.box_hi)
buf = 0.15 * xhi
box = Box((0.0,0.0,0.0), (xhi,yhi,zhi), (False, True, True))
r1 = RegionBlock((0,0,0),(buf,yhi,zhi)); r2 = RegionBlock((xhi-buf,0,0),(xhi,yhi,zhi))
deg = RegionBlock((0,0,0),(0,0,0))
pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=8893, a0=209.6, gamma=4.5, ntypes=1)
obmd = ObmdParams(ntype=0, nfreq=1, seed=777, pxx=188.0, alpha=0.7, tau=0.005,
                  nbuf=1327.0, region1=r1, region2=r2, region3=deg, region4=deg,
                  region5=r1, region6=r2, buffer_size=buf, g_fac=0.25, maxattempt=1,
                  usher=UsherParams(etarget=31.03, ds0=1.0, dtheta0=0.02, uovlp=1e4,
                                    dsovlp=1.5, eps=1.0, nattempt=40),
                  insert_kmax=16)
cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.001464,
                  capacity=Capacity(n_max=int(df.natoms*1.3), cell_capacity=24),
                  obmd=obmd, force_path="sweep").finalize()
st = setup(cfg, init_state(cfg, df.x, v=df.v, types=df.types, tags=df.tags))
run = make_run(cfg, 500)
for i in range(3):
    st = run(st)
    aux = st.nbrs
    print(f"steps {int(st.step)}: T={float(temperature(cfg, st)):.4f} N={int(st.natoms)} "
          f"ins={int(st.obmd.ninserted)} del={int(st.obmd.ndeleted)} fail={int(st.obmd.insert_fail)} "
          f"cell_ovf={int(st.cell_overflow)} "
          f"", flush=True)
print("skin", cfg.skin, "R", __import__('obmd_tpu.engine_cellpad', fromlist=['x']).auto_rebuild_every(cfg))
