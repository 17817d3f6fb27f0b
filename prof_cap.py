import time, functools, sys
import jax, jax.numpy as jnp
import numpy as np
from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup
from obmd_tpu import engine_cellpad as ec

cap = int(sys.argv[1])
sc = scenes.obmd_dpd_scene(scale=8, seed=7, cell_capacity=cap)
cfg = sc.cfg
geom = ec.make_geometry(cfg)
state = setup(cfg, sc.state)
state = equilibrate(cfg, state, 200)
jax.block_until_ready(state.x)
kern = ec._make_kernel(cfg, geom)
run = ec.make_run_cellpad(cfg, 200)
out = run(state); _ = np.asarray(out.x)
t0 = time.perf_counter(); out = run(out); _ = np.asarray(out.x)
dtm = (time.perf_counter()-t0)/200*1e3
print(f"cap={cap}: step {dtm:.3f} ms  Mps/s {float(out.natoms)/dtm/1e3:.2f} "
      f"overflow {int(out.cell_overflow)} aux_ovf {int(out.nbrs.overflow)} "
      f"skin_trips {int(out.nbrs.skin_trips)}", flush=True)
