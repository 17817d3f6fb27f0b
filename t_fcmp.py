import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, dataclasses
from obmd_tpu.geometry import Box
from obmd_tpu.config import Capacity, DPDParams, SceneConfig
from obmd_tpu.integrate import setup, make_grid_spec, _salt
from obmd_tpu.state import init_state
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cells import build_cells
from obmd_tpu.forces.pairs import pair_sweep

per_x = sys.argv[1] == "px" if len(sys.argv) > 1 else False
box = Box((0.0,0.0,0.0), (20.0, 11.198, 11.198), (per_x, True, True))
pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=8893, a0=209.6, gamma=4.5)
n = 7000
r = np.random.default_rng(5)
x = r.uniform(0, [20.0, 11.198, 11.198], (n, 3))
v = r.normal(0, 1.0, (n, 3))
cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.001464,
                  capacity=Capacity(n_max=n, cell_capacity=24),
                  force_path="cellpad").finalize()
st = setup(cfg, init_state(cfg, x, v=v))   # cellpad layout, forces in st.f
geom = ec.make_geometry(cfg)
print("geom", geom.dims, "p", geom.p, "nb", geom.n_blocks, "per_x", geom.periodic_x)
# sweep forces at the SAME slot layout/state
spec = make_grid_spec(cfg)
@jax.jit
def sweep_f(s):
    tab = build_cells(spec, s.x, s.alive)
    pf = pair_sweep(cfg.pair, cfg.box, spec, tab, s.x, s.v, s.type, s.tag, s.q,
                    _salt(cfg, s.step), dt=cfg.dt)
    return jnp.where(s.alive[:, None], pf.f, 0.0)
fs = np.asarray(sweep_f(st))
fc = np.asarray(st.f)
d = np.abs(fs - fc).max(axis=1)
alive = np.asarray(st.alive)
print("max df:", d[alive].max(), "mean df:", d[alive].mean())
bad = np.argsort(-d)[:6]
xs = np.asarray(st.x)
for i in bad:
    print(f"slot {i} block {i//(geom.cap*geom.lanes)} lane {(i%(geom.lanes))} rank {(i//geom.lanes)%geom.cap} x {xs[i].round(2)} df {d[i]:.3e}")
