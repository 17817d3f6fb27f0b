import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from obmd_tpu.geometry import Box
from obmd_tpu.config import Capacity, DPDParams, SceneConfig
from obmd_tpu.integrate import make_run, setup
from obmd_tpu.state import init_state, temperature

for fp in ("nlist",):
    box = Box((0.0,0.0,0.0), (20.0, 11.198, 11.198), (True, True, True))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=8893, a0=209.6, gamma=4.5)
    n = int(3.0 * 20.0 * 11.198 * 11.198)
    r = np.random.default_rng(5)
    x = r.uniform(0, [20.0, 11.198, 11.198], (n, 3))
    v = r.normal(0, 1.0, (n, 3)); v -= v.mean(axis=0)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.001464,
                      capacity=Capacity(n_max=n, cell_capacity=24),
                      force_path=fp).finalize()
    st = setup(cfg, init_state(cfg, x, v=v))
    run = make_run(cfg, 3000)
    for i in range(5):
        st = run(st)
        print(f"{fp} steps {int(st.step)}: T={float(temperature(cfg, st)):.4f}", flush=True)
