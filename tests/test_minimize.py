"""FIRE energy minimization (min.cpp / min_fire.cpp counterpart)."""
import numpy as np
import pytest

from obmd_tpu.config import Capacity, LJCutParams, SceneConfig
from obmd_tpu.geometry import Box
from obmd_tpu.minimize import minimize
from obmd_tpu.state import init_state


def _fcc(nc=3, a=1.5599):
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                     [0, 0.5, 0.5]])
    pts = [(base + [i, j, k]) * a
           for i in range(nc) for j in range(nc) for k in range(nc)]
    return np.concatenate(pts), nc * a


def test_fire_recovers_fcc_minimum():
    x0, L = _fcc()
    box = Box((0, 0, 0), (L, L, L), (True, True, True))
    cfg = SceneConfig(
        box=box, masses=(1.0,), dt=0.005,
        pair=LJCutParams.create(cutoff=2.0, epsilon=1.0, sigma=1.0),
        capacity=Capacity(n_max=len(x0), cell_capacity=48), skin=0.3)
    r = np.random.default_rng(0)
    st = init_state(cfg, x0 + r.normal(0, 0.05, x0.shape))
    from obmd_tpu.minimize import _force_energy_fn
    _, pe_perfect = _force_energy_fn(cfg)(init_state(cfg, x0))
    res = minimize(cfg, st, ftol=1e-3, maxiter=800)
    assert res.energy / len(x0) < -7.6      # deep in the fcc basin
    assert abs(res.energy - float(pe_perfect)) / abs(float(pe_perfect)) < 1e-4
    assert res.fmax < 1e-3 or res.iters == 800


def test_minimize_rejects_open_boundary():
    from obmd_tpu import scenes
    sc = scenes.obmd_dpd_scene(scale=0.1)
    with pytest.raises(ValueError, match="open-boundary"):
        minimize(sc.cfg, sc.state)


def test_deck_minimize_command(tmp_path):
    from obmd_tpu.io.lammps_data import DataFile, write_data
    from obmd_tpu.io.script import run_script
    x0, L = _fcc(nc=2)
    r = np.random.default_rng(1)
    x = x0 + r.normal(0, 0.04, x0.shape)
    df = DataFile(natoms=len(x), ntypes=1, box_lo=np.zeros(3),
                  box_hi=np.full(3, L), masses=np.ones(1), x=x,
                  types=np.zeros(len(x), int),
                  tags=np.arange(1, len(x) + 1))
    data = tmp_path / "s.data"
    write_data(str(data), df)
    deck = tmp_path / "in.min"
    deck.write_text(f"""
units lj
boundary p p p
atom_style atomic
read_data {data}
pair_style lj/cut 1.8
pair_coeff 1 1 1.0 1.0
min_style fire
minimize 0.0 1e-3 500 500
""")
    lines = []
    it = run_script(str(deck), log_fn=lines.append)
    out = [l for l in lines if "minimize:" in l]
    assert out, lines
    fmax = float(out[0].split("fmax")[1].split(",")[0])
    assert fmax < 5e-3
