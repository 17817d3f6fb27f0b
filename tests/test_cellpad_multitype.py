"""Cellpad/Pallas kernel coverage beyond single-type DPD (round-1
Weak #8 / Missing-component): per-type-pair coefficient tables blended
in-kernel and the charged lj/cut/rf law — validated against the stateless
sweep engine on identical configurations (interpreter mode on CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.config import (Capacity, DPDParams, LJCutRFParams,
                             SceneConfig)
from obmd_tpu.geometry import Box
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.state import init_state


def _force_map(st):
    a = np.asarray(st.alive)
    t = np.asarray(st.tag)
    f = np.asarray(st.f)
    return {int(t[i]): f[i] for i in np.nonzero(a)[0]}


def _compare_setup_forces(cfg_base, x, v, types=None, q=None, atol=2e-3):
    maps = {}
    for fp in ("sweep", "cellpad"):
        cfg = dataclasses.replace(cfg_base, force_path=fp)
        st = setup(cfg, init_state(cfg, x, v=v, types=types, q=q))
        maps[fp] = _force_map(st)
    m1, m2 = maps["sweep"], maps["cellpad"]
    assert set(m1) == set(m2)
    worst = max(np.abs(m1[t] - m2[t]).max() for t in m1)
    assert worst < atol, worst
    # non-trivial forces
    assert max(np.abs(m1[t]).max() for t in m1) > 1.0


def test_cellpad_two_type_dpd_matches_sweep():
    box = Box((0.0, 0.0, 0.0), (9.0, 4.2, 4.2), (False, True, True))
    pair = DPDParams.create(
        temp=1.0, cutoff=1.0, seed=5, ntypes=2,
        a0=[[25.0, 35.0], [35.0, 15.0]],
        gamma=[[4.5, 2.0], [2.0, 6.0]])
    cfg = SceneConfig(box=box, masses=(1.0, 2.0), pair=pair, dt=0.01,
                      capacity=Capacity(n_max=520, cell_capacity=24),
                      skin=0.3, force_path="sweep")
    r = np.random.default_rng(0)
    n = 480
    x = r.uniform([0, 0, 0], [9, 4.2, 4.2], (n, 3))
    v = r.normal(0, 1, (n, 3))
    types = r.integers(0, 2, n)
    _compare_setup_forces(cfg, x, v, types=types)


def test_cellpad_charged_ljrf_matches_sweep():
    box = Box((0.0, 0.0, 0.0), (12.0, 7.0, 7.0), (False, True, True))
    pair = LJCutRFParams.create(cut_lj=2.0, cut_coul=2.0, epsilon=1.0,
                                sigma=1.0, eps_rf=80.0)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.002,
                      capacity=Capacity(n_max=700, cell_capacity=40),
                      skin=0.3, force_path="sweep")
    r = np.random.default_rng(1)
    g = np.mgrid[0.6:11.8:0.95, 0.5:6.9:0.95, 0.5:6.9:0.95].reshape(3, -1).T
    n = (len(g) // 2) * 2
    g = g[:n] + r.uniform(-0.05, 0.05, (n, 3))
    q = np.tile([0.5, -0.5], n // 2)
    v = r.normal(0, 0.5, g.shape)
    _compare_setup_forces(cfg, g, v, q=q, atol=5e-3)


def test_cellpad_two_type_charged_steps_match_sweep():
    """Two-type charged LJ-RF, several full steps cellpad vs the
    exact sweep engine (both evaluate fresh positions every step)."""
    box = Box((0.0, 0.0, 0.0), (12.0, 7.0, 7.0), (False, True, True))
    pair = LJCutRFParams.create(
        cut_lj=2.0, cut_coul=2.0, ntypes=2,
        epsilon=[[1.0, 0.8], [0.8, 0.6]],
        sigma=[[1.0, 0.95], [0.95, 0.9]], eps_rf=80.0)
    cfg0 = SceneConfig(box=box, masses=(1.0, 1.5), pair=pair, dt=0.002,
                       capacity=Capacity(n_max=700, cell_capacity=40),
                       skin=0.3, force_path="sweep")
    r = np.random.default_rng(2)
    g = np.mgrid[0.6:11.8:0.95, 0.5:6.9:0.95, 0.5:6.9:0.95].reshape(3, -1).T
    nn = (len(g) // 2) * 2
    g = g[:nn] + r.uniform(-0.05, 0.05, (nn, 3))
    q = np.tile([0.5, -0.5], nn // 2)
    types = r.integers(0, 2, nn)
    v = r.normal(0, 0.5, g.shape)
    res = {}
    for fp in ("sweep", "cellpad"):
        cfg = dataclasses.replace(cfg0, force_path=fp)
        st = setup(cfg, init_state(cfg, g, v=v, types=types, q=q))
        step = jax.jit(make_step(cfg))
        for _ in range(5):
            st = step(st)
        a = np.asarray(st.alive)
        t = np.asarray(st.tag)
        xs = np.asarray(st.x)
        res[fp] = {int(t[i]): xs[i] for i in np.nonzero(a)[0]}
    m1, m2 = res["sweep"], res["cellpad"]
    assert set(m1) == set(m2)
    worst = max(np.abs(m1[t] - m2[t]).max() for t in m1)
    assert worst < 1e-3, worst
