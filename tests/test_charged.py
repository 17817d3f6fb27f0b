"""Charged open-boundary system (BASELINE config 5 direction): LJ +
reaction-field electrostatics with OBMD near-insertion on the nlist engine
— exercises PairLJCutRF end-to-end including charged trial energies
(pair_lj_cut_rf.cpp single/single_atomistic_obmd analogues)."""
import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.config import (Capacity, LJCutRFParams, ObmdParams, SceneConfig)
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.state import init_state, temperature


def _charged_scene(n=360, seed=0):
    box = Box((0.0, 0.0, 0.0), (12.0, 5.0, 5.0), (False, True, True))
    pair = LJCutRFParams.create(cut_lj=2.0, cut_coul=2.0, epsilon=1.0,
                                sigma=1.0, eps_rf=80.0)
    b = 2.4
    r1 = RegionBlock((0.0, 0.0, 0.0), (b, 5.0, 5.0))
    r2 = RegionBlock((12.0 - b, 0.0, 0.0), (12.0, 5.0, 5.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    obmd = ObmdParams(ntype=0, nfreq=1, seed=3, pxx=1.0, alpha=0.5, tau=0.05,
                      nbuf=40.0, region1=r1, region2=r2, region3=deg,
                      region4=deg, region5=r1, region6=r2, buffer_size=b,
                      near=0.9, usher=None, insert_kmax=4, charged=True)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.002,
                      capacity=Capacity(n_max=n + 60, cell_capacity=48),
                      obmd=obmd, force_path="nlist")
    r = np.random.default_rng(seed)
    # jittered lattice to avoid LJ blowups
    g = np.mgrid[0.6:11.8:0.95, 0.5:5.0:1.0, 0.5:5.0:1.0].reshape(3, -1).T
    g = g[:n] + r.uniform(-0.05, 0.05, (min(n, len(g)), 3))
    q = np.tile([0.5, -0.5], len(g) // 2 + 1)[:len(g)]
    v = r.normal(0, 0.5, g.shape)
    state = init_state(cfg, g, v=v, q=q)
    return cfg, state


def test_charged_obmd_runs_and_conserves_charge_neutrality_rate():
    cfg, state = _charged_scene()
    state = setup(cfg, state)
    step = jax.jit(make_step(cfg))
    q0 = float(jnp.sum(jnp.where(state.alive, state.q, 0.0)))
    for _ in range(12):
        state = step(state)
    assert int(state.step) == 12
    n = int(state.natoms)
    assert n > 200
    t = float(temperature(cfg, state))
    assert 0.0 < t < 100.0
    # inserted atoms carry q=0 (ATOM-mode insertion); deleted atoms remove
    # their charge: net charge change bounded by deletions
    q1 = float(jnp.sum(jnp.where(state.alive, state.q, 0.0)))
    ndel = int(state.obmd.ndeleted)
    assert abs(q1 - q0) <= 0.5 * ndel + 1e-3


def test_charged_forces_include_coulomb():
    """Flipping charges changes forces (RF term active end-to-end)."""
    cfg, state = _charged_scene(seed=1)
    state = setup(cfg, state)
    f1 = np.asarray(state.f)
    state2 = setup(cfg, state.replace(q=state.q * 0.0))
    f2 = np.asarray(state2.f)
    assert np.abs(f1 - f2).max() > 1e-3
