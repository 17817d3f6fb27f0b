"""FENE bonds + special-bonds exclusion + Langevin (the chain workload,
reference bench/in.chain)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.config import (BondFENEParams, Capacity, LangevinParams,
                             LJCutParams, SceneConfig)
from obmd_tpu.forces.bonded import fene_forces
from obmd_tpu.geometry import Box
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.state import init_state, temperature


def _chains(L=8.0, nchain=8, blen=8, seed=1):
    r = np.random.default_rng(seed)
    xs, bonds = [], []
    tagn = 0
    for c in range(nchain):
        y = 0.8 + (c % 4) * 1.8
        z = 1.2 + (c // 4) * 3.5
        for k in range(blen):
            xs.append([0.5 + 0.93 * k + r.uniform(-0.03, 0.03),
                       y + r.uniform(-0.03, 0.03),
                       z + r.uniform(-0.03, 0.03)])
        for k in range(blen - 1):
            bonds.append((tagn + k + 1, tagn + k + 2))
        tagn += blen
    return np.asarray(xs), np.asarray(bonds)


def _cfg(n, force_path, langevin=False):
    box = Box((0, 0, 0), (8.0, 8.0, 8.0), (True, True, True))
    pair = LJCutParams.create(cutoff=1.12, epsilon=1.0, sigma=1.0, shift=True)
    return SceneConfig(
        box=box, masses=(1.0,), pair=pair, dt=0.012,
        capacity=Capacity(n_max=n, cell_capacity=20),
        bond=BondFENEParams(),
        langevin=(LangevinParams(temp=1.0, damp=1.0)
                  if langevin else None),
        skin=0.3, force_path=force_path)


def test_fene_analytic():
    box = Box((0, 0, 0), (10, 10, 10), (True, True, True))
    bp = BondFENEParams(k=30.0, r0=1.5, epsilon=1.0, sigma=1.0)
    x = jnp.asarray([[1.0, 1, 1], [1.97, 1, 1], [2.94, 1, 1]], jnp.float32)
    # partner SLOTS: 0-1 and 1-2 bonded
    b1 = jnp.asarray([1, 0, 1], jnp.int32)
    b2 = jnp.asarray([-1, 2, -1], jnp.int32)
    f, e = fene_forces(bp, box, x, b1, b2, jnp.ones(3, bool),
                       compute_energy=True)
    r = 0.97
    fb = -30.0 / (1 - (r / 1.5) ** 2)
    sr6 = (1.0 / r**2) ** 3
    fb += 48 * sr6 * (sr6 - 0.5) / r**2
    np.testing.assert_allclose(float(f[0, 0]), fb * (-r), rtol=1e-4)
    np.testing.assert_allclose(float(f[2, 0]), fb * r, rtol=1e-4)
    assert abs(float(f[1, 0])) < 1e-3
    assert abs(float(jnp.sum(f))) < 1e-3


def test_chain_forces_match_brute_and_engines_agree():
    """WCA pair with 1-2 exclusion + FENE vs numpy brute force, and
    nlist vs cellpad per-tag agreement."""
    x, bonds = _chains()
    n = len(x)
    st0 = init_state(_cfg(n, "nlist"), x, bonds=bonds)
    sn = setup(_cfg(n, "nlist"), st0)
    scp = setup(_cfg(n, "cellpad"), st0)

    b1 = np.asarray(st0.bond1)   # partner slots (rows of the init layout)
    b2 = np.asarray(st0.bond2)
    L = 8.0
    F = np.zeros((n, 3))
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            bonded = (b1[i] == j) or (b2[i] == j)
            d = x[i] - x[j]
            d -= L * np.round(d / L)
            rsq = d @ d
            if not bonded and rsq < 1.12**2:
                r6 = rsq**-3
                F[i] += (24 * r6 * (2 * r6 - 1) / rsq) * d
            if bonded:
                fb = -30.0 / (1 - rsq / 2.25)
                if rsq < 2 ** (1 / 3):
                    sr6 = rsq**-3
                    fb += 48 * sr6 * (sr6 - 0.5) / rsq
                F[i] += fb * d
    np.testing.assert_allclose(np.asarray(sn.f)[:n], F, rtol=1e-3, atol=2e-3)
    # per-tag cross-engine agreement (cellpad permutes slots)
    ac, an = np.asarray(scp.alive), np.asarray(sn.alive)
    mc = {int(t): np.asarray(scp.f)[i]
          for i, t in enumerate(np.asarray(scp.tag)) if ac[i]}
    mn = {int(t): np.asarray(sn.f)[i]
          for i, t in enumerate(np.asarray(sn.tag)) if an[i]}
    assert max(np.abs(mc[t] - mn[t]).max() for t in mc) < 1e-3


def test_langevin_thermostats_chain():
    x, bonds = _chains(seed=2)
    n = len(x)
    cfg = _cfg(n, "nlist", langevin=True)
    st = setup(cfg, init_state(cfg, x, bonds=bonds))
    step = jax.jit(make_step(cfg), donate_argnums=0)
    # damp=1.0 -> velocity relaxation time ~83 steps at dt=0.012
    for _ in range(400):
        st = step(st)
    t = float(temperature(cfg, st))
    assert 0.85 < t < 1.2, t
