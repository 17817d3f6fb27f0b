"""Slab-decomposition parity for the styles round 4 still refused:
SHAKE/RATTLE constraints, branched topologies + harmonic impropers, and
the dpd/tstat temperature ramp (VERDICT r4 item 4; the reference's domain
decomposition is style-agnostic, comm_brick.cpp:652,771)."""
import dataclasses

import jax
import numpy as np
import pytest

from obmd_tpu.config import (BondHarmonicParams, Capacity, DPDParams,
                             DPDTstatParams, ImproperHarmonicParams,
                             MolTemplate, SceneConfig,
                             shake_table_from_templates)
from obmd_tpu.geometry import Box
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.parallel.slab_decomp import (make_mesh, make_slab_geom,
                                           make_slab_step, shard_by_slab)
from obmd_tpu.state import init_state

NDEV = 4

WATER = MolTemplate(
    dx=((0.0, 0.2667, 0.0), (-0.6, -0.2333, 0.0), (0.6, -0.2333, 0.0)),
    types=(0, 1, 1), q=(0.0, 0.0, 0.0), bonds=((0, 1), (0, 2), (1, 2)))

_S = 0.55
STAR = MolTemplate(
    dx=((0.0, 0.0, 0.0), (_S, 0.0, 0.0), (-_S, 0.05, 0.0),
        (0.0, _S, 0.05), (0.0, -0.05, _S)),
    types=(1, 0, 0, 0, 0), q=(0.0,) * 5,
    bonds=((0, 1), (0, 2), (0, 3), (0, 4)),
    impropers=((1, 1, 0, 2, 3),))


def _match_by_tag(s_sh, s_l, field="x"):
    a1, a2 = np.asarray(s_sh.alive), np.asarray(s_l.alive)
    m1 = {int(t): np.asarray(getattr(s_sh, field))[i]
          for i, t in enumerate(np.asarray(s_sh.tag)) if a1[i]}
    m2 = {int(t): np.asarray(getattr(s_l, field))[i]
          for i, t in enumerate(np.asarray(s_l.tag)) if a2[i]}
    assert set(m1) == set(m2)
    return max(np.abs(m1[t] - m2[t]).max() for t in m1)


def _scatter_molecules(rng, template, n_mol, lx, yz=4.0):
    """Molecule copies with random COM + orientation across the box."""
    dx = np.asarray(template.dx)
    m = dx.shape[0]
    xs, bonds, mols, types = [], [], [], []
    imps = []
    for k in range(n_mol):
        c = np.asarray([rng.uniform(1.0, lx - 1.0),
                        rng.uniform(0.2, yz - 0.2),
                        rng.uniform(0.2, yz - 0.2)])
        # random rotation from QR
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        xs.append(dx @ q.T + c)
        base = k * m
        for a, b in template.bonds:
            bonds.append((base + a + 1, base + b + 1))
        for quad in (template.impropers or ()):
            imps.append(tuple(base + int(i) + 1 for i in quad[-4:]))
        mols.extend([k + 1] * m)
        types.extend(template.types)
    x = np.concatenate(xs)
    x[:, 1:] = np.mod(x[:, 1:], yz)
    return (x, np.asarray(bonds), np.asarray(mols), np.asarray(types),
            np.asarray(imps) if imps else None)


def test_slab_shake_matches_single_chip():
    """Water-like SHAKE clusters straddling slab faces: 5 slab steps match
    the single-chip nlist engine, and constraints hold on both."""
    lx = 16.0
    box = Box((0.0, 0.0, 0.0), (lx, 4.0, 4.0), (False, True, True))
    r = np.random.default_rng(11)
    x, bonds, mols, types, _ = _scatter_molecules(r, WATER, 40, lx)
    v = r.normal(0, 0.4, x.shape)
    cfg = SceneConfig(
        box=box, masses=(16.0, 1.0), dt=0.004,
        pair=DPDParams.create(temp=0.5, cutoff=1.0, seed=5, a0=10.0,
                              gamma=2.0, ntypes=2),
        capacity=Capacity(n_max=x.shape[0], cell_capacity=16),
        shake=shake_table_from_templates([WATER], 2),
        skin=0.3, force_path="nlist").finalize()
    st = setup(cfg, init_state(cfg, x, v=v, types=types, bonds=bonds,
                               mol=mols))

    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV, n_loc=64)
    sst = shard_by_slab(cfg, geom, st, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    lstep = jax.jit(make_step(cfg))
    s_sh, s_l = sst, st
    for _ in range(5):
        s_sh = sstep(s_sh)
        s_l = lstep(s_l)
    assert int(s_sh.cell_overflow) == 0
    assert _match_by_tag(s_sh, s_l, "x") < 1e-4
    assert _match_by_tag(s_sh, s_l, "v") < 1e-3

    # constraints hold on the sharded state too (checked by TAG — the
    # slab bond columns hold tags, so shake.constraint_error's slot
    # gathers do not apply)
    a = np.asarray(s_sh.alive)
    xm = {int(t): np.asarray(s_sh.x)[i]
          for i, t in enumerate(np.asarray(s_sh.tag)) if a[i]}
    dx0 = np.asarray(WATER.dx)
    err = 0.0
    for k in range(40):
        base = 3 * k
        for (i, j) in WATER.bonds:
            d = xm[base + i + 1] - xm[base + j + 1]
            d[1:] -= 4.0 * np.round(d[1:] / 4.0)
            err = max(err, abs(np.linalg.norm(d)
                               - np.linalg.norm(dx0[i] - dx0[j])))
    assert err < 5e-5, err


def test_slab_branched_impropers_match_single_chip():
    """4-arm stars (4 bonds on the center + one improper) straddling slab
    faces: 4 slab steps match the single-chip cellpad engine."""
    lx = 16.0
    box = Box((0.0, 0.0, 0.0), (lx, 4.0, 4.0), (False, True, True))
    r = np.random.default_rng(7)
    x, bonds, mols, types, imps = _scatter_molecules(r, STAR, 36, lx)
    v = r.normal(0, 0.5, x.shape)
    cfg = SceneConfig(
        box=box, masses=(1.0, 1.0), dt=0.005,
        pair=DPDParams.create(temp=0.8, cutoff=1.0, seed=3, a0=15.0,
                              gamma=3.0, ntypes=2),
        bond=BondHarmonicParams(k=40.0, r0=_S),
        improper=ImproperHarmonicParams(k=(0.0, 8.0), chi0=(0.0, 30.0)),
        capacity=Capacity(n_max=x.shape[0], cell_capacity=18),
        skin=0.3, force_path="nlist", branched_topology=True).finalize()
    st = setup(cfg, init_state(cfg, x, v=v, types=types, bonds=bonds,
                               mol=mols, impropers=imps))
    assert st.bond3 is not None and st.impr is not None

    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV, n_loc=96)
    sst = shard_by_slab(cfg, geom, st, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    lstep = jax.jit(make_step(cfg))
    s_sh, s_l = sst, st
    for _ in range(4):
        s_sh = sstep(s_sh)
        s_l = lstep(s_l)
    assert int(s_sh.cell_overflow) == 0
    assert _match_by_tag(s_sh, s_l, "x") < 1e-4


def test_slab_tstat_ramp_matches_single_chip():
    """dpd/tstat with a temperature ramp: the per-step sig_scale threads
    through the slab force path — 6 steps spanning the ramp window match
    the single-chip nlist engine."""
    lx = 16.0
    box = Box((0.0, 0.0, 0.0), (lx, 4.0, 4.0), (False, True, True))
    r = np.random.default_rng(19)
    n = 400
    x = r.uniform([0.1, 0.0, 0.0], [lx - 0.1, 4.0, 4.0], (n, 3))
    v = r.normal(0, 0.8, (n, 3))
    cfg = SceneConfig(
        box=box, masses=(1.0,), dt=0.01,
        pair=DPDTstatParams.create(t_start=1.0, t_stop=4.0, cutoff=1.0,
                                   seed=9, gamma=4.5, ramp=(0, 4)),
        capacity=Capacity(n_max=n, cell_capacity=16),
        skin=0.3, force_path="nlist").finalize()
    assert cfg.pair.is_ramp
    st = setup(cfg, init_state(cfg, x, v=v))

    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV, n_loc=220)
    sst = shard_by_slab(cfg, geom, st, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    lstep = jax.jit(make_step(cfg))
    s_sh, s_l = sst, st
    for _ in range(6):
        s_sh = sstep(s_sh)
        s_l = lstep(s_l)
    assert int(s_sh.cell_overflow) == 0
    assert _match_by_tag(s_sh, s_l, "x") < 1e-4
    assert _match_by_tag(s_sh, s_l, "v") < 1e-3

    # the scale is live, not compiled away: the same sharded start under a
    # constant-T pair (identical t_start/seed, no ramp) diverges
    cfg_const = dataclasses.replace(
        cfg, pair=DPDTstatParams.create(
            t_start=1.0, cutoff=1.0, seed=9, gamma=4.5)).finalize()
    sstep_c = make_slab_step(cfg_const, mesh, geom)
    s_c = sst
    for _ in range(6):
        s_c = sstep_c(s_c)
    dv = np.abs(np.asarray(s_c.v) - np.asarray(s_sh.v)).max()
    assert dv > 1e-3, dv
