"""Molecule-mode slab decomposition (VERDICT r2 item 6 phase 2): bonds
resolved by TAG among owned + halo atoms (bonds across slab faces need no
slot references), whole-molecule doom propagation over ppermute'd tag
lists, and rank-collective molecule insertion with COM-owner placement."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obmd_tpu.config import (BondHarmonicParams, Capacity, DPDParams,
                             MolTemplate, ObmdParams, SceneConfig)
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.parallel.slab_decomp import (make_mesh, make_slab_geom,
                                           make_slab_step, shard_by_slab)
from obmd_tpu.state import init_state

NDEV = 8

DIMER = MolTemplate(dx=((-0.35, 0.0, 0.0), (0.35, 0.0, 0.0)),
                    types=(0, 0), q=(0.0, 0.0), bonds=((0, 1),))


def test_slab_bonds_match_single_chip():
    """Dimers straddling slab faces: 3 slab steps match the single-chip
    nlist engine to fp noise (bond forces + 1-2 exclusion by tag)."""
    box = Box((0.0, 0.0, 0.0), (16.0, 4.0, 4.0), (False, True, True))
    r = np.random.default_rng(3)
    nd = 60
    # dimer centers across the whole box, many near slab faces (slab
    # width = 2.0 on 8 devices)
    cx = r.uniform(0.6, 15.4, nd)
    cyz = r.uniform(0.2, 3.8, (nd, 2))
    axis = r.normal(size=(nd, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    x = np.zeros((2 * nd, 3))
    x[0::2] = np.c_[cx, cyz] - 0.35 * axis
    x[1::2] = np.c_[cx, cyz] + 0.35 * axis
    x[:, 1:] = np.mod(x[:, 1:], 4.0)
    x[:, 0] = np.clip(x[:, 0], 0.05, 15.95)
    v = r.normal(0, 0.3, (2 * nd, 3))
    bonds = np.stack([np.arange(1, 2 * nd, 2), np.arange(2, 2 * nd + 1, 2)],
                     axis=1)

    cfg = SceneConfig(
        box=box, masses=(1.0,), dt=0.004,
        pair=DPDParams.create(temp=0.4, cutoff=1.0, seed=9, a0=20.0,
                              gamma=2.0),
        bond=BondHarmonicParams(k=50.0, r0=0.7),
        capacity=Capacity(n_max=2 * nd, cell_capacity=16),
        skin=0.3, force_path="nlist")
    st = setup(cfg, init_state(cfg, x, v=v, bonds=bonds))

    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV, n_loc=48)
    sst = shard_by_slab(cfg, geom, st, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    lstep = jax.jit(make_step(cfg))
    s_sh, s_l = sst, st
    for _ in range(3):
        s_sh = sstep(s_sh)
        s_l = lstep(s_l)
    assert int(s_sh.cell_overflow) == 0
    a1, a2 = np.asarray(s_sh.alive), np.asarray(s_l.alive)
    m1 = {int(t): np.asarray(s_sh.x)[i]
          for i, t in enumerate(np.asarray(s_sh.tag)) if a1[i]}
    m2 = {int(t): np.asarray(s_l.x)[i]
          for i, t in enumerate(np.asarray(s_l.tag)) if a2[i]}
    assert set(m1) == set(m2)
    diffs = [np.abs(m1[t] - m2[t]).max() for t in m1]
    assert max(diffs) < 1e-4, max(diffs)


def _mol_scene():
    box = Box((0.0, 0.0, 0.0), (16.0, 4.0, 4.0), (False, True, True))
    b = 3.0
    r1 = RegionBlock((0.0, 0.0, 0.0), (b, 4.0, 4.0))
    r2 = RegionBlock((13.0, 0.0, 0.0), (16.0, 4.0, 4.0))
    pair = DPDParams.create(temp=0.8, cutoff=1.0, seed=3, a0=20.0,
                            gamma=3.0)
    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=11, pxx=4.0, alpha=0.5, tau=0.01, nbuf=120.0,
        region1=r1, region2=r2, region5=r1, region6=r2, buffer_size=b,
        usher=None, near=0.45, mol=DIMER, mol_len=2, insert_kmax=4,
        maxattempt=2)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.008,
                      capacity=Capacity(n_max=1100, cell_capacity=20),
                      obmd=obmd, bond=BondHarmonicParams(k=50.0, r0=0.7),
                      skin=0.3, force_path="nlist")
    r = np.random.default_rng(6)
    nd = 330
    cx = r.uniform(0.6, 15.4, nd)
    cyz = r.uniform(0.2, 3.8, (nd, 2))
    axis = r.normal(size=(nd, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    x = np.zeros((2 * nd, 3))
    x[0::2] = np.c_[cx, cyz] - 0.35 * axis
    x[1::2] = np.c_[cx, cyz] + 0.35 * axis
    x[:, 1:] = np.mod(x[:, 1:], 4.0)
    x[:, 0] = np.clip(x[:, 0], 0.05, 15.95)
    v = r.normal(0, 0.8, (2 * nd, 3))
    bonds = np.stack([np.arange(1, 2 * nd, 2), np.arange(2, 2 * nd + 1, 2)],
                     axis=1)
    mol = np.repeat(np.arange(1, nd + 1), 2)
    st = init_state(cfg, x, v=v, bonds=bonds, mol=mol)
    return cfg, setup(cfg, st)


def test_slab_mol_insertion_and_whole_deletion():
    """30-step molecule-mode OBMD run on the 8-device mesh: molecules
    insert (dimer counts), no orphaned bond partners ever (whole-molecule
    doom propagation across slabs), ownership invariant holds."""
    cfg, st = _mol_scene()
    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV, n_loc=240)
    sst = shard_by_slab(cfg, geom, st, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    owner = np.arange(geom.capacity) // geom.n_loc
    for chunk in range(6):
        for _ in range(5):
            sst = sstep(sst)
        alive = np.asarray(sst.alive)
        tags = np.asarray(sst.tag)
        b1 = np.asarray(sst.bond1)
        b2 = np.asarray(sst.bond2)
        live_tags = set(int(t) for i, t in enumerate(tags) if alive[i])
        # no orphans: every alive atom's partner TAG is alive somewhere
        for i in np.nonzero(alive)[0]:
            for p in (b1[i], b2[i]):
                if p >= 0:
                    assert int(p) in live_tags, (chunk, int(tags[i]), int(p))
        # ownership invariant
        x = np.asarray(sst.x)
        slab = np.clip(((x[:, 0] - geom.x0) / geom.slab_w).astype(np.int64),
                       0, geom.ndev - 1)
        assert int((alive & (slab != owner)).sum()) == 0, chunk
    assert int(sst.cell_overflow) == 0
    n_ins = int(sst.obmd.ninserted)
    n_del = int(sst.obmd.ndeleted)
    assert n_ins > 0 and n_ins % 2 == 0, n_ins
    assert n_del % 2 == 0, n_del


def test_slab_rejects_unsupported_molecule_features():
    """The halo must fit the narrowest slab (it only reaches the adjacent
    device) — a template whose bonded reach exceeds the slab width refuses
    loudly.  (SHAKE/branched/ramp are slab-supported since round 5,
    tests/test_slab_parity.py.)"""
    cfg, _ = _mol_scene()
    import dataclasses
    long_tpl = MolTemplate(dx=((-0.9, 0.0, 0.0), (0.9, 0.0, 0.0)),
                           types=(0, 0), q=(0.0, 0.0), bonds=((0, 1),))
    bad = dataclasses.replace(
        cfg, obmd=dataclasses.replace(cfg.obmd, mol=long_tpl))
    with pytest.raises(ValueError, match="halo width"):
        make_slab_geom(bad, NDEV)


TRIMER = MolTemplate(
    dx=((-0.5, -0.15, 0.0), (0.0, 0.25, 0.0), (0.5, -0.15, 0.0)),
    types=(0, 0, 0), q=(0.0, 0.0, 0.0), bonds=((0, 1), (1, 2)))

CHAIN4 = MolTemplate(
    dx=((-0.75, -0.2, 0.0), (-0.25, 0.2, 0.1), (0.25, -0.2, -0.1),
        (0.75, 0.2, 0.0)),
    types=(0, 0, 0, 0), q=(0.0,) * 4, bonds=((0, 1), (1, 2), (2, 3)))


def _chain_state(cfg, tpl, n_mols, seed=3, spread=0.8):
    """n_mols template instances scattered over the box (many straddling
    slab faces), as a single-chip State with bonds + mol ids."""
    r = np.random.default_rng(seed)
    m = tpl.natoms
    box_hi = np.asarray(cfg.box.hi)
    cx = r.uniform(1.2, box_hi[0] - 1.2, n_mols)
    cyz = r.uniform(0.4, box_hi[1] - 0.4, (n_mols, 2))
    x = np.zeros((n_mols * m, 3))
    dx = np.asarray(tpl.dx)
    for i in range(n_mols):
        # random rotation about z so arms cross faces at angles
        th = r.uniform(0, 2 * np.pi)
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        x[i * m:(i + 1) * m] = (dx @ R.T
                                + np.r_[cx[i], cyz[i]][None, :])
    x[:, 1:] = np.mod(x[:, 1:], box_hi[1])
    x[:, 0] = np.clip(x[:, 0], 0.05, box_hi[0] - 0.05)
    v = r.normal(0, spread, (n_mols * m, 3))
    bonds = np.concatenate([
        np.asarray(tpl.bonds, np.int64) + 1 + i * m
        for i in range(n_mols)])
    mol = np.repeat(np.arange(1, n_mols + 1), m)
    return init_state(cfg, x, v=v, bonds=bonds, mol=mol)


def _match_by_tag(s_sh, s_l, atol):
    a1, a2 = np.asarray(s_sh.alive), np.asarray(s_l.alive)
    m1 = {int(t): np.asarray(s_sh.x)[i]
          for i, t in enumerate(np.asarray(s_sh.tag)) if a1[i]}
    m2 = {int(t): np.asarray(s_l.x)[i]
          for i, t in enumerate(np.asarray(s_l.tag)) if a2[i]}
    assert set(m1) == set(m2)
    diffs = [np.abs(m1[t] - m2[t]).max() for t in m1]
    assert max(diffs) < atol, max(diffs)


def test_slab_angles_dihedrals_match_single_chip():
    """4-bead chains with harmonic bonds + angles + dihedrals straddling
    slab faces: 3 slab steps match the single-chip nlist engine (r3
    VERDICT item 4 — the bonded reach rides a widened halo and resolves
    by tag)."""
    from obmd_tpu.config import (AngleHarmonicParams,
                                 DihedralHarmonicParams)
    box = Box((0.0, 0.0, 0.0), (24.0, 4.0, 4.0), (False, True, True))
    cfg = SceneConfig(
        box=box, masses=(1.0,), dt=0.004,
        pair=DPDParams.create(temp=0.4, cutoff=1.0, seed=9, a0=20.0,
                              gamma=2.0),
        bond=BondHarmonicParams(k=50.0, r0=0.65),
        angle=AngleHarmonicParams(k=(8.0,), theta0=(120.0,)),
        dihedral=DihedralHarmonicParams(k=1.5, d=1, n=2),
        capacity=Capacity(n_max=256, cell_capacity=16),
        skin=0.3, force_path="nlist")
    st = setup(cfg, _chain_state(cfg, CHAIN4, 60, spread=0.3))

    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV, n_loc=128)
    assert geom.halo_w > 1.0   # widened beyond the pair cutoff
    sst = shard_by_slab(cfg, geom, st, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    lstep = jax.jit(make_step(cfg))
    s_sh, s_l = sst, st
    for _ in range(3):
        s_sh = sstep(s_sh)
        s_l = lstep(s_l)
    assert int(s_sh.cell_overflow) == 0
    _match_by_tag(s_sh, s_l, 1e-4)


def test_slab_rigid_matches_single_chip():
    """Rigid trimers (fix obmd `rigid` analogue) under domain
    decomposition: bodies straddling slab faces stay rigid and match the
    single-chip rigid integrator."""
    import dataclasses
    box = Box((0.0, 0.0, 0.0), (16.0, 4.0, 4.0), (False, True, True))
    b = 2.5
    r1 = RegionBlock((0.0, 0.0, 0.0), (b, 4.0, 4.0))
    r2 = RegionBlock((13.5, 0.0, 0.0), (16.0, 4.0, 4.0))
    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=11, pxx=1.0, alpha=0.5, tau=0.01, nbuf=60.0,
        region1=r1, region2=r2, region5=r1, region6=r2, buffer_size=b,
        usher=None, near=0.45, mol=TRIMER, mol_len=3, insert_kmax=4,
        rigid=True)
    import dataclasses as _dc
    cfg = SceneConfig(
        box=box, masses=(1.0,), dt=0.004,
        pair=DPDParams.create(temp=0.4, cutoff=1.0, seed=9, a0=15.0,
                              gamma=2.0),
        capacity=Capacity(n_max=900, cell_capacity=20),
        obmd=obmd, skin=0.3, force_path="nlist").finalize()
    # single-chip molecule-mode OBMD runs on the cellpad engine
    cfg_local = _dc.replace(cfg, force_path="cellpad")
    st = setup(cfg_local, _chain_state(cfg_local, TRIMER, 40, spread=0.4))

    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV, n_loc=160)
    sst = shard_by_slab(cfg, geom, st, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    lstep = jax.jit(make_step(cfg_local))
    s_sh, s_l = sst, st
    for _ in range(3):
        s_sh = sstep(s_sh)
        s_l = lstep(s_l)
    assert int(s_sh.cell_overflow) == 0
    _match_by_tag(s_sh, s_l, 2e-4)
    # bodies stayed rigid: every complete trimer holds the template arms
    alive = np.asarray(s_sh.alive)
    mols = np.asarray(s_sh.mol)
    tags = np.asarray(s_sh.tag)
    xs = np.asarray(s_sh.x)
    arm = float(np.linalg.norm(np.subtract(TRIMER.dx[0], TRIMER.dx[1])))
    checked = 0
    for mid in np.unique(mols[alive & (mols > 0)]):
        rows = np.where(alive & (mols == mid))[0]
        if len(rows) != 3:
            continue
        rows = rows[np.argsort(tags[rows])]
        d1 = xs[rows[0]] - xs[rows[1]]
        d1[1:] -= 4.0 * np.round(d1[1:] / 4.0)
        assert abs(np.linalg.norm(d1) - arm) < 5e-3, mid
        checked += 1
    assert checked >= 5


def test_slab_inserted_velocity_keywords():
    """fix-deposit vz/vy keywords on the slab path: fresh inserts carry
    the drawn velocity, and the momentum tally feeds the setpoint."""
    import dataclasses
    cfg, st = _mol_scene()
    cfg = dataclasses.replace(
        cfg, obmd=dataclasses.replace(cfg.obmd, vz=(0.4, 0.4)))
    tag0 = int(st.maxtag)
    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV, n_loc=240)
    sst = shard_by_slab(cfg, geom, st, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    for _ in range(3):
        sst = sstep(sst)
    assert int(sst.obmd.ninserted) > 0
    alive = np.asarray(sst.alive)
    fresh = alive & (np.asarray(sst.tag) > tag0)
    assert fresh.any()
    vz = np.asarray(sst.v)[fresh, 2]
    # drawn at exactly 0.4; a few dt of forces only nudge it
    assert np.abs(vz - 0.4).max() < 0.25, vz
