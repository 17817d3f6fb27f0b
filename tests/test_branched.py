"""Branched molecule topology (<= 4 bonds/atom) + harmonic impropers.

Reference surfaces covered: molecule templates with >2 bonds/atom
(molecule.cpp imposes no chain restriction), improper bookkeeping on
deletion (fix_obmd_merged.cpp:709-821), and `improper_style harmonic`
(MOLECULE/improper_harmonic.cpp — golden-validated against the reference
binary by validation/run_improper_golden.py; here the force is pinned
against finite differences of the energy).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obmd_tpu.config import (AngleHarmonicParams, BondHarmonicParams,
                             Capacity, DPDParams, ImproperHarmonicParams,
                             MolTemplate, ObmdParams, SceneConfig,
                             UsherParams)
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.state import init_state

# 4-arm star: center (type 2, idx 1) + 4 arms (type 1, idx 0); one
# improper over arms 1-3 centered on atom 0
_S = 0.55
STAR = MolTemplate(
    dx=((0.0, 0.0, 0.0), (_S, 0.0, 0.0), (-_S, 0.05, 0.0),
        (0.0, _S, 0.05), (0.0, -0.05, _S)),
    types=(1, 0, 0, 0, 0), q=(0.0,) * 5,
    bonds=((0, 1), (0, 2), (0, 3), (0, 4)),
    impropers=((1, 1, 0, 2, 3),))


def _star_cfg(n_max=900, improper=True):
    box = Box((0.0, 0.0, 0.0), (10.0, 4.0, 4.0), (False, True, True))
    b = 2.0
    r1 = RegionBlock((0.0, 0.0, 0.0), (b, 4.0, 4.0))
    r2 = RegionBlock((8.0, 0.0, 0.0), (10.0, 4.0, 4.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=3, a0=25.0,
                            gamma=4.5, ntypes=2)
    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=11, pxx=5.0, alpha=0.5, tau=0.01, nbuf=150.0,
        region1=r1, region2=r2, region3=deg, region4=deg, region5=r1,
        region6=r2, buffer_size=b,
        usher=UsherParams(etarget=12.0, nattempt=12),
        mol=STAR, mol_len=5, insert_kmax=4)
    return SceneConfig(
        box=box, masses=(1.0, 1.0), pair=pair, dt=0.01,
        capacity=Capacity(n_max=n_max, cell_capacity=22),
        obmd=obmd, bond=BondHarmonicParams(k=40.0, r0=_S),
        improper=(ImproperHarmonicParams(k=(0.0, 8.0), chi0=(0.0, 30.0))
                  if improper else None),
        skin=0.3, force_path="cellpad").finalize()


def test_star_template_branched_flag():
    cfg = _star_cfg()
    assert cfg.branched_topology     # finalize() derives it from STAR
    st = init_state(cfg, np.zeros((0, 3)))
    assert st.bond3 is not None and st.bond4 is not None
    assert st.impr is not None


def test_star_insert_integrate_delete():
    """A 4-arm star template inserts whole, carries 4 bond partners on its
    center + the improper triplet, integrates, and deletes as a unit
    (VERDICT round-3 item 9's done-criterion)."""
    cfg = _star_cfg()
    r = np.random.default_rng(4)
    n0 = 300
    x = r.uniform([0.05, 0.05, 0.05], [9.95, 3.95, 3.95], (n0, 3))
    v = r.normal(0, 1, (n0, 3))
    st = setup(cfg, init_state(cfg, x, v=v))
    step = jax.jit(make_step(cfg))
    for _ in range(8):
        st = step(st)
    n_ins = int(st.obmd.ninserted)
    assert n_ins > 0 and n_ins % 5 == 0, n_ins
    # conservation identity: every atom is accounted for
    assert int(st.natoms) == n0 - int(st.obmd.ndeleted) + n_ins
    alive = np.asarray(st.alive)
    tags = np.asarray(st.tag)
    mols = np.asarray(st.mol)
    types = np.asarray(st.type)
    cols = [np.asarray(c) for c in st.bond_partners]
    impr = np.asarray(st.impr)
    new = [i for i in range(len(tags)) if alive[i] and tags[i] > n0]
    assert new and len(new) % 5 == 0
    centers = [i for i in new if types[i] == 1]
    assert len(centers) == len(new) // 5
    for c in centers:
        arms = [int(col[c]) for col in cols]
        assert all(a >= 0 for a in arms), arms        # 4 live partners
        for a in arms:
            assert alive[a] and mols[a] == mols[c]
            # the arm points back at the center through SOME column
            assert c in [int(col[a]) for col in cols]
        # improper triplet = template arms (1, 2, 3) -> slots of arms
        tri = impr[c]
        assert (tri >= 0).all()
        assert set(int(t) for t in tri) <= set(arms)
    # arm atoms carry no improper
    for i in new:
        if types[i] == 0:
            assert (impr[i] < 0).all()


def test_star_deletes_whole():
    """Doom propagation reaches all 4 arms through the center (the 4-column
    analogue of whole-molecule deletion, ref :709-821)."""
    cfg = _star_cfg()
    # nbuf = 0 turns the feedback law pure-negative: no insertions confound
    # the deletion count
    cfg = dataclasses.replace(
        cfg, obmd=dataclasses.replace(cfg.obmd, nbuf=0.0)).finalize()
    # one star straddling the open face: center outside
    x = np.asarray(STAR.dx) + np.asarray([-0.1, 2.0, 2.0])
    st = init_state(cfg, x, types=list(STAR.types), mol=[1] * 5,
                    bonds=[(a + 1, b + 1) for a, b in STAR.bonds])
    st = setup(cfg, st)
    assert int(st.natoms) == 0       # whole star deleted, not just the center
    assert int(st.obmd.ndeleted) == 5


def _fd_check(force_fn, energy_fn, x0, h=1e-5, atol=2e-3):
    """max |F + dE/dx| over all coordinates by central differences."""
    f = np.asarray(force_fn(x0))
    worst = 0.0
    for i in range(x0.shape[0]):
        for k in range(3):
            xp = x0.copy(); xp[i, k] += h
            xm = x0.copy(); xm[i, k] -= h
            g = (float(energy_fn(xp)) - float(energy_fn(xm))) / (2 * h)
            worst = max(worst, abs(f[i, k] + g))
    assert worst < atol, worst
    return worst


def test_improper_force_is_energy_gradient():
    """improper_forces == -grad(sum E) by central differences (f64)."""
    from obmd_tpu.forces.bonded import improper_forces
    jax.config.update("jax_enable_x64", True)
    try:
        box = Box((0, 0, 0), (8.0, 8.0, 8.0), (True, True, True))
        imp = ImproperHarmonicParams(k=(0.0, 7.0), chi0=(0.0, 20.0))
        r = np.random.default_rng(2)
        x0 = np.asarray(STAR.dx, np.float64) + 4.0
        x0[1:] += 0.15 * r.normal(size=(4, 3))
        n = 5
        b1 = np.asarray([1, 0, 0, 0, 0], np.int32)
        b2 = np.asarray([2, -1, -1, -1, -1], np.int32)
        b3 = np.asarray([3, -1, -1, -1, -1], np.int32)
        b4 = np.asarray([4, -1, -1, -1, -1], np.int32)
        impr = np.full((n, 3), -1, np.int32)
        impr[0] = (1, 2, 3)
        typ = jnp.asarray(STAR.types, jnp.int32)
        alive = jnp.ones((n,), bool)
        partners = tuple(jnp.asarray(b) for b in (b1, b2, b3, b4))

        def force(xa):
            f, _ = improper_forces(imp, box, jnp.asarray(xa), partners,
                                   jnp.asarray(impr), typ, alive)
            return f

        def energy(xa):
            _, e = improper_forces(imp, box, jnp.asarray(xa), partners,
                                   jnp.asarray(impr), typ, alive,
                                   compute_energy=True)
            return jnp.sum(e)

        _fd_check(force, energy, x0, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_branched_angles_all_pairs_gradient():
    """The general angle path (4 partner columns, all-partner-pairs
    convention) is the exact gradient of sum K (theta - theta0)^2 over the
    C(4,2)=6 arm pairs."""
    from obmd_tpu.forces.bonded import angle_forces
    jax.config.update("jax_enable_x64", True)
    try:
        box = Box((0, 0, 0), (8.0, 8.0, 8.0), (True, True, True))
        ang = AngleHarmonicParams(k=(0.0, 5.0), theta0=(0.0, 100.0))
        r = np.random.default_rng(3)
        x0 = np.asarray(STAR.dx, np.float64) + 4.0
        x0[1:] += 0.2 * r.normal(size=(4, 3))
        n = 5
        cols = [np.asarray([1, 0, 0, 0, 0], np.int32),
                np.asarray([2, -1, -1, -1, -1], np.int32),
                np.asarray([3, -1, -1, -1, -1], np.int32),
                np.asarray([4, -1, -1, -1, -1], np.int32)]
        typ = jnp.asarray(STAR.types, jnp.int32)
        alive = jnp.ones((n,), bool)
        b1, b2 = jnp.asarray(cols[0]), jnp.asarray(cols[1])
        more = (jnp.asarray(cols[2]), jnp.asarray(cols[3]))

        def force(xa):
            f, _ = angle_forces(ang, box, jnp.asarray(xa), b1, b2, typ,
                                alive, more_partners=more)
            return f

        def energy(xa):
            _, e = angle_forces(ang, box, jnp.asarray(xa), b1, b2, typ,
                                alive, compute_energy=True,
                                more_partners=more)
            return jnp.sum(e)

        _fd_check(force, energy, x0, atol=1e-5)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_init_state_validation():
    cfg = dataclasses.replace(_star_cfg(), obmd=None).finalize()
    # >4 bonds refused loudly
    bonds5 = [(1, k) for k in range(2, 7)]
    x = np.zeros((6, 3)) + 1.0
    with pytest.raises(ValueError, match="more than four"):
        init_state(cfg, x, bonds=bonds5)
    # improper whose center is not bonded to an end refused
    with pytest.raises(ValueError, match="not bonded"):
        init_state(cfg, np.zeros((5, 3)) + 1.0,
                   bonds=[(1, 2), (1, 3), (1, 4)],
                   impropers=[(2, 1, 3, 5)])


def test_partial_angle_set_refused():
    from obmd_tpu.config import derive_center_angle_table
    bonds = [(1, 2), (1, 3), (1, 4), (1, 5)]
    atom_types = {i: 1 if i == 1 else 0 for i in range(1, 6)}
    # declaring only 3 of the 6 partner-pair angles must raise
    angles = [(1, 2, 1, 3), (1, 2, 1, 4), (1, 2, 1, 5)]
    with pytest.raises(ValueError, match="partner-pair"):
        derive_center_angle_table(2, angles, atom_types, bonds,
                                  {1: (5.0, 109.5)})
    # the full set is accepted
    full = angles + [(1, 3, 1, 4), (1, 3, 1, 5), (1, 4, 1, 5)]
    tab = derive_center_angle_table(2, full, atom_types, bonds,
                                    {1: (5.0, 109.5)})
    assert tab.k[1] == 5.0


def test_data_file_improper_roundtrip(tmp_path):
    from obmd_tpu.io import lammps_data
    x = np.asarray(STAR.dx) + 2.0
    df = lammps_data.DataFile(
        natoms=5, ntypes=2, box_lo=np.zeros(3), box_hi=np.full(3, 4.0),
        masses=np.ones(2), x=x,
        types=np.asarray(STAR.types), tags=np.arange(1, 6),
        v=np.zeros((5, 3)), q=np.zeros(5), mol=np.ones(5, np.int64),
        bonds=np.asarray([(a + 1, b + 1) for a, b in STAR.bonds]),
        impropers=np.asarray([(1, 2, 1, 3, 4)]))
    p = str(tmp_path / "star.data")
    lammps_data.write_data(p, df, atom_style="molecular")
    back = lammps_data.read_data(p)
    assert back.impropers is not None
    assert back.impropers.tolist() == [[1, 2, 1, 3, 4]]
    assert len(back.bonds) == 4
