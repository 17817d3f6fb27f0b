"""Molecule-mode OBMD insertion (the reference's `mol` keyword,
fix_obmd_merged.cpp MOLECULE branches): dimer template with a FENE bond,
random rotations, all-or-nothing placement, whole-molecule deletion."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.config import (BondFENEParams, Capacity, DPDParams, MolTemplate,
                             ObmdParams, SceneConfig, UsherParams)
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.state import init_state

DIMER = MolTemplate(dx=((-0.485, 0.0, 0.0), (0.485, 0.0, 0.0)),
                    types=(0, 0), q=(0.0, 0.0), bonds=((0, 1),))


def _cfg(n_max=800, usher=True):
    box = Box((0.0, 0.0, 0.0), (10.0, 4.0, 4.0), (False, True, True))
    b = 2.0
    r1 = RegionBlock((0.0, 0.0, 0.0), (b, 4.0, 4.0))
    r2 = RegionBlock((8.0, 0.0, 0.0), (10.0, 4.0, 4.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=3, a0=25.0, gamma=4.5)
    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=11, pxx=5.0, alpha=0.5, tau=0.01, nbuf=160.0,
        region1=r1, region2=r2, region3=deg, region4=deg, region5=r1,
        region6=r2, buffer_size=b,
        usher=UsherParams(etarget=10.0, nattempt=12) if usher else None,
        near=None if usher else 0.6,
        mol=DIMER, mol_len=2, insert_kmax=4)
    return SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                       capacity=Capacity(n_max=n_max, cell_capacity=22),
                       obmd=obmd, bond=BondFENEParams(k=30.0, r0=1.5),
                       skin=0.3, force_path="cellpad")


def _run(cfg, nsteps=6, n0=300, seed=4):
    r = np.random.default_rng(seed)
    x = r.uniform([0.05, 0.05, 0.05], [9.95, 3.95, 3.95], (n0, 3))
    v = r.normal(0, 1, (n0, 3))
    st = setup(cfg, init_state(cfg, x, v=v))
    step = jax.jit(make_step(cfg))
    for _ in range(nsteps):
        st = step(st)
    return st


def test_dimer_insertion_usher():
    cfg = _cfg(usher=True)
    st = _run(cfg)
    n_ins = int(st.obmd.ninserted)
    assert n_ins > 0 and n_ins % 2 == 0, n_ins
    alive = np.asarray(st.alive)
    tags = np.asarray(st.tag)
    b1 = np.asarray(st.bond1)
    mols = np.asarray(st.mol)
    # every inserted atom (tag > 300) has exactly one bond partner, the
    # partner is alive with the same molecule id, and the pair is intact
    new = [i for i in range(len(tags)) if alive[i] and tags[i] > 300]
    # inserted dimers near the open face can exit and are deleted whole, so
    # surviving count is even and bounded by insertions
    assert 0 < len(new) <= n_ins and len(new) % 2 == 0
    for i in new:
        assert b1[i] >= 0          # partner SLOT
        j = int(b1[i])
        assert alive[j]
        assert mols[i] == mols[j] > 0
        d = np.asarray(st.x)[i] - np.asarray(st.x)[j]
        d[1:] -= 4.0 * np.round(d[1:] / 4.0)
        assert 0.2 < np.linalg.norm(d) < 1.45   # bonded, inside FENE range


def test_dimer_insertion_near():
    cfg = _cfg(usher=False)
    st = _run(cfg, seed=5)
    n_ins = int(st.obmd.ninserted)
    assert n_ins % 2 == 0
    assert int(st.natoms) == 300 - int(st.obmd.ndeleted) + n_ins


def test_late_inserted_dimer_keeps_bond_past_tag_overflow():
    """Round-1 Weak #3 regression: with tag-keyed bond resolution, a dimer
    inserted after maxtag > capacity silently lost its FENE bond.  Partner
    SLOTS make resolution exact for any tag value: start with maxtag far
    beyond the capacity and check that freshly inserted dimers still feel a
    bond force and still die as a unit."""
    from obmd_tpu.forces.bonded import fene_forces
    cfg = _cfg(usher=True)
    r = np.random.default_rng(9)
    x = r.uniform([0.05, 0.05, 0.05], [9.95, 3.95, 3.95], (300, 3))
    st = setup(cfg, init_state(cfg, x, v=r.normal(0, 1, (300, 3))))
    st = st.replace(maxtag=jnp.asarray(10_000_000, jnp.int32))
    step = jax.jit(make_step(cfg))
    for _ in range(6):
        st = step(st)
    alive = np.asarray(st.alive)
    tags = np.asarray(st.tag)
    new = [i for i in range(len(tags)) if alive[i] and tags[i] > 10_000_000]
    assert len(new) >= 2, "no insertions landed"
    f, _ = fene_forces(cfg.bond, cfg.box, st.x, st.bond1, st.bond2, st.alive)
    f = np.asarray(f)
    b1 = np.asarray(st.bond1)
    for i in new:
        j = int(b1[i])
        assert j >= 0 and alive[j] and tags[j] > 10_000_000
        assert np.abs(f[i]).max() > 1e-6, "late-inserted dimer feels no bond"
    # whole-molecule deletion still fires for them: doom one atom's position
    i = new[0]
    st2 = st.replace(x=st.x.at[i].set(jnp.asarray([-0.3, 1.0, 1.0])))
    from obmd_tpu.obmd.stage import delete_outside
    st3, _, _ = jax.jit(lambda s: delete_outside(cfg, s))(st2)
    alive3 = np.asarray(st3.alive)
    assert not alive3[i] and not alive3[int(b1[i])]


def test_molecule_deletion_whole():
    """A dimer straddling the boundary is deleted as a unit."""
    cfg = _cfg(usher=True, n_max=64)
    x = np.asarray([[5.0, 2.0, 2.0],      # bystander
                    [0.05, 1.0, 1.0],     # dimer atom A (inside)
                    [9.95, 3.0, 3.0]])    # unrelated atom
    st = init_state(cfg, x)
    # wire rows 1,2 as a molecule (partner SLOTS); push one atom outside
    st = st.replace(
        x=st.x.at[1].set(jnp.asarray([0.05, 1.0, 1.0])),
        bond1=st.bond1.at[1].set(2).at[2].set(1),
        mol=st.mol.at[1].set(7).at[2].set(7))
    # move atom tag 3 (index 2) outside the box
    st = st.replace(x=st.x.at[2].set(jnp.asarray([-0.2, 3.0, 3.0])))
    from obmd_tpu.obmd.stage import delete_outside
    st2, vnewl, vnewr = jax.jit(lambda s: delete_outside(cfg, s))(st)
    alive = np.asarray(st2.alive)
    # atom index 2 escaped; its bonded partner index 1 must go too
    assert not alive[2] and not alive[1]
    assert alive[0]


def test_usher_rotation_improves_acceptance():
    """Rotation steering (ref usher() :1588-1605, with the correct
    all-atom torque instead of calc_torque's last-atom bug) must rotate
    dimers into lower-energy orientations: at a tight etarget in a dense
    bath it accepts measurably more candidates than translation-only, and
    it must preserve the rigid template geometry (bond length)."""
    import dataclasses
    from obmd_tpu.obmd.subset import (Subset, mol_candidates,
                                      random_rotations,
                                      usher_search_subset_mol)
    from obmd_tpu.geometry import RegionBlock
    from obmd_tpu.cells import BIG

    r = np.random.default_rng(12)
    region = RegionBlock((0.0, 0.0, 0.0), (3.0, 3.0, 3.0))
    nb = 110                       # dense bath: rho ~ 4 in the region
    bath = r.uniform(0.0, 3.0, (nb, 3)).astype(np.float32)
    sub = Subset(idx=jnp.zeros((nb,), jnp.int32),
                 x=jnp.asarray(bath), type=jnp.zeros((nb,), jnp.int32),
                 q=jnp.zeros((nb,), jnp.float32),
                 valid=jnp.ones((nb,), bool),
                 overflow=jnp.zeros((), bool))
    K = 96
    key = jax.random.PRNGKey(7)
    ku, kr = jax.random.split(key)
    centers = jnp.asarray(
        r.uniform(0.3, 2.7, (K, 3)).astype(np.float32))
    rots = random_rotations(kr, K, jnp.float32)
    coords = mol_candidates(DIMER, centers, rots)
    mol_types = jnp.zeros((2,), jnp.int32)

    def run(dtheta0):
        cfg = _cfg(usher=True)
        u = dataclasses.replace(cfg.obmd.usher, etarget=12.0, ds0=0.25,
                                dtheta0=dtheta0, nattempt=25)
        cfg = dataclasses.replace(
            cfg, obmd=dataclasses.replace(cfg.obmd, usher=u))
        pos, acc, iters = jax.jit(
            lambda c: usher_search_subset_mol(cfg, sub, c, mol_types,
                                              region))(coords)
        return np.asarray(pos), int(jnp.sum(acc))

    pos0, acc_norot = run(0.0)
    pos1, acc_rot = run(0.5)
    assert acc_rot > acc_norot, (acc_rot, acc_norot)
    # the steering must preserve the rigid template geometry
    bl = np.linalg.norm(pos1[:, 0] - pos1[:, 1], axis=-1)
    np.testing.assert_allclose(bl, 0.97, atol=1e-3)
