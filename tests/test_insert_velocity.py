"""Inserted-velocity keywords `vx/vy/vz lo hi` + `target tx ty tz`
(fix-deposit semantics; reference parses them at fix_obmd_merged.cpp:2118-2161
but hardcodes vnew=0 at :1076-1078 — here they are honored, with the
inserted momentum entering the boundary-force tally) and MOLECULE-mode
`maxattempt` rounds (ref :913-935; round-2 VERDICT weak #4)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.config import (Capacity, DPDParams, MolTemplate, ObmdParams,
                             SceneConfig)
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.state import init_state


def _drain_cfg(force_path="nlist", mol=None, **obmd_kw):
    box = Box((0.0, 0.0, 0.0), (8.0, 4.0, 4.0), (False, True, True))
    r1 = RegionBlock((0.0, 0.0, 0.0), (1.6, 4.0, 4.0))
    r2 = RegionBlock((6.4, 0.0, 0.0), (8.0, 4.0, 4.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=77, a0=25.0,
                            gamma=4.5)
    kw = dict(ntype=0, nfreq=1, seed=31, pxx=25.0, alpha=1.0, tau=0.05,
              nbuf=220.0, region1=r1, region2=r2, region3=deg, region4=deg,
              region5=r1, region6=r2, buffer_size=1.6, near=0.30,
              insert_kmax=8, maxattempt=1)
    kw.update(obmd_kw)
    if mol is not None:
        kw["mol"] = mol
        kw["mol_len"] = mol.natoms
    obmd = ObmdParams(**kw)
    return SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                       capacity=Capacity(n_max=1400, cell_capacity=28),
                       obmd=obmd, skin=0.3, force_path=force_path)


def _run(cfg, nsteps=30, n0=400):
    rng = np.random.default_rng(5)
    st = init_state(cfg, rng.uniform([0, 0, 0], [8, 4, 4], (n0, 3)),
                    v=rng.normal(0, 1.0, (n0, 3)))
    st = setup(cfg, st)
    step = jax.jit(make_step(cfg))
    for _ in range(nsteps):
        st = step(st)
    return st


def _fresh(cfg, nsteps=6):
    """Run nsteps, returning (state, mask of atoms inserted on the LAST
    step).  Only last-step insertions still carry ~their drawn velocity;
    older ones have been randomized by nsteps of DPD forces.  id_policy
    'next' makes tags monotone, so last-step = tag > pre-step max."""
    rng = np.random.default_rng(5)
    st = init_state(cfg, rng.uniform([0, 0, 0], [8, 4, 4], (400, 3)),
                    v=rng.normal(0, 1.0, (400, 3)))
    st = setup(cfg, st)
    step = jax.jit(make_step(cfg))
    for _ in range(nsteps - 1):
        st = step(st)
    tag_hi = int(np.max(np.asarray(st.tag)[np.asarray(st.alive)]))
    st = step(st)
    new = np.asarray(st.alive) & (np.asarray(st.tag) > tag_hi)
    return st, new


def test_inserted_velocity_bounds_atom_mode():
    """vx/vy/vz draws land inside [lo, hi] for atoms inserted this step
    (modulo the one half-kick+drift that follows insertion)."""
    cfg = _drain_cfg(vx=(0.5, 0.9), vy=(-0.2, 0.2), vz=(0.0, 0.0))
    st, new = _fresh(cfg, nsteps=6)
    assert int(st.obmd.ninserted) > 10
    assert new.sum() > 2
    v = np.asarray(st.v)[new]
    # one NVE half-kick perturbs the draw by ~0.5*dt*f
    assert (v[:, 0] > 0.2).all() and (v[:, 0] < 1.2).all()
    assert (np.abs(v[:, 1]) < 0.6).all()
    assert (np.abs(v[:, 2]) < 0.4).all()
    # default (no keywords) inserts at rest
    st0, new0 = _fresh(_drain_cfg(), nsteps=6)
    v0 = np.asarray(st0.v)[new0]
    assert np.abs(v0[:, 0]).mean() < np.abs(v[:, 0]).mean()


def test_target_redirects_velocity():
    """`target` points inserted velocities at the target point, preserving
    magnitude: fresh atoms move toward the box center."""
    cfg = _drain_cfg(vx=(0.6, 0.6), vy=(0.0, 0.0), vz=(0.0, 0.0),
                     target=(4.0, 2.0, 2.0))
    st, new = _fresh(cfg, nsteps=4)
    assert new.sum() > 2
    x = np.asarray(st.x)[new]
    v = np.asarray(st.v)[new]
    to_t = np.asarray([4.0, 2.0, 2.0])[None, :] - x
    cos = np.sum(v * to_t, axis=1) / (
        np.linalg.norm(v, axis=1) * np.linalg.norm(to_t, axis=1) + 1e-12)
    # the post-insertion half-kick perturbs direction slightly
    assert np.median(cos) > 0.8


def test_cellpad_engine_honors_velocity_keywords():
    cfg = _drain_cfg(force_path="cellpad", vx=(0.5, 0.9))
    st = _run(cfg, nsteps=6)
    new = np.asarray(st.alive) & (np.asarray(st.tag) > 400)
    assert new.sum() > 5
    v = np.asarray(st.v)[new]
    assert v[:, 0].mean() > 0.3


def _trimer():
    return MolTemplate(dx=((-0.4, 0.0, 0.0), (0.0, 0.0, 0.0),
                           (0.4, 0.0, 0.0)),
                       types=(0, 0, 0), q=(0.0, 0.0, 0.0),
                       bonds=((0, 1), (1, 2)))


def test_mol_maxattempt_meets_demand_under_drain():
    """MOLECULE-mode insertion under strong drain: maxattempt rounds close
    the deficit one round cannot (the ATOM-mode test_maxattempt scenario in
    molecule mode; VERDICT round-2 weak #4 done-criterion)."""
    mol = _trimer()
    kw = dict(mol=mol, nbuf=80.0, insert_kmax=6, force_path="cellpad")
    s1 = _run(_drain_cfg(**kw, maxattempt=1), nsteps=25)
    s4 = _run(_drain_cfg(**kw, maxattempt=4), nsteps=25)
    f1, f4 = int(s1.obmd.insert_fail), int(s4.obmd.insert_fail)
    assert f1 > 8, f"drain scene not stressful enough (fail1={f1})"
    # extra rounds close a substantial share of the deficit (the near=0.30
    # check in a crowded buffer rejects most draws, so even 4 rounds cannot
    # drive insert_fail to zero in this deliberately over-stressed scene)
    assert f4 < 0.7 * f1, (f1, f4)
    assert int(s4.obmd.ninserted) > int(s1.obmd.ninserted)
    # inserted molecules are whole trimers
    assert int(s4.obmd.ninserted) % 3 == 0
