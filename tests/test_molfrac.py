"""Multi-template molfrac insertion (reference onemols/molfrac,
fix_obmd_merged.cpp:2039-2054): each candidate draws its template from the
molfrac distribution; templates of different sizes coexist."""
import dataclasses

import jax
import numpy as np

from obmd_tpu.config import (Capacity, DPDParams, MolTemplate, ObmdParams,
                             SceneConfig)
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.state import init_state

DIMER = MolTemplate(dx=((-0.45, 0.0, 0.0), (0.45, 0.0, 0.0)),
                    types=(0, 0), q=(0.0, 0.0), bonds=((0, 1),))
TRIMER = MolTemplate(
    dx=((-0.5, -0.15, 0.0), (0.0, 0.25, 0.0), (0.5, -0.15, 0.0)),
    types=(0, 0, 0), q=(0.0, 0.0, 0.0), bonds=((0, 1), (1, 2)))


def _cfg(molfrac=(0.5, 0.5)):
    box = Box((0.0, 0.0, 0.0), (10.0, 4.0, 4.0), (False, True, True))
    b = 2.0
    r1 = RegionBlock((0.0, 0.0, 0.0), (b, 4.0, 4.0))
    r2 = RegionBlock((8.0, 0.0, 0.0), (10.0, 4.0, 4.0))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=3, a0=25.0, gamma=4.5)
    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=11, pxx=5.0, alpha=0.5, tau=0.01, nbuf=160.0,
        region1=r1, region2=r2, region5=r1, region6=r2, buffer_size=b,
        usher=None, near=0.5,
        mol=DIMER, mols=(DIMER, TRIMER), molfrac=molfrac,
        mol_len=2, insert_kmax=6, maxattempt=2)
    return SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                       capacity=Capacity(n_max=900, cell_capacity=22),
                       obmd=obmd, skin=0.3, force_path="cellpad")


def test_molfrac_inserts_both_templates():
    cfg = _cfg()
    r = np.random.default_rng(4)
    n0 = 260
    x = r.uniform([0.05, 0.05, 0.05], [9.95, 3.95, 3.95], (n0, 3))
    v = r.normal(0, 1, (n0, 3))
    st = setup(cfg, init_state(cfg, x, v=v))
    step = jax.jit(make_step(cfg))
    for _ in range(12):
        st = step(st)
    assert int(st.obmd.ninserted) > 0
    alive = np.asarray(st.alive)
    mols = np.asarray(st.mol)
    b1 = np.asarray(st.bond1)
    b2 = np.asarray(st.bond2)
    sizes = []
    for mid in np.unique(mols[alive & (mols > 0)]):
        rows = np.where(alive & (mols == mid))[0]
        sizes.append(len(rows))
        # bond wiring: every atom has >= 1 live partner of the same mol
        for i in rows:
            ps = [p for p in (b1[i], b2[i]) if p >= 0]
            assert ps, (mid, i)
            for p in ps:
                assert alive[p] and mols[p] == mid
    sizes = np.asarray(sizes)
    # both template kinds appear (whole molecules only; partial deletions
    # at the open faces can produce other sizes transiently)
    assert (sizes == 2).sum() > 0, sizes
    assert (sizes == 3).sum() > 0, sizes


def test_molfrac_skews_selection():
    """molfrac (1, 0) must insert only dimers."""
    cfg = _cfg(molfrac=(1.0, 0.0))
    r = np.random.default_rng(5)
    x = r.uniform([0.05, 0.05, 0.05], [9.95, 3.95, 3.95], (260, 3))
    st = setup(cfg, init_state(cfg, x, v=r.normal(0, 1, (260, 3))))
    step = jax.jit(make_step(cfg))
    for _ in range(12):
        st = step(st)
    assert int(st.obmd.ninserted) > 0
    alive = np.asarray(st.alive)
    mols = np.asarray(st.mol)
    tags = np.asarray(st.tag)
    for mid in np.unique(mols[alive & (mols > 0)]):
        rows = np.where(alive & (mols == mid))[0]
        # inserted molecules are dimers (2 atoms, consecutive tags),
        # allowing 1 when half a dimer fell out of the open face
        assert len(rows) <= 2, (mid, tags[rows])


def test_molfrac_validation():
    import pytest
    with pytest.raises(ValueError, match="sum to 1"):
        _cfg(molfrac=(0.9, 0.9))
    with pytest.raises(ValueError, match="one fraction per"):
        _cfg(molfrac=(1.0,))
