"""AdResS per-atom fields (lambdaF, cms_mol, vcms_mol, rep_atom —
registered at atom.cpp:550-557, carried by atom_vec_adress.cpp:36-61):
COM maintenance vs a numpy oracle, survival through relayout, and
checkpoint round-trip."""
import numpy as np
import jax
import jax.numpy as jnp

from obmd_tpu.adress import update_mol_com
from obmd_tpu.config import Capacity, DPDParams, SceneConfig
from obmd_tpu.geometry import Box
from obmd_tpu.state import init_state


def _chain_state(n_free=40, chains=((1, 2, 3), (4, 5), (6, 7, 8))):
    """A few bonded chains (mol != 0) plus free atoms in a periodic box."""
    box = Box((0.0, 0.0, 0.0), (8.0, 4.0, 4.0), (False, True, True))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=9, a0=25.0, gamma=4.5)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                      capacity=Capacity(n_max=256, cell_capacity=24),
                      skin=0.3, force_path="sweep")
    rng = np.random.default_rng(0)
    n_chain = sum(len(c) for c in chains)
    n = n_chain + n_free
    x = rng.uniform([0.5, 0.5, 0.5], [7.5, 3.5, 3.5], (n, 3))
    # keep chain members near each other (bond slots don't care, but keeps
    # the scene physical)
    mol = np.zeros(n, np.int64)
    bonds = []
    row = 0
    for ci, chain in enumerate(chains):
        base = x[row].copy()
        for j, tag in enumerate(chain):
            x[row] = base + np.asarray([0.3 * j, 0.0, 0.0])
            mol[row] = ci + 1
            if j > 0:
                bonds.append((chain[j - 1], tag))
            row += 1
    v = rng.normal(0, 1, (n, 3))
    st = init_state(cfg, x, v=v, mol=mol, bonds=bonds)
    return cfg, st


def _numpy_com(cfg, st):
    x = np.asarray(st.x)
    v = np.asarray(st.v)
    mol = np.asarray(st.mol)
    alive = np.asarray(st.alive)
    cms = np.zeros_like(x)
    vcms = np.zeros_like(v)
    for mid in np.unique(mol[alive & (mol != 0)]):
        rows = np.nonzero(alive & (mol == mid))[0]
        cms[rows] = x[rows].mean(axis=0)
        vcms[rows] = v[rows].mean(axis=0)
    return cms, vcms


def test_mol_com_matches_numpy_oracle():
    cfg, st = _chain_state()
    st2 = jax.jit(lambda s: update_mol_com(cfg, s, rounds=2))(st)
    cms_ref, vcms_ref = _numpy_com(cfg, st)
    np.testing.assert_allclose(np.asarray(st2.cms_mol), cms_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.vcms_mol), vcms_ref,
                               atol=1e-5)
    # free atoms (mol == 0) stay zero
    free = np.asarray(st.mol) == 0
    assert np.all(np.asarray(st2.cms_mol)[free] == 0.0)


def test_fields_survive_relayout():
    """cellpad layout_build permutes every slot; the AdResS fields and the
    bond-slot references must follow, so a recomputed COM is unchanged."""
    from obmd_tpu.cellpad import layout_build
    from obmd_tpu.forces.pallas_dpd import PadGeometry
    cfg, st = _chain_state()
    st = jax.jit(lambda s: update_mol_com(cfg, s, rounds=2))(st)
    lam = jnp.where(st.alive, 0.25 * st.tag.astype(st.x.dtype), 0.0)
    rep = jnp.where(st.alive & (st.tag % 3 == 0), 1, 0)
    st = st.replace(lambdaF=lam, rep_atom=rep)
    geom = PadGeometry.create(cfg.box, cfg.pair.max_cut + cfg.skin, 24)
    new = jax.jit(lambda s: layout_build(geom, cfg.box, s))(st)

    def tagmap(s, arr):
        a = np.asarray(s.alive)
        t = np.asarray(s.tag)
        vals = np.asarray(arr)
        return {int(t[i]): vals[i] for i in np.nonzero(a)[0]}

    for field in ("lambdaF", "rep_atom", "cms_mol", "vcms_mol"):
        m_old = tagmap(st, getattr(st, field))
        m_new = tagmap(new, getattr(new, field))
        assert set(m_old) == set(m_new)
        for t in m_old:
            np.testing.assert_allclose(m_new[t], m_old[t], atol=1e-6)
    # COM recomputed from the permuted layout matches too (bond slots
    # were remapped correctly)
    new2 = jax.jit(lambda s: update_mol_com(cfg, s, rounds=2))(new)
    m_a = tagmap(new, new.cms_mol)
    m_b = tagmap(new2, new2.cms_mol)
    for t in m_a:
        np.testing.assert_allclose(m_b[t], m_a[t], atol=1e-5)


def test_fields_roundtrip_checkpoint(tmp_path):
    from obmd_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    cfg, st = _chain_state()
    st = jax.jit(lambda s: update_mol_com(cfg, s, rounds=2))(st)
    st = st.replace(lambdaF=jnp.where(st.alive, 0.5, 0.0),
                    rep_atom=jnp.where(st.tag % 2 == 0, 1, 0))
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, cfg, st)
    _, st2 = load_checkpoint(p, cfg)
    for field in ("lambdaF", "cms_mol", "vcms_mol", "rep_atom"):
        np.testing.assert_array_equal(np.asarray(getattr(st2, field)),
                                      np.asarray(getattr(st, field)))
