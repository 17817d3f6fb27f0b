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
    # ATOM-mode insertion: trial particles are neutral (charged requires
    # MOLECULE mode, fix_obmd_merged.cpp:2108; ATOM-mode created atoms get
    # q=0) — charged trials are covered by the molecule-mode tests below
    obmd = ObmdParams(ntype=0, nfreq=1, seed=3, pxx=1.0, alpha=0.5, tau=0.05,
                      nbuf=40.0, region1=r1, region2=r2, region3=deg,
                      region4=deg, region5=r1, region6=r2, buffer_size=b,
                      near=0.9, usher=None, insert_kmax=4)
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


# ---------------------------------------------------------------------------
# charged MOLECULE-mode insertion: trial energies with template charges
# (single_atomistic_obmd, pair_lj_cut_rf.cpp:533-616; chargeflag branch of
# usher(), fix_obmd_merged.cpp:1545-1551)
# ---------------------------------------------------------------------------

def _rf_oracle_energy(xj, qj, coords, mol_q, box_len, periodic, p):
    """float64 numpy oracle: sum over template atoms m of
    single_atomistic_obmd(qi=mol_q[m], j, ...) over all subset atoms j,
    transcribing pair_lj_cut_rf.cpp:533-616 (single type)."""
    eps = float(np.asarray(p.epsilon)[0][0])
    sig = float(np.asarray(p.sigma)[0][0])
    cut = float(np.asarray(p.cut)[0][0])
    erf = float(np.asarray(p.eps_rf)[0][0])
    ccoul = p.cut_coul
    qq = p.qqrd2e
    lj3 = 4.0 * eps * sig ** 12
    lj4 = 4.0 * eps * sig ** 6
    rf1 = erf - 1.0
    rf2 = 1.0 + 2.0 * erf
    K, m, _ = coords.shape
    E = np.zeros(K)
    for k in range(K):
        for a in range(m):
            d = coords[k, a][None, :] - xj          # [B,3]
            for ax in range(3):
                if periodic[ax]:
                    d[:, ax] -= box_len[ax] * np.round(d[:, ax] / box_len[ax])
            rsq = np.sum(d * d, axis=1)
            r = np.sqrt(rsq)
            in_lj = rsq < cut * cut
            r6 = 1.0 / np.maximum(rsq, 1e-30) ** 3
            elj = np.where(in_lj, r6 * (lj3 * r6 - lj4), 0.0)
            in_c = rsq < ccoul * ccoul
            qprod = qq * mol_q[a] * qj
            ec = (qprod / np.maximum(r, 1e-30)
                  * (1.0 + (rf1 / rf2) * (r / ccoul) ** 3)
                  - qprod * (1.0 / ccoul) * (3.0 * erf / rf2))
            E[k] += np.sum(elj) + np.sum(np.where(in_c, ec, 0.0))
    return E


def test_single_atomistic_obmd_oracle():
    """mol_energy_force with mol_q matches a float64 transcription of the
    reference's charged trial energy."""
    from obmd_tpu.obmd.subset import mol_energy_force, region_subset
    from obmd_tpu.config import MolTemplate
    box = Box((0.0, 0.0, 0.0), (10.0, 6.0, 6.0), (False, True, True))
    pair = LJCutRFParams.create(cut_lj=2.0, cut_coul=2.5, epsilon=0.8,
                                sigma=1.0, eps_rf=62.0)
    r = np.random.default_rng(7)
    n = 120
    x = np.column_stack([r.uniform(0.3, 4.0, n), r.uniform(0, 6, n),
                         r.uniform(0, 6, n)])
    q = r.choice([0.42, -0.42], n)
    tpl = MolTemplate(dx=((0.0, 0.0, 0.0), (0.8, 0.3, 0.0)),
                      types=(0, 0), q=(0.42, -0.84), bonds=((0, 1),))
    reg = RegionBlock((0.0, 0.0, 0.0), (2.5, 6.0, 6.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    from obmd_tpu.config import UsherParams
    obmd = ObmdParams(ntype=0, nfreq=1, seed=3, pxx=1.0,
                      region1=reg, region2=reg, region3=deg, region4=deg,
                      region5=reg, region6=reg, buffer_size=2.5,
                      usher=UsherParams(etarget=2.0, ds0=0.2, dtheta0=0.05,
                                        uovlp=1e4, dsovlp=1.5, eps=1.0,
                                        nattempt=10),
                      mol=tpl, mol_len=2, charged=True)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.002,
                      capacity=Capacity(n_max=n + 16, cell_capacity=64),
                      obmd=obmd, force_path="sweep").finalize()
    state = init_state(cfg, x, q=q)
    sub = region_subset(cfg, state, reg, pair.cut_coul + cfg.skin, n + 16)
    K = 5
    centers = np.column_stack([r.uniform(0.6, 2.0, K), r.uniform(1, 5, K),
                               r.uniform(1, 5, K)])
    coords = jnp.asarray(centers[:, None, :]
                         + np.asarray(tpl.dx)[None, :, :])
    mol_types = jnp.zeros((tpl.natoms,), jnp.int32)
    mol_q = jnp.asarray(tpl.q, state.x.dtype)
    E, _ = mol_energy_force(cfg, sub, coords, mol_types, mol_q=mol_q)
    E_ref = _rf_oracle_energy(x.astype(np.float64), q.astype(np.float64),
                              np.asarray(coords, np.float64),
                              np.asarray(tpl.q, np.float64),
                              np.asarray(box.lengths), box.periodic, pair)
    np.testing.assert_allclose(np.asarray(E), E_ref, rtol=2e-4, atol=2e-4)
    # neutral trials differ (the charge actually reaches the energy)
    E0, _ = mol_energy_force(cfg, sub, coords, mol_types, mol_q=None)
    assert np.abs(np.asarray(E) - np.asarray(E0)).max() > 1e-3


def test_charged_flag_changes_usher_search():
    """Flipping ObmdParams.charged measurably changes the steered-search
    outcome (positions or acceptance) for a charged template."""
    from obmd_tpu.obmd.subset import region_subset, usher_search_subset_mol
    from obmd_tpu.config import MolTemplate, UsherParams
    box = Box((0.0, 0.0, 0.0), (10.0, 6.0, 6.0), (False, True, True))
    pair = LJCutRFParams.create(cut_lj=2.0, cut_coul=2.5, epsilon=0.8,
                                sigma=1.0, eps_rf=62.0, qqrd2e=8.0)
    r = np.random.default_rng(11)
    n = 150
    x = np.column_stack([r.uniform(0.3, 4.2, n), r.uniform(0, 6, n),
                         r.uniform(0, 6, n)])
    q = np.tile([0.6, -0.6], n // 2 + 1)[:n]
    tpl = MolTemplate(dx=((0.0, 0.0, 0.0), (0.9, 0.0, 0.0)),
                      types=(0, 0), q=(0.6, 0.6), bonds=((0, 1),))
    reg = RegionBlock((0.0, 0.0, 0.0), (3.0, 6.0, 6.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    u = UsherParams(etarget=0.5, ds0=0.25, dtheta0=0.05, uovlp=1e4,
                    dsovlp=1.5, eps=1.0, nattempt=25)
    obmd = ObmdParams(ntype=0, nfreq=1, seed=3, pxx=1.0,
                      region1=reg, region2=reg, region3=deg, region4=deg,
                      region5=reg, region6=reg, buffer_size=3.0,
                      usher=u, mol=tpl, mol_len=2, charged=True)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.002,
                      capacity=Capacity(n_max=n + 16, cell_capacity=64),
                      obmd=obmd, force_path="sweep").finalize()
    state = init_state(cfg, x, q=q)
    sub = region_subset(cfg, state, reg, pair.cut_coul + cfg.skin, n + 16)
    K = 12
    centers = np.column_stack([r.uniform(0.5, 2.6, K), r.uniform(0.5, 5.5, K),
                               r.uniform(0.5, 5.5, K)])
    coords = jnp.asarray(centers[:, None, :]
                         + np.asarray(tpl.dx)[None, :, :])
    mol_types = jnp.zeros((tpl.natoms,), jnp.int32)
    mol_q = jnp.asarray(tpl.q, state.x.dtype)
    pos_c, acc_c, _ = usher_search_subset_mol(cfg, sub, coords, mol_types,
                                              reg, mol_q=mol_q)
    pos_n, acc_n, _ = usher_search_subset_mol(cfg, sub, coords, mol_types,
                                              reg, mol_q=None)
    diff = (np.abs(np.asarray(pos_c) - np.asarray(pos_n)).max()
            + float(np.sum(np.asarray(acc_c) != np.asarray(acc_n))))
    assert diff > 1e-4
