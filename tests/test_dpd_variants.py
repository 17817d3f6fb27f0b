"""DPD variant pair styles: dpd/tstat (thermostat-only,
DPD-BASIC/pair_dpd_tstat.cpp) and dpd/ext[/tstat] (transverse friction,
DPD-BASIC/pair_dpd_ext.cpp) — deterministic parts vs a brute-force numpy
oracle, Newton's third law with the noise ON, and deck parsing."""
import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.cells import GridSpec, build_cells
from obmd_tpu.config import DPDExtParams, DPDTstatParams
from obmd_tpu.forces.pairs import pair_sweep
from obmd_tpu.geometry import Box


def _mk_system(n=70, seed=3):
    box = Box((0.0, 0.0, 0.0), (5.0, 4.0, 4.0), (False, True, True))
    r = np.random.default_rng(seed)
    x = r.uniform(np.asarray(box.lo), np.asarray(box.hi), (n, 3)).astype(np.float32)
    v = r.normal(0, 1, (n, 3)).astype(np.float32)
    types = r.integers(0, 2, n).astype(np.int32)
    tags = np.arange(1, n + 1, dtype=np.int32)
    return box, x, v, types, tags


def _min_image(d, box):
    L = np.asarray(box.lengths)
    per = np.asarray(box.periodic)
    return np.where(per, d - L * np.round(d / L), d)


def _sweep(params, box, x, v, types, tags, dt=0.01, salt=0):
    spec = GridSpec.create(box, params.max_cut, 24)
    q = jnp.zeros(len(x), jnp.float32)

    @jax.jit
    def go(x, v, types, tags, salt):
        tab = build_cells(spec, x, jnp.ones(len(x), bool))
        pf = pair_sweep(params, box, spec, tab, x, v, types, tags, q,
                        salt, dt=dt, compute_energy=True)
        return pf, tab.overflow

    pf, overflow = go(jnp.asarray(x), jnp.asarray(v), jnp.asarray(types),
                      jnp.asarray(tags), jnp.uint32(salt))
    assert int(overflow) == 0
    return pf


def _brute_tstat_drag(params, box, x, v, types):
    """Drag-only oracle (pair_dpd_tstat.cpp:116-119 minus noise)."""
    n = len(x)
    gam = np.asarray(params.gamma)
    cut = np.asarray(params.cut)
    f = np.zeros((n, 3))
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = _min_image(x[i].astype(np.float64) - x[j], box)
            rsq = d @ d
            ti, tj = types[i], types[j]
            if rsq >= cut[ti, tj] ** 2 or rsq < 1e-20:
                continue
            r = np.sqrt(rsq)
            wd = 1 - r / cut[ti, tj]
            dot = d @ (v[i] - v[j]).astype(np.float64)
            f[i] += (-gam[ti, tj] * wd * wd * dot / r) / r * d
    return f


def _brute_ext_det(params, box, x, v, types):
    """Conservative + parallel drag + transverse drag oracle
    (pair_dpd_ext.cpp:152-166 minus the random terms)."""
    n = len(x)
    a0 = np.asarray(params.a0)
    gam = np.asarray(params.gamma)
    gamT = np.asarray(params.gammaT)
    ws = np.asarray(params.ws)
    wsT = np.asarray(params.wsT)
    cut = np.asarray(params.cut)
    f = np.zeros((n, 3))
    e = np.zeros(n)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = _min_image(x[i].astype(np.float64) - x[j], box)
            rsq = d @ d
            ti, tj = types[i], types[j]
            if rsq >= cut[ti, tj] ** 2 or rsq < 1e-20:
                continue
            r = np.sqrt(rsq)
            rhat = d / r
            wd = 1 - r / cut[ti, tj]
            wd_par = wd ** ws[ti, tj]
            wd_perp = wd ** wsT[ti, tj]
            dv = (v[i] - v[j]).astype(np.float64)
            fpar = a0[ti, tj] * wd - gam[ti, tj] * wd_par ** 2 * (rhat @ dv)
            f[i] += fpar * rhat
            dv_perp = dv - rhat * (rhat @ dv)
            f[i] -= gamT[ti, tj] * wd_perp ** 2 * dv_perp
            e[i] += 0.25 * a0[ti, tj] * cut[ti, tj] * wd * wd
    return f, e


def test_tstat_drag_matches_brute():
    box, x, v, types, tags = _mk_system()
    # gamma only; zero noise by gamma trick: set temp=0 -> sigma=0
    params = DPDTstatParams.create(
        t_start=0.0, cutoff=1.0, seed=5,
        gamma=[[4.5, 3.0], [3.0, 5.5]], ntypes=2)
    pf = _sweep(params, box, x, v, types, tags)
    fb = _brute_tstat_drag(params, box, x, v, types)
    np.testing.assert_allclose(np.asarray(pf.f), fb, atol=2e-4)
    # thermostat-only style has zero pair energy
    assert float(jnp.sum(jnp.abs(pf.pe))) == 0.0


def test_tstat_ramp_validation():
    # ramps are supported now (see test_tstat_temperature_ramp); the one
    # invalid configuration is t_start <= 0 (the noise scale is relative)
    import pytest
    p = DPDTstatParams.create(t_start=1.0, t_stop=2.0, cutoff=1.0, seed=1,
                              gamma=4.5)
    assert p.is_ramp
    with pytest.raises(ValueError, match="t_start > 0"):
        DPDTstatParams.create(t_start=0.0, t_stop=2.0, cutoff=1.0, seed=1,
                              gamma=4.5)


def test_ext_deterministic_matches_brute():
    box, x, v, types, tags = _mk_system(seed=8)
    params = DPDExtParams.create(
        temp=0.0, cutoff=1.0, seed=5,
        a0=[[25.0, 30.0], [30.0, 20.0]],
        gamma=[[4.5, 3.0], [3.0, 5.5]],
        gammaT=[[1.5, 2.0], [2.0, 0.5]],
        ws=[[1.0, 0.5], [0.5, 2.0]],
        wsT=[[0.5, 1.0], [1.0, 1.5]], ntypes=2)
    pf = _sweep(params, box, x, v, types, tags)
    fb, eb = _brute_ext_det(params, box, x, v, types)
    np.testing.assert_allclose(np.asarray(pf.f), fb, atol=3e-4)
    np.testing.assert_allclose(np.asarray(pf.pe), eb, atol=1e-4)


def test_ext_newton_third_law_with_noise():
    """Momentum conservation with drag AND both random channels on —
    requires the pair-symmetric scalar noise plus the antisymmetrized
    transverse noise vector."""
    box, x, v, types, tags = _mk_system(seed=9)
    params = DPDExtParams.create(
        temp=1.0, cutoff=1.0, seed=5, a0=25.0, gamma=4.5, gammaT=2.0,
        ws=0.5, wsT=0.5, ntypes=2)
    pf = _sweep(params, box, x, v, types, tags, salt=1234)
    ftot = np.asarray(pf.f).sum(axis=0)
    assert np.abs(ftot).max() < 5e-3, ftot


def test_ext_tstat_drops_conservative():
    box, x, v, types, tags = _mk_system(seed=10)
    base = dict(temp=0.0, cutoff=1.0, seed=5, a0=25.0, gamma=4.5,
                gammaT=2.0, ws=1.0, wsT=1.0, ntypes=2)
    p_full = DPDExtParams.create(**base)
    p_tstat = DPDExtParams.create(**{**base, "a0": 0.0}, tstat_only=True)
    f_full = np.asarray(_sweep(p_full, box, x, v, types, tags).f)
    f_tstat = np.asarray(_sweep(p_tstat, box, x, v, types, tags).f)
    fb, _ = _brute_ext_det(p_full, box, x, v, types)
    fb0, _ = _brute_ext_det(
        DPDExtParams.create(**{**base, "a0": 0.0}), box, x, v, types)
    np.testing.assert_allclose(f_full, fb, atol=3e-4)
    np.testing.assert_allclose(f_tstat, fb0, atol=3e-4)


def test_deck_parses_variants(tmp_path):
    from obmd_tpu.io.script import Interpreter
    from obmd_tpu.io import lammps_data
    import os
    r = np.random.default_rng(0)
    n = 60
    df = lammps_data.DataFile(
        natoms=n, ntypes=1, box_lo=np.zeros(3),
        box_hi=np.asarray([4.0, 4.0, 4.0]), masses=np.asarray([1.0]),
        x=r.uniform(0, 4, (n, 3)), types=np.zeros(n, np.int32),
        tags=np.arange(1, n + 1, dtype=np.int32), v=r.normal(0, 1, (n, 3)))
    data = os.path.join(str(tmp_path), "d.data")
    lammps_data.write_data(data, df)
    deck = f"""
units lj
boundary p p p
atom_style atomic
pair_style dpd/ext 1.0 1.0 999
read_data {data}
pair_coeff * * 25.0 4.5 2.0 1.0 0.5
timestep 0.01
fix 1 all nve
run 2
"""
    it = Interpreter(log_fn=lambda *a: None)
    it.run_lines(deck.splitlines())
    assert isinstance(it.cfg.pair, DPDExtParams)
    assert it.cfg.pair.gammaT[0][0] == 2.0
    assert int(it.state.step) == 2

    deck2 = deck.replace("pair_style dpd/ext 1.0 1.0 999",
                         "pair_style dpd/tstat 1.0 1.0 1.0 999").replace(
        "pair_coeff * * 25.0 4.5 2.0 1.0 0.5", "pair_coeff * * 4.5")
    it2 = Interpreter(log_fn=lambda *a: None)
    it2.run_lines(deck2.splitlines())
    assert isinstance(it2.cfg.pair, DPDTstatParams)
    assert int(it2.state.step) == 2


def test_tstat_temperature_ramp():
    """pair_dpd_tstat.cpp:52-60 T ramp: noise amplitude follows
    T(step) = t_start + elapsed/total * (t_stop - t_start) over the ramp
    window.  An ideal DPD-tstat gas starting cold must thermalize toward
    t_stop by the end of the ramp (fluctuation-dissipation at T(t))."""
    import dataclasses
    import jax
    import numpy as np
    from obmd_tpu.config import Capacity, DPDTstatParams, SceneConfig
    from obmd_tpu.geometry import Box
    from obmd_tpu.integrate import make_run, setup
    from obmd_tpu.state import init_state, temperature

    n, L = 1200, 8.0
    t0, t1, nsteps = 0.4, 2.0, 3000
    cfg = SceneConfig(
        box=Box((0, 0, 0), (L, L, L), (True, True, True)),
        masses=(1.0,), dt=0.02,
        pair=DPDTstatParams.create(t_start=t0, t_stop=t1, cutoff=1.0,
                                   seed=5, gamma=4.5,
                                   ramp=(0, nsteps)),
        capacity=Capacity(n_max=n, cell_capacity=40),
        skin=0.3, force_path="nlist").finalize()
    assert cfg.pair.is_ramp
    r = np.random.default_rng(1)
    x = r.uniform(0, L, (n, 3))
    v = r.normal(0, np.sqrt(t0), (n, 3))
    v -= v.mean(axis=0)
    st = setup(cfg, init_state(cfg, x, v=v))
    run = jax.jit(make_run(cfg, 500))
    temps = []
    for _ in range(nsteps // 500):
        st = run(st)
        temps.append(float(temperature(cfg, st)))
    # monotone heating toward t_stop; final T within 15% of t_stop
    assert temps[0] < temps[-1]
    assert abs(temps[-1] - t1) < 0.15 * t1, temps
    # and the constant-T config still refuses nothing / stays at t_start
    cfg0 = dataclasses.replace(
        cfg, pair=DPDTstatParams.create(t_start=t0, t_stop=t0, cutoff=1.0,
                                        seed=5, gamma=4.5)).finalize()
    assert not cfg0.pair.is_ramp
