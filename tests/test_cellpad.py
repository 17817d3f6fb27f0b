"""Cellpad engine tests (Pallas kernel runs in interpreter mode on CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obmd_tpu.config import Capacity, DPDParams, SceneConfig
from obmd_tpu.geometry import Box
from obmd_tpu.state import init_state, temperature


def _small_cfg(n=500, force_path="cellpad", obmd=False, seed_box=0):
    box = Box((0.0, 0.0, 0.0), (10.0, 4.0, 4.0), (False, True, True))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=5, a0=25.0, gamma=4.5)
    ob = None
    if obmd:
        from obmd_tpu.config import ObmdParams, UsherParams
        from obmd_tpu.geometry import RegionBlock
        b = 2.0
        r1 = RegionBlock((0.0, 0.0, 0.0), (b, 4.0, 4.0))
        r2 = RegionBlock((8.0, 0.0, 0.0), (10.0, 4.0, 4.0))
        deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
        ob = ObmdParams(ntype=0, nfreq=1, seed=11, pxx=5.0, alpha=0.5,
                        tau=0.01, nbuf=50.0, region1=r1, region2=r2,
                        region3=deg, region4=deg, region5=r1, region6=r2,
                        buffer_size=b, usher=UsherParams(etarget=10.0,
                                                         nattempt=10),
                        insert_kmax=4)
    return SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                       capacity=Capacity(n_max=n, cell_capacity=22),
                       obmd=ob, skin=0.3, force_path=force_path)


def _state(cfg, n=500, seed=0):
    r = np.random.default_rng(seed)
    lo, hi = np.asarray(cfg.box.lo), np.asarray(cfg.box.hi)
    x = r.uniform(lo + 0.05, hi - 0.05, (n, 3))
    v = r.normal(0, 1, (n, 3))
    return init_state(cfg, x, v=v)


def test_layout_build_preserves_atoms():
    from obmd_tpu.cellpad import layout_build
    from obmd_tpu.engine_cellpad import make_geometry
    cfg = _small_cfg()
    st = _state(cfg)
    geom = make_geometry(cfg)
    st2 = layout_build(geom, cfg.box, st)
    assert int(st2.natoms) == 500
    assert int(st2.nbrs.overflow) == 0
    # tags and per-tag positions preserved
    a1 = np.asarray(st.alive)
    a2 = np.asarray(st2.alive)
    m1 = {int(t): np.asarray(st.x)[i] for i, t in enumerate(np.asarray(st.tag)) if a1[i]}
    m2 = {int(t): np.asarray(st2.x)[i] for i, t in enumerate(np.asarray(st2.tag)) if a2[i]}
    assert set(m1) == set(m2)
    for t in m1:
        np.testing.assert_allclose(m1[t], m2[t], rtol=1e-6)
    # every alive atom filed in its own cell's lane column
    cell = np.asarray(geom.cell_of(st2.x))
    lanes, cap = geom.lanes, geom.cap
    for i in np.nonzero(a2)[0][:50]:
        b = i // (cap * lanes)
        lane = i % lanes
        bb, ll = geom.slot_of_cell(int(cell[i]))
        assert (b, lane) == (int(bb), int(ll))


def test_pallas_kernel_matches_sweep():
    from obmd_tpu.engine_cellpad import setup_cellpad
    from obmd_tpu.integrate import compute_forces, make_grid_spec
    cfg = _small_cfg(n=400)
    st = _state(cfg, n=400, seed=3)
    st2 = setup_cellpad(cfg, st)
    cfg_sweep = dataclasses.replace(cfg, force_path="sweep")
    spec = make_grid_spec(cfg_sweep)
    pf, _ = jax.jit(lambda s: compute_forces(cfg_sweep, spec, s))(st2)
    f_ref = np.asarray(jnp.where(st2.alive[:, None], pf.f, 0.0))
    d = np.abs(f_ref - np.asarray(st2.f))
    assert d.max() < 1e-3


def test_place_insertions_conflicts():
    from obmd_tpu.cellpad import place_insertions
    from obmd_tpu.engine_cellpad import make_geometry
    cfg = _small_cfg(n=64)
    geom = make_geometry(cfg)
    st = _state(cfg, n=64, seed=4)
    from obmd_tpu.cellpad import layout_build
    st2 = layout_build(geom, cfg.box, st)
    # 4 candidates in the same cell -> all get distinct slots (cap allows)
    pos = jnp.asarray(np.tile(np.asarray([[1.1, 1.1, 1.1]]), (4, 1)),
                      st2.x.dtype)
    acc = jnp.ones((4,), bool)
    slot, landed = place_insertions(geom, st2, pos, acc)
    s = np.asarray(slot)
    assert np.asarray(landed).all()
    assert len(set(s.tolist())) == 4
    # all in the same lane column
    lanes, cap = geom.lanes, geom.cap
    assert len(set((si // (cap * lanes), si % lanes) for si in s)) == 1


def test_cellpad_obmd_step_runs():
    from obmd_tpu.integrate import make_step, setup
    cfg = _small_cfg(n=520, obmd=True)
    st = _state(cfg, n=480, seed=5)
    st = setup(cfg, st)
    step = jax.jit(make_step(cfg))
    for _ in range(5):
        st = step(st)
    assert int(st.step) == 5
    n = int(st.natoms)
    assert 300 < n
    # counters move sensibly
    assert int(st.obmd.ndeleted) >= 0
    t = float(temperature(cfg, st))
    assert 0.0 < t < 50.0


def test_cellpad_vs_nlist_consistency():
    """Same scene, both engines: same insertion/deletion counts and close
    trajectories over a few steps."""
    from obmd_tpu.integrate import make_step, setup
    cfg_c = _small_cfg(n=540, obmd=True)
    cfg_n = dataclasses.replace(cfg_c, force_path="nlist")
    st0 = _state(cfg_c, n=500, seed=6)
    sc = setup(cfg_c, st0)
    sn = setup(cfg_n, st0)
    step_c = jax.jit(make_step(cfg_c))
    step_n = jax.jit(make_step(cfg_n))
    for _ in range(4):
        sc = step_c(sc)
        sn = step_n(sn)
    assert int(sc.natoms) == int(sn.natoms)
    assert int(sc.obmd.ninserted) == int(sn.obmd.ninserted)
    assert int(sc.obmd.ndeleted) == int(sn.obmd.ndeleted)
    # per-tag positions close (fp ordering differences only)
    ac, an = np.asarray(sc.alive), np.asarray(sn.alive)
    mc = {int(t): np.asarray(sc.x)[i] for i, t in enumerate(np.asarray(sc.tag)) if ac[i]}
    mn = {int(t): np.asarray(sn.x)[i] for i, t in enumerate(np.asarray(sn.tag)) if an[i]}
    assert set(mc) == set(mn)
    diffs = [np.abs(mc[t] - mn[t]).max() for t in mc]
    assert max(diffs) < 5e-3


def test_lj_melt_kernel_matches_sweep():
    """The reference's headline workload (LJ melt, bench/in.lj) on the
    Pallas periodic-x path vs the sweep reference."""
    from obmd_tpu import scenes
    from obmd_tpu.integrate import compute_forces, make_grid_spec, setup
    sc = scenes.lj_melt_scene(nx=6)
    state = setup(sc.cfg, sc.state)
    cfg_sweep = dataclasses.replace(sc.cfg, force_path="sweep")
    spec = make_grid_spec(cfg_sweep)
    pf, _ = jax.jit(lambda s: compute_forces(cfg_sweep, spec, s))(state)
    f_ref = np.asarray(jnp.where(state.alive[:, None], pf.f, 0.0))
    d = np.abs(f_ref - np.asarray(state.f))
    assert d.max() < 1e-3
