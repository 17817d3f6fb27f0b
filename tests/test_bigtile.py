"""Production-kernel-variant coverage: the cap<=20 BIG-TILE pair kernel
(the one the 94k-atom bench actually runs, auto-selected at cap 16) vs the
loop kernel, plus the PadAux kernel-layout caches it consumes.

Round 4 shipped the big-tile kernel + insertion-patched tag3d/occ caches
with no committed test (every kernel cross-check used cap 22/24, which
select the LOOP kernel).  These tests pin the shipping configuration:

  * bigtile vs loop force agreement at cap 16 and cap 20 (interpret mode),
  * the auto-select dispatch (cap<=20 -> bigtile, else loop),
  * cache consistency through insert/delete/relayout traffic (tags ARE the
    pair-noise RNG keys — a silent cache/state divergence would corrupt
    noise without tripping any invariant),
  * an OBMD-stage integration run at cap 16 so the bigtile path sees real
    insertion/deletion traffic.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obmd_tpu import scenes
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cells import BIG
from obmd_tpu.cellpad import PadAux, kernel_caches
from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig, UsherParams
from obmd_tpu.forces.pallas_dpd import make_pair_kernel
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.state import init_state


def _pack(geom, state):
    nb, cap, lanes = geom.n_blocks, geom.cap, geom.lanes
    a3 = state.alive[:, None]
    xm = jnp.where(a3, state.x, BIG).astype(jnp.float32)
    fld = jnp.concatenate([xm, state.v.astype(jnp.float32)], axis=1)
    fld = fld.reshape(nb, cap, lanes, 6).transpose(0, 3, 1, 2)
    tag = state.tag.reshape(nb, cap, lanes)
    rank = jnp.arange(cap, dtype=jnp.int32)[None, :, None]
    occ = jnp.max(jnp.where(state.alive.reshape(nb, cap, lanes), rank, -1),
                  axis=(1, 2)) + 1
    return fld, tag, occ


def _lattice_scene(cap, scale=0.5, seed=13):
    """OBMD_DPD box at a tight cell capacity: a jittered lattice at rho=3
    (the t=0 Poisson gas overflows cap 16; the equilibrated DPD liquid the
    bench repacks is lattice-like in occupancy — max cell occupancy 13)."""
    cfg = scenes.obmd_dpd_config(scale=scale, cell_capacity=cap)
    lo = np.asarray(cfg.box.lo)
    hi = np.asarray(cfg.box.hi)
    a = (1.0 / 3.0) ** (1.0 / 3.0)          # rho = 3 simple cubic
    axes = [np.arange(l + a / 2, h - 1e-9, a) for l, h in zip(lo, hi)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    r = np.random.default_rng(seed)
    x = g + r.uniform(-0.18, 0.18, g.shape) * a
    v = r.normal(0, 1, g.shape)
    import dataclasses as _dc
    cfg = _dc.replace(cfg, capacity=_dc.replace(
        cfg.capacity, n_max=len(g) + 512)).finalize()
    return cfg, init_state(cfg, x, v=v)


def _bigtile_vs_loop(cap):
    cfg, st0 = _lattice_scene(cap)
    state = setup(cfg, st0)
    sc = scenes.Scene(cfg=cfg, state=state)
    geom = ec.make_geometry(sc.cfg)
    assert geom.cap == cap
    assert int(state.cell_overflow) == 0
    fld, tag, occ = _pack(geom, state)
    salt = jnp.uint32(901)
    kw = dict(params=sc.cfg.pair, dt=sc.cfg.dt)
    f_loop = np.asarray(make_pair_kernel(geom, bigtile=False, **kw)(
        fld, tag, salt, occ, None))
    f_big = np.asarray(make_pair_kernel(geom, bigtile=True, **kw)(
        fld, tag, salt, occ, None))
    aliveb = np.asarray(state.alive).reshape(geom.n_blocks, geom.cap,
                                             geom.lanes)
    sel = np.broadcast_to(aliveb[:, None], f_loop.shape)
    scale = np.abs(f_loop[sel]).max()
    err = np.abs(f_loop - f_big)[sel].max()
    assert err <= 2e-4 * scale, (err, scale)
    # Newton: pure pair forces sum to ~0
    flin = f_big.transpose(0, 2, 3, 1).reshape(-1, 3)
    fsum = np.abs(flin[np.asarray(state.alive)].sum(axis=0)).max()
    assert fsum <= 1e-3 * scale
    return f_loop, f_big, sel


def test_bigtile_matches_loop_cap16():
    """The EXACT shipping configuration: cap 16 (bench.py's repack cap)."""
    _bigtile_vs_loop(16)


def test_bigtile_matches_loop_cap20():
    """The auto-select boundary: cap 20 is the last bigtile cap."""
    _bigtile_vs_loop(20)


def test_autoselect_dispatch():
    """make_pair_kernel default: bigtile at cap<=20, loop above — the
    default build must be BITWISE the explicitly selected variant."""
    for cap, want_big in ((16, True), (24, False)):
        cfg, st0 = _lattice_scene(cap, scale=0.25, seed=5)
        state = setup(cfg, st0)
        sc = scenes.Scene(cfg=cfg, state=state)
        geom = ec.make_geometry(sc.cfg)
        fld, tag, occ = _pack(geom, state)
        salt = jnp.uint32(7)
        kw = dict(params=sc.cfg.pair, dt=sc.cfg.dt)
        f_def = np.asarray(make_pair_kernel(geom, **kw)(
            fld, tag, salt, occ, None))
        f_sel = np.asarray(make_pair_kernel(geom, bigtile=want_big, **kw)(
            fld, tag, salt, occ, None))
        f_oth = np.asarray(make_pair_kernel(geom, bigtile=not want_big,
                                            **kw)(fld, tag, salt, occ, None))
        assert np.array_equal(f_def, f_sel), cap
        # sanity: the two variants are genuinely different codepaths
        assert not np.array_equal(f_sel, f_oth) or np.abs(f_sel).max() == 0


def _cap16_obmd_cfg(n_max=700, nbuf=30.0):
    """Small open-boundary DPD scene at the production cell capacity."""
    box = Box((0.0, 0.0, 0.0), (10.0, 4.0, 4.0), (False, True, True))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=5, a0=25.0,
                            gamma=4.5)
    b = 2.0
    r1 = RegionBlock((0.0, 0.0, 0.0), (b, 4.0, 4.0))
    r2 = RegionBlock((8.0, 0.0, 0.0), (10.0, 4.0, 4.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    ob = ObmdParams(ntype=0, nfreq=1, seed=11, pxx=5.0, alpha=0.5,
                    tau=0.01, nbuf=nbuf, region1=r1, region2=r2,
                    region3=deg, region4=deg, region5=r1, region6=r2,
                    buffer_size=b,
                    usher=UsherParams(etarget=10.0, nattempt=10),
                    insert_kmax=4)
    return SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                       capacity=Capacity(n_max=n_max, cell_capacity=16),
                       obmd=ob, skin=0.3, force_path="cellpad").finalize()


def _uniform_state(cfg, n, seed=0):
    r = np.random.default_rng(seed)
    lo, hi = np.asarray(cfg.box.lo), np.asarray(cfg.box.hi)
    x = r.uniform(lo + 0.05, hi - 0.05, (n, 3))
    v = r.normal(0, 1, (n, 3))
    return init_state(cfg, x, v=v)


def _assert_caches_consistent(geom, st):
    """The cache/state invariants the pair kernel relies on:
      * tag3d == state.tag at every ALIVE slot (tags are the noise keys);
      * occ covers every alive rank (stale-HIGH after deletion is safe,
        stale-LOW would silently drop forces);
      * occ never exceeds cap."""
    aux: PadAux = st.nbrs
    assert isinstance(aux, PadAux) and aux.tag3d is not None
    nb, cap, lanes = geom.n_blocks, geom.cap, geom.lanes
    alive3 = np.asarray(st.alive).reshape(nb, cap, lanes)
    tag3 = np.asarray(st.tag).reshape(nb, cap, lanes)
    ctag = np.asarray(aux.tag3d)
    assert np.array_equal(ctag[alive3], tag3[alive3])
    fresh = kernel_caches(geom, st.tag, st.alive)
    occ = np.asarray(aux.occ)
    assert (occ >= np.asarray(fresh["occ"])).all()
    assert (occ <= cap).all()


def test_padaux_cache_consistency_under_traffic():
    """30 OBMD steps at cap 16 (insertions patch the caches in place,
    deletions leave stale-but-masked values, periodic relayouts rebuild):
    the kernel-facing invariants must hold at every step.

    nbuf sets the census target at alpha*nbuf = 90 > the ~70 the uniform
    start carries, so the feedback law actually requests insertions
    within the 30-step window on EVERY backend (at the default 30 the
    buffers start over-full and CPU trajectories never insert — the
    round-4 version only saw insertion traffic on TPU fp paths)."""
    cfg = _cap16_obmd_cfg(nbuf=180.0)
    st = setup(cfg, _uniform_state(cfg, 420, seed=7))
    geom = ec.make_geometry(cfg)
    step = jax.jit(make_step(cfg))
    _assert_caches_consistent(geom, st)
    for i in range(30):
        st = step(st)
        _assert_caches_consistent(geom, st)
    assert int(st.obmd.ninserted) > 0, "no insertion traffic exercised"
    assert int(st.obmd.ndeleted) > 0, "no deletion traffic exercised"
    assert int(st.nbrs.rebuilds) > 1, "no relayout exercised"
    assert int(st.cell_overflow) == 0


def test_cap16_obmd_matches_nlist_engine():
    """Integration: the bigtile path under real insertion/deletion traffic
    agrees with the independent nlist engine (counts + trajectories)."""
    cfg_c = _cap16_obmd_cfg()
    cfg_n = dataclasses.replace(cfg_c, force_path="nlist").finalize()
    st0 = _uniform_state(cfg_c, 420, seed=9)
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
    ac, an = np.asarray(sc.alive), np.asarray(sn.alive)
    mc = {int(t): np.asarray(sc.x)[i]
          for i, t in enumerate(np.asarray(sc.tag)) if ac[i]}
    mn = {int(t): np.asarray(sn.x)[i]
          for i, t in enumerate(np.asarray(sn.tag)) if an[i]}
    assert set(mc) == set(mn)
    diffs = [np.abs(mc[t] - mn[t]).max() for t in mc]
    assert max(diffs) < 5e-3
