"""Cross-validation of the Newton half-stencil Pallas kernel against the
full-stencil reference kernel (both in interpreter mode on CPU).

The full-stencil kernel (make_dpd_kernel) computes every pair twice from
both sides — an independent implementation of the same pair laws — so
agreement here checks the directed-stencil bookkeeping: stitched x views,
deferred j-reaction rolls, cross-block carry, and the rank-ordered
self-cell half (reference semantics: newton-on half list,
npair_half_bin_newton.cpp + reverse_comm, comm_brick.cpp:598)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obmd_tpu import scenes
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cells import BIG
from obmd_tpu.forces.pallas_dpd import make_dpd_kernel, make_pair_kernel
from obmd_tpu.integrate import setup


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


def _compare(cfg, state, kw):
    geom = ec.make_geometry(cfg)
    old = make_dpd_kernel(geom, **kw)
    new = make_pair_kernel(geom, **kw)
    fld, tag, occ = _pack(geom, state)
    salt = jnp.uint32(77)
    f_old = np.asarray(old(fld, tag, salt, occ, None))
    f_new = np.asarray(new(fld, tag, salt, occ, None))
    aliveb = np.asarray(state.alive).reshape(
        geom.n_blocks, geom.cap, geom.lanes)
    sel = np.broadcast_to(aliveb[:, None], f_old.shape)
    scale = np.abs(f_old[sel]).max()
    err = np.abs(f_old - f_new)[sel].max()
    assert err <= 2e-4 * scale, (err, scale)
    # Newton's third law: pure pair forces sum to zero
    flin = f_new.transpose(0, 2, 3, 1).reshape(-1, 3)
    fsum = np.abs(flin[np.asarray(state.alive)].sum(axis=0)).max()
    assert fsum <= 1e-3 * scale


def test_newton_matches_full_dpd_open_x():
    sc = scenes.obmd_dpd_scene(scale=0.5, seed=11, n_max=8192)
    state = setup(sc.cfg, sc.state)
    p = sc.cfg.pair
    _compare(sc.cfg, state, dict(a0=p.a0[0][0], gamma=p.gamma[0][0],
                                 sigma=p.sigma[0][0], cut=p.cut[0][0],
                                 dt=sc.cfg.dt, law="dpd"))


def test_newton_matches_full_lj_periodic_x():
    sc = scenes.lj_melt_scene(nx=6)
    st = sc.state
    st = st.replace(x=sc.cfg.box.wrap(
        st.x + 0.3 * jax.random.normal(jax.random.PRNGKey(1), st.x.shape)))
    state = setup(sc.cfg, st)
    p = sc.cfg.pair
    _compare(sc.cfg, state, dict(cut=p.cut[0][0], dt=sc.cfg.dt, law="lj",
                                 lj_eps=p.epsilon[0][0],
                                 lj_sig=p.sigma[0][0]))


def test_forces_exact_after_periodic_crossing_mid_epoch():
    """Regression for the ~7% hot thermostat: an atom that drifts across a
    periodic face between relayouts keeps its (stale) lane-cell, and the
    epoch-static roll-wrap deltas alone lose all its pairs — the kernel
    must apply true per-pair min-image on periodic axes."""
    import dataclasses
    from obmd_tpu.config import Capacity, DPDParams, SceneConfig
    from obmd_tpu.geometry import Box
    from obmd_tpu.state import init_state
    from obmd_tpu.integrate import setup, make_grid_spec, _salt
    from obmd_tpu import engine_cellpad as ec
    from obmd_tpu.cells import build_cells
    from obmd_tpu.forces.pairs import pair_sweep

    box = Box((0.0, 0.0, 0.0), (8.0, 5.2, 5.2), (False, True, True))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=3, a0=80.0,
                            gamma=4.5)
    n = 260
    r = np.random.default_rng(8)
    x = r.uniform(0, [8.0, 5.2, 5.2], (n, 3))
    # a handful of atoms hugging the y=0 face: after layout they drift
    # BELOW 0 and wrap to y ~ 5.2 while their lane-cell stays y-cell 0
    x[:8, 1] = 0.02
    v = r.normal(0, 1, (n, 3))
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                      capacity=Capacity(n_max=n, cell_capacity=24),
                      skin=0.4, force_path="cellpad").finalize()
    st = setup(cfg, init_state(cfg, x, v=v))
    # mid-epoch drift: push the face-huggers across the boundary (within
    # the half-skin budget) WITHOUT relayout
    xs = jnp.asarray(st.x)
    face = st.alive & (jnp.abs(xs[:, 1] - 0.02) < 1e-6)
    xs = jnp.where(face[:, None],
                   xs.at[:, 1].add(-0.1)[:, :], xs)
    xs = cfg.box.wrap(xs)
    st = st.replace(x=xs)

    geom = ec.make_geometry(cfg)
    kern = ec._make_kernel(cfg, geom)
    f_cell = np.asarray(jax.jit(
        lambda s: ec._forces(cfg, geom, kern, s))(st))

    spec = make_grid_spec(cfg)

    @jax.jit
    def sweep_f(s):
        tab = build_cells(spec, s.x, s.alive)
        pf = pair_sweep(cfg.pair, cfg.box, spec, tab, s.x, s.v, s.type,
                        s.tag, s.q, _salt(cfg, s.step), dt=cfg.dt)
        return jnp.where(s.alive[:, None], pf.f, 0.0)

    f_ref = np.asarray(sweep_f(st))
    assert int(jnp.sum(face)) >= 6          # the scenario actually happened
    np.testing.assert_allclose(f_cell, f_ref, atol=5e-3)


def test_gaussian_noise_thermostat_cellpad():
    """gaussian_noise=True on the cellpad kernel (Box-Muller from two hash
    draws): the DPD thermostat must hold T = 1 exactly like the uniform
    default (variance-matched), and the flag must actually change draws."""
    import dataclasses

    import jax
    import numpy as np

    from obmd_tpu.config import Capacity, DPDParams, SceneConfig
    from obmd_tpu.geometry import Box
    from obmd_tpu.integrate import make_run, setup
    from obmd_tpu.state import init_state

    box = Box((0.0, 0.0, 0.0), (8.0, 8.0, 8.0), (True, True, True))
    r = np.random.default_rng(4)
    n = 1500
    x = r.uniform(0, 8, (n, 3))
    v = r.normal(0, 1, (n, 3))
    outs = {}
    for g in (False, True):
        pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=9, a0=25.0,
                                gamma=4.5, gaussian_noise=g)
        cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.02,
                          capacity=Capacity(n_max=n, cell_capacity=24),
                          skin=0.3, force_path="cellpad")
        st = setup(cfg, init_state(cfg, x, v=v))
        st = make_run(cfg, 300)(st)
        vv = np.asarray(st.v)[np.asarray(st.alive)]
        T = (vv ** 2).sum() / (3 * len(vv))
        outs[g] = (T, np.asarray(st.x).copy())
        assert 0.9 < T < 1.1, (g, T)
    # different noise draws -> different trajectories
    assert np.abs(outs[False][1] - outs[True][1]).max() > 1e-3
