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
