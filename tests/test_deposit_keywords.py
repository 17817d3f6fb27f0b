"""fix-deposit inherited z-offset keywords `global lo hi`, `local lo hi
delta`, `rate r` (fix_obmd_merged.cpp :880, :947-985, :2088-2114)."""
import dataclasses

import jax
import numpy as np
import pytest

from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.state import init_state


def _cfg(**dep):
    box = Box((0.0, 0.0, 0.0), (10.0, 4.0, 8.0), (False, True, True))
    b = 2.0
    r1 = RegionBlock((0.0, 0.0, 0.0), (b, 4.0, 8.0))
    r2 = RegionBlock((8.0, 0.0, 0.0), (10.0, 4.0, 8.0))
    pair = DPDParams.create(temp=0.5, cutoff=1.0, seed=3, a0=10.0, gamma=2.0)
    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=11, pxx=2.0, alpha=0.5, tau=0.01, nbuf=200.0,
        region1=r1, region2=r2, region5=r1, region6=r2, buffer_size=b,
        usher=None, near=0.4, insert_kmax=6, **dep)
    return SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                       capacity=Capacity(n_max=900, cell_capacity=24),
                       obmd=obmd, skin=0.3, force_path="nlist")


def _run(cfg, nsteps=8, seed=2):
    r = np.random.default_rng(seed)
    n0 = 300
    # atoms fill only the LOWER half in z: the global keyword must place
    # insertions just above the max-z surface
    x = r.uniform([0.05, 0.05, 0.05], [9.95, 3.95, 3.6], (n0, 3))
    v = r.normal(0, 0.5, (n0, 3))
    st = setup(cfg, init_state(cfg, x, v=v))
    step = jax.jit(make_step(cfg))
    for _ in range(nsteps):
        st = step(st)
    return st


def test_global_inserts_above_surface():
    cfg = _cfg(deposit_global=(0.3, 0.8))
    # few steps: with aggressive feedback the deposited stack reaches the
    # periodic z-face and wraps (the reference applies PBC the same way)
    st = _run(cfg, nsteps=2)
    n_ins = int(st.obmd.ninserted)
    assert n_ins > 0
    alive = np.asarray(st.alive)
    tags = np.asarray(st.tag)
    z = np.asarray(st.x)[:, 2]
    new = alive & (tags > 300)
    # every inserted atom landed above the initial surface (z <= 3.6);
    # the reference's reset is z_max + lo..hi
    assert new.any()
    assert z[new].min() > 3.6, z[new].min()


def test_mutually_exclusive_and_slab_guard():
    with pytest.raises(ValueError, match="mutually exclusive"):
        _cfg(deposit_global=(0.1, 0.2), deposit_local=(0.1, 0.2, 1.0))
    from obmd_tpu.parallel.slab_decomp import make_slab_geom
    cfg = _cfg(rate=0.5)
    with pytest.raises(NotImplementedError, match="deposit"):
        make_slab_geom(cfg, 4)


def test_local_runs_and_inserts():
    cfg = _cfg(deposit_local=(0.3, 0.8, 1.5))
    st = _run(cfg, seed=5)
    assert int(st.obmd.ninserted) > 0
