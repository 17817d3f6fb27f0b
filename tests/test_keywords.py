"""Deposit-inherited fix obmd keywords (parsing at
fix_obmd_merged.cpp:2055-2159): gaussian draws, fixed orient axis, and the
id max|next tag policy."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig
from obmd_tpu.geometry import Box, RegionBlock
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.obmd.stage import draw_candidates, insertion_tag_base
from obmd_tpu.state import init_state


def _cfg(**obmd_kw):
    box = Box((0.0, 0.0, 0.0), (8.0, 4.0, 4.0), (False, True, True))
    r1 = RegionBlock((0.0, 0.0, 0.0), (1.6, 4.0, 4.0))
    r2 = RegionBlock((6.4, 0.0, 0.0), (8.0, 4.0, 4.0))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=7, a0=25.0, gamma=4.5)
    kw = dict(ntype=0, nfreq=1, seed=3, pxx=10.0, alpha=0.7,
              tau=0.01, nbuf=130.0, region1=r1, region2=r2,
              region3=deg, region4=deg, region5=r1, region6=r2,
              buffer_size=1.6, near=0.4, insert_kmax=8)
    kw.update(obmd_kw)
    obmd = ObmdParams(**kw)
    return SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                       capacity=Capacity(n_max=900, cell_capacity=24),
                       obmd=obmd, skin=0.3, force_path="nlist")


def test_gaussian_draws_cluster_and_reject_outside():
    """`gaussian xmid ymid zmid sigma` (ref :930-932): draws are normal
    around the midpoint; draws outside the insertion region are invalid."""
    cfg = _cfg(gaussian=(0.8, 2.0, 2.0, 0.5))
    key = jax.random.PRNGKey(0)
    cand, ok0 = draw_candidates(cfg, key, cfg.obmd.region5, 4096,
                                np.float32)
    c = np.asarray(cand)
    np.testing.assert_allclose(c.mean(axis=0), [0.8, 2.0, 2.0], atol=0.05)
    np.testing.assert_allclose(c.std(axis=0), 0.5, atol=0.05)
    inside = np.asarray(cfg.obmd.region5.match(cand))
    np.testing.assert_array_equal(np.asarray(ok0), inside)
    assert 0 < inside.sum() < len(c)          # some draws do fall outside

    # uniform mode: everything valid, inside the region
    cfg_u = _cfg()
    cand_u, ok_u = draw_candidates(cfg_u, key, cfg_u.obmd.region5, 512,
                                   np.float32)
    assert bool(jnp.all(ok_u))
    assert bool(jnp.all(cfg_u.obmd.region5.match(cand_u)))


def test_gaussian_insertions_land_near_midpoint():
    cfg = _cfg(gaussian=(0.8, 2.0, 2.0, 0.35), tau=0.005, nbuf=200.0)
    r = np.random.default_rng(1)
    st = init_state(cfg, r.uniform([0, 0, 0], [8, 4, 4], (500, 3)),
                    v=r.normal(0, 1, (500, 3)))
    st = setup(cfg, st)
    step = jax.jit(make_step(cfg))
    for _ in range(10):
        st = step(st)
    alive = np.asarray(st.alive)
    tags = np.asarray(st.tag)
    new = alive & (tags > 500)
    x = np.asarray(st.x)[new]
    # left-buffer insertions cluster near the gaussian midpoint (they have
    # drifted a little over the steps since insertion)
    left = x[x[:, 0] < 4.0]
    assert len(left) > 5
    assert np.abs(left.mean(axis=0) - [0.8, 2.0, 2.0]).max() < 0.6


def test_id_max_reuses_freed_tags():
    """`id max` recomputes the tag base from alive atoms each stage call
    (find_maxid, ref :1860-1868) — deleted ids become reusable; `id next`
    never reuses."""
    cfg_next = _cfg()
    cfg_max = _cfg(id_policy="max")
    r = np.random.default_rng(2)
    x = r.uniform([0, 0, 0], [8, 4, 4], (400, 3))
    st = init_state(cfg_next, x, v=r.normal(0, 1, (400, 3)))
    # pretend a long history: maxtag far beyond any alive tag
    st = st.replace(maxtag=jnp.asarray(50_000, jnp.int32))
    base_next = int(insertion_tag_base(cfg_next, st))
    base_max = int(insertion_tag_base(cfg_max, st))
    assert base_next == 50_000
    assert base_max == 400

    st_n = setup(cfg_next, st)
    step_n = jax.jit(make_step(cfg_next))
    st_m = setup(cfg_max, st)
    step_m = jax.jit(make_step(cfg_max))
    for _ in range(5):
        st_n = step_n(st_n)
        st_m = step_m(st_m)
    tags_n = np.asarray(st_n.tag)[np.asarray(st_n.alive)]
    tags_m = np.asarray(st_m.tag)[np.asarray(st_m.alive)]
    assert int(st_n.obmd.ninserted) > 0 and int(st_m.obmd.ninserted) > 0
    assert tags_n.max() > 50_000          # next: counts past the history
    assert tags_m.max() < 1000            # max: reuses the low range
    assert len(np.unique(tags_m)) == len(tags_m)   # still unique


def test_orient_fixed_axis_rotations():
    from obmd_tpu.obmd.subset import random_rotations
    key = jax.random.PRNGKey(4)
    axis = np.asarray([1.0, 2.0, -0.5])
    axis = axis / np.linalg.norm(axis)
    R = np.asarray(random_rotations(key, 16, jnp.float32, axis=axis))
    # every rotation keeps the orient axis fixed (it is the rotation axis)
    got = np.einsum("kab,b->ka", R, axis)
    np.testing.assert_allclose(got, np.tile(axis, (16, 1)), atol=1e-5)
    # and they are proper rotations
    eye = np.einsum("kab,kcb->kac", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)),
                               atol=1e-5)


def test_fix_obmd_group_census():
    """`fix ID group obmd`: the census counts only group members
    (group.cpp:793), so restricting the group halves the count and raises
    the feedback insertion rate."""
    import jax
    import numpy as np
    from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig
    from obmd_tpu.geometry import Box, RegionBlock
    from obmd_tpu.integrate import make_step, setup
    from obmd_tpu.state import init_state

    box = Box((0, 0, 0), (10, 4, 4), (False, True, True))
    r1 = RegionBlock((0, 0, 0), (2, 4, 4))
    r2 = RegionBlock((8, 0, 0), (10, 4, 4))
    pair = DPDParams.create(temp=0.5, cutoff=1.0, seed=3, a0=10.0,
                            gamma=2.0, ntypes=2)

    def run(gt):
        obmd = ObmdParams(
            ntype=0, nfreq=1, seed=11, pxx=2.0, alpha=0.5, tau=0.01,
            nbuf=100.0, region1=r1, region2=r2, region5=r1, region6=r2,
            buffer_size=2.0, usher=None, near=0.4, insert_kmax=4,
            group_types=gt)
        cfg = SceneConfig(box=box, masses=(1.0, 1.0), pair=pair, dt=0.01,
                          capacity=Capacity(n_max=900, cell_capacity=24),
                          obmd=obmd, skin=0.3, force_path="nlist")
        r = np.random.default_rng(2)
        n0 = 480
        x = r.uniform([0.05, 0.05, 0.05], [9.95, 3.95, 3.95], (n0, 3))
        st = setup(cfg, init_state(cfg, x, v=r.normal(0, 0.5, (n0, 3)),
                                   types=np.arange(n0) % 2))
        step = jax.jit(make_step(cfg))
        for _ in range(5):
            st = step(st)
        return int(st.obmd.ninserted)

    assert run((0,)) > run(None)
