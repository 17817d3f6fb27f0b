"""x-slab spatial decomposition (ppermute halos + migration) validated
against the single-chip nlist engine on the virtual 8-device CPU mesh.

The slab path is the scale-out analogue of the reference's MPI domain
decomposition (comm_brick.cpp exchange :652 / borders :771 /
forward_comm :538); these tests check (a) trajectory + OBMD counter
equivalence with one chip, (b) the ownership invariant that migration
maintains, and (c) that the compiled step never all-gathers positions
(per-device footprint O(N/ndev + halo))."""
import re

import jax
import numpy as np
import pytest

from obmd_tpu import scenes
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.parallel.slab_decomp import (make_mesh, make_slab_geom,
                                           make_slab_step, shard_by_slab)

NDEV = 8


@pytest.fixture(scope="module")
def scene():
    # scale=0.35 keeps slab width (1.47) above the cutoff (1.0) on 8 slabs.
    # Reference = the stateless exact "sweep" engine: the slab step
    # evaluates fresh cells every step, so it matches sweep to fp noise
    # (the nlist engine deviates around insertions by its skin tolerance).
    sc = scenes.obmd_dpd_scene(scale=0.35, seed=3, insert_kmax=4,
                               cell_capacity=28, force_path="sweep")
    state = setup(sc.cfg, sc.state)
    return sc.cfg, state


@pytest.fixture(scope="module")
def slab_run(scene):
    cfg, state = scene
    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV)
    sstate = shard_by_slab(cfg, geom, state, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    lstep = jax.jit(make_step(cfg))
    s_sh, s_l = sstate, state
    for _ in range(10):
        s_sh = sstep(s_sh)
        s_l = lstep(s_l)
    return cfg, geom, s_sh, s_l


def test_slab_matches_single_chip(slab_run):
    cfg, geom, s_sh, s_l = slab_run
    assert int(s_sh.cell_overflow) == 0          # no halo/migration loss
    assert int(s_sh.natoms) == int(s_l.natoms)
    assert int(s_sh.obmd.ndeleted) == int(s_l.obmd.ndeleted)
    assert int(s_sh.obmd.ninserted) == int(s_l.obmd.ninserted)
    # same atoms (tags), same positions up to fp ordering
    a1, a2 = np.asarray(s_sh.alive), np.asarray(s_l.alive)
    m1 = {int(t): np.asarray(s_sh.x)[i]
          for i, t in enumerate(np.asarray(s_sh.tag)) if a1[i]}
    m2 = {int(t): np.asarray(s_l.x)[i]
          for i, t in enumerate(np.asarray(s_l.tag)) if a2[i]}
    assert set(m1) == set(m2)
    diffs = [np.abs(m1[t] - m2[t]).max() for t in m1]
    assert max(diffs) < 1e-4


def test_slab_ownership_invariant(slab_run):
    """After migration, every alive atom sits in the slab of the device
    that owns its slot block (comm_brick.cpp:652 exchange postcondition)."""
    cfg, geom, s_sh, _ = slab_run
    x = np.asarray(s_sh.x)
    alive = np.asarray(s_sh.alive)
    owner = np.arange(geom.capacity) // geom.n_loc
    slab = np.clip(((x[:, 0] - geom.x0) / geom.slab_w).astype(np.int64),
                   0, geom.ndev - 1)
    # edge devices may hold escapees beyond the open faces; the clip above
    # already folds those onto the edge slabs
    bad = alive & (slab != owner)
    assert int(bad.sum()) == 0


def test_slab_migration_happened(slab_run):
    """The comparison run must actually exercise migration (atoms crossing
    slab faces), otherwise the invariant test is vacuous.  Initial sharding
    fills each device's block from rank 0 upward; a migrated-in atom lands
    in a free slot beyond the initial fill, detectable as an alive atom
    whose tag also appears... simpler: rerun one step and diff ownership."""
    cfg, geom, s_sh, _ = slab_run
    mesh = make_mesh(NDEV)
    sstep = make_slab_step(cfg, mesh, geom)
    before_tags = {}
    tag = np.asarray(s_sh.tag)
    alive = np.asarray(s_sh.alive)
    owner = np.arange(geom.capacity) // geom.n_loc
    for i in np.nonzero(alive)[0]:
        before_tags[int(tag[i])] = owner[i]
    s2 = s_sh
    moved = 0
    for _ in range(5):
        s2 = sstep(s2)
    tag2 = np.asarray(s2.tag)
    alive2 = np.asarray(s2.alive)
    for i in np.nonzero(alive2)[0]:
        t = int(tag2[i])
        if t in before_tags and before_tags[t] != owner[i]:
            moved += 1
    assert moved > 0


def test_slab_no_position_all_gather(scene):
    """The compiled step must not all-gather per-atom arrays: every
    all-gather/all-reduce operand stays O(K + scalars), never O(N)."""
    cfg, state = scene
    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV)
    sstate = shard_by_slab(cfg, geom, state, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    txt = sstep.lower(sstate).compile().as_text()
    limit = 16 * geom.capacity // NDEV  # anything O(n_loc)+ is a red flag
    for m in re.finditer(r"all-gather[^\n]*", txt):
        shapes = re.findall(r"[a-z0-9]+\[([0-9,]*)\]", m.group(0))
        for s in shapes:
            n = int(np.prod([int(d) for d in s.split(",") if d] or [1]))
            assert n <= 4096, f"large all-gather in slab step: {m.group(0)[:120]}"


def test_slab_soak_counters(scene):
    """>= 100-step soak (VERDICT r2 item 6): the slab run's OBMD counters
    and population must track the single-chip engine.  Trajectories
    decorrelate chaotically after ~50 DPD steps (different f32 reduction
    order), so the check is statistical: same steady-state population and
    exchange flux, loud invariants the whole way."""
    cfg, state = scene
    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV)
    sstate = shard_by_slab(cfg, geom, state, mesh)
    sstep = make_slab_step(cfg, mesh, geom)
    lstep = jax.jit(make_step(cfg))
    s_sh, s_l = sstate, state
    owner = np.arange(geom.capacity) // geom.n_loc
    for chunk in range(6):
        for _ in range(20):
            s_sh = sstep(s_sh)
            s_l = lstep(s_l)
        # loud invariants at every checkpoint
        assert int(s_sh.cell_overflow) == 0, chunk
        x = np.asarray(s_sh.x)
        alive = np.asarray(s_sh.alive)
        slab = np.clip(((x[:, 0] - geom.x0) / geom.slab_w).astype(np.int64),
                       0, geom.ndev - 1)
        assert int((alive & (slab != owner)).sum()) == 0, chunk
        # populations track closely even after decorrelation
        n_sh, n_l = int(s_sh.natoms), int(s_l.natoms)
        assert abs(n_sh - n_l) <= max(12, 0.03 * n_l), (chunk, n_sh, n_l)
    ins_sh, ins_l = int(s_sh.obmd.ninserted), int(s_l.obmd.ninserted)
    del_sh, del_l = int(s_sh.obmd.ndeleted), int(s_l.obmd.ndeleted)
    # the exchange flux (inserted & deleted over 120 steps) is a strong
    # statistic: both engines must produce the same steady-state turnover
    assert del_l > 0 and ins_l >= 0
    assert abs(del_sh - del_l) <= max(15, 0.25 * del_l), (del_sh, del_l)
    assert abs(ins_sh - ins_l) <= max(15, 0.25 * max(ins_l, 1)), (ins_sh,
                                                                  ins_l)


def test_slab_pallas_kernel_matches_gathered():
    """force_impl='pallas': the per-slab cell-major Pallas kernel inside
    shard_map produces the same trajectory as the gathered XLA impl
    (temp=0: drag+conservative only, so the two impls' different noise
    hash constructions don't enter)."""
    import dataclasses

    from obmd_tpu.config import Capacity, DPDParams, SceneConfig
    from obmd_tpu.geometry import Box
    from obmd_tpu.state import init_state
    from obmd_tpu.integrate import setup

    box = Box((0.0, 0.0, 0.0), (16.0, 4.0, 4.0), (False, True, True))
    r = np.random.default_rng(11)
    n = 500
    x = r.uniform([0.05, 0.05, 0.05], [15.95, 3.95, 3.95], (n, 3))
    v = r.normal(0, 0.5, (n, 3))
    cfg = SceneConfig(
        box=box, masses=(1.0,), dt=0.004,
        pair=DPDParams.create(temp=0.0, cutoff=1.0, seed=5, a0=25.0,
                              gamma=3.0),
        capacity=Capacity(n_max=n, cell_capacity=20),
        skin=0.3, force_path="nlist")
    st = setup(cfg, init_state(cfg, x, v=v))
    mesh = make_mesh(NDEV)
    geom = make_slab_geom(cfg, NDEV, n_loc=120)
    assert geom.pad_geom is not None
    sst0 = shard_by_slab(cfg, geom, st, mesh)
    step_g = make_slab_step(cfg, mesh, geom, force_impl="gathered")
    step_p = make_slab_step(cfg, mesh, geom, force_impl="pallas")
    sg, sp = sst0, sst0
    for _ in range(3):
        sg = step_g(sg)
        sp = step_p(sp)
    assert int(sp.cell_overflow) == 0
    ag, ap = np.asarray(sg.alive), np.asarray(sp.alive)
    mg = {int(t): np.asarray(sg.x)[i]
          for i, t in enumerate(np.asarray(sg.tag)) if ag[i]}
    mp = {int(t): np.asarray(sp.x)[i]
          for i, t in enumerate(np.asarray(sp.tag)) if ap[i]}
    assert set(mg) == set(mp)
    diffs = [np.abs(mg[t] - mp[t]).max() for t in mg]
    assert max(diffs) < 1e-5, max(diffs)


def test_slab_balance_quantile_cuts():
    """`balance` analogue (balance.cpp): position-quantile slab cuts give
    near-equal per-device populations on a skewed scene, and the balanced
    step preserves the trajectory vs the uniform decomposition."""
    from obmd_tpu.config import Capacity, DPDParams, SceneConfig
    from obmd_tpu.geometry import Box
    from obmd_tpu.integrate import setup
    from obmd_tpu.parallel.slab_decomp import balanced_boundaries
    from obmd_tpu.state import init_state

    box = Box((0.0, 0.0, 0.0), (16.0, 4.0, 4.0), (False, True, True))
    r = np.random.default_rng(2)
    n = 600
    # density skew: 3/4 of the atoms in the left half
    xl = r.uniform([0.05, 0.05, 0.05], [8.0, 3.95, 3.95], (3 * n // 4, 3))
    xr = r.uniform([8.0, 0.05, 0.05], [15.95, 3.95, 3.95], (n // 4, 3))
    x = np.concatenate([xl, xr])
    v = r.normal(0, 0.4, (n, 3))
    cfg = SceneConfig(
        box=box, masses=(1.0,), dt=0.004,
        pair=DPDParams.create(temp=0.0, cutoff=1.0, seed=5, a0=25.0,
                              gamma=3.0),
        capacity=Capacity(n_max=n, cell_capacity=24),
        skin=0.3, force_path="nlist")
    st = setup(cfg, init_state(cfg, x, v=v))
    mesh = make_mesh(NDEV)

    cuts = balanced_boundaries(cfg, st, NDEV)
    assert len(cuts) == NDEV + 1
    assert min(np.diff(cuts)) >= 1.0 - 1e-9

    geom_u = make_slab_geom(cfg, NDEV, n_loc=240)
    geom_b = make_slab_geom(cfg, NDEV, n_loc=240, boundaries=cuts)
    s_u = shard_by_slab(cfg, geom_u, st, mesh)
    s_b = shard_by_slab(cfg, geom_b, st, mesh)

    def per_dev_counts(s, geom):
        alive = np.asarray(s.alive)
        owner = np.arange(geom.capacity) // geom.n_loc
        return np.asarray([int(alive[owner == d].sum())
                           for d in range(NDEV)])

    cu = per_dev_counts(s_u, geom_u)
    cb = per_dev_counts(s_b, geom_b)
    assert cb.max() - cb.min() < cu.max() - cu.min(), (cu, cb)
    assert cb.max() <= int(1.35 * n / NDEV), cb   # near-balanced

    step_u = make_slab_step(cfg, mesh, geom_u)
    step_b = make_slab_step(cfg, mesh, geom_b)
    for _ in range(3):
        s_u = step_u(s_u)
        s_b = step_b(s_b)
    assert int(s_b.cell_overflow) == 0
    au, ab = np.asarray(s_u.alive), np.asarray(s_b.alive)
    mu = {int(t): np.asarray(s_u.x)[i]
          for i, t in enumerate(np.asarray(s_u.tag)) if au[i]}
    mb = {int(t): np.asarray(s_b.x)[i]
          for i, t in enumerate(np.asarray(s_b.tag)) if ab[i]}
    assert set(mu) == set(mb)
    diffs = [np.abs(mu[t] - mb[t]).max() for t in mu]
    assert max(diffs) < 1e-4, max(diffs)


def test_slab_dynamic_balance_tracks_drift():
    """fix balance analogue (fix_balance.cpp:375): under a strong
    left-to-right density drift, dynamic cuts keep per-device atom counts
    far tighter than static uniform cuts, with zero dropped pairs and the
    ownership invariant intact w.r.t. the LIVE cuts."""
    import jax.numpy as jnp
    from obmd_tpu.config import Capacity, DPDParams, SceneConfig
    from obmd_tpu.geometry import Box
    from obmd_tpu.parallel.slab_decomp import with_balance_cuts
    from obmd_tpu.state import init_state

    # closed-in-x is not allowed; use an OBMD-free open box where atoms
    # drift right under their initial velocity (no pair forces: the point
    # is the partitioner, not the physics)
    box = Box((0.0, 0.0, 0.0), (16.0, 4.0, 4.0), (False, True, True))
    cfg = SceneConfig(
        box=box, masses=(1.0,), dt=0.05,   # free streaming: max move/step
        pair=DPDParams.create(temp=0.0, cutoff=1.0, seed=1, a0=0.0,
                              gamma=0.0),  # 3*0.05 << min slab width
        capacity=Capacity(n_max=1024, cell_capacity=32),
        skin=0.3, force_path="sweep")
    r = np.random.default_rng(0)
    n = 800
    # everything starts in the left 40% and STRETCHES right (vx spread
    # 0.5..3): by the end the cloud spans most of the box, so equal-count
    # cuts are reachable inside the width envelope [halo_w, slab_w] — a
    # pure rigid drift would just park empty slabs on the vacated side
    x = r.uniform([0.1, 0.0, 0.0], [6.4, 4.0, 4.0], (n, 3))
    v = np.c_[r.uniform(0.5, 3.0, n), r.normal(0, 0.1, (n, 2))]
    st = setup(cfg, init_state(cfg, x, v=v))

    mesh = make_mesh(NDEV)
    # grow=2.5: the live cuts may widen a slab well past lx/ndev;
    # n_loc=512: everything starts concentrated in a few slabs;
    # m_max=256: a rebalance event migrates a whole cut band at once
    geom = make_slab_geom(cfg, NDEV, grow=2.5, n_loc=512, m_max=256)
    owner_id = np.arange(geom.capacity) // geom.n_loc

    def spread(s):
        alive = np.asarray(s.alive)
        counts = np.asarray([alive[owner_id == d].sum()
                             for d in range(NDEV)], float)
        return counts

    # static control
    # NB: one sharded program in flight at a time (block per step) — on a
    # low-core host, queueing many 8-partition programs starves XLA:CPU's
    # in-process collective rendezvous and aborts the process (observed:
    # "collective permute ... only 5 of 8 arrived").  A TPU mesh has
    # per-chip hardware queues and no such constraint.
    s_static = shard_by_slab(cfg, geom, st, mesh)
    step_static = make_slab_step(cfg, mesh, geom)
    for _ in range(60):
        s_static = jax.block_until_ready(step_static(s_static))
    # dynamic: rebalance every 4 steps
    s_dyn = with_balance_cuts(geom, shard_by_slab(cfg, geom, st, mesh))
    step_dyn = make_slab_step(cfg, mesh, geom, balance_every=4)
    for _ in range(60):
        s_dyn = jax.block_until_ready(step_dyn(s_dyn))

    assert int(s_dyn.cell_overflow) == 0, "dynamic path dropped pairs"
    c_static = spread(s_static)
    c_dyn = spread(s_dyn)
    n_alive = c_dyn.sum()
    assert n_alive == c_static.sum() == n       # nothing lost either way
    # ownership invariant w.r.t. the live cuts
    cuts = np.asarray(s_dyn.nbrs.cuts)
    xs = np.asarray(s_dyn.x)[:, 0]
    alive = np.asarray(s_dyn.alive)
    slab_of = np.clip(np.searchsorted(cuts, xs, side="right") - 1,
                      0, NDEV - 1)
    assert int((alive & (slab_of != owner_id)).sum()) == 0
    # balance quality: the busiest device (the step-time bottleneck —
    # fix balance's own "imbalance factor") carries far fewer atoms under
    # dynamic cuts.  The width clamps [halo_w, slab_w] bound how tight the
    # cuts can pack, so assert the bottleneck ratio, not perfect equality.
    target = n_alive / NDEV
    assert c_dyn.max() < 0.80 * c_static.max(), (c_dyn.tolist(),
                                                 c_static.tolist())
    assert c_dyn.max() < 1.6 * target, (c_dyn.tolist(), target)
