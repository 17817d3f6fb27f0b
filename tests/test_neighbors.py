import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.geometry import Box
from obmd_tpu.neighbors import (NeighborParams, build_nlist, full_rebuild,
                                patch_insertions, update_table)
from obmd_tpu.cells import GridSpec


def _params(box, cutoff=1.0, skin=0.3, cap=14, k=32):
    spec = GridSpec.create(box, cutoff + skin, cap)
    return NeighborParams(spec=spec, k_max=k, movers_max=64,
                          cutoff=cutoff, skin=skin)


def _row_sets(nlist, alive, n):
    out = {}
    nl = np.asarray(nlist)
    for i in range(n):
        if alive[i]:
            out[i] = set(j for j in nl[i] if j < n)
    return out


def test_incremental_matches_full_after_moves():
    box = Box((0.0, 0.0, 0.0), (8.0, 5.2, 5.2), (False, True, True))
    p = _params(box)
    r = np.random.default_rng(0)
    n = 200
    x = r.uniform([0, 0, 0], [8, 5.2, 5.2], (n, 3)).astype(np.float32)
    alive = np.ones(n, bool)
    ns = jax.jit(lambda x, a: full_rebuild(p, box, x, a))(jnp.asarray(x),
                                                          jnp.asarray(alive))
    # move a handful of atoms to new cells
    x2 = x.copy()
    movers = r.choice(n, 17, replace=False)
    x2[movers] = r.uniform([0, 0, 0], [8, 5.2, 5.2], (17, 3)).astype(np.float32)
    ns2 = jax.jit(lambda ns, x, a: update_table(p, ns, x, a))(
        ns, jnp.asarray(x2), jnp.asarray(alive))
    assert not bool(ns2.force_rebuild)
    # table must file every alive atom exactly once, in its current cell
    t = np.asarray(ns2.table)
    spec = p.spec
    filed = {}
    for c in range(spec.n_cells):
        for v in t[c]:
            if v < n:
                assert v not in filed
                filed[v] = c
    assert len(filed) == n
    cells = np.asarray(spec.cell_of(jnp.asarray(x2)))
    for i, c in filed.items():
        assert cells[i] == c, (i, cells[i], c)


def test_update_table_files_deaths():
    box = Box((0.0, 0.0, 0.0), (6.0, 4.0, 4.0), (False, True, True))
    p = _params(box)
    r = np.random.default_rng(1)
    n = 80
    x = r.uniform([0, 0, 0], [6, 4, 4], (n, 3)).astype(np.float32)
    alive = np.ones(n, bool)
    ns = full_rebuild(p, box, jnp.asarray(x), jnp.asarray(alive))
    alive[::7] = False
    ns2 = update_table(p, ns, jnp.asarray(x), jnp.asarray(alive))
    t = np.asarray(ns2.table)
    dead = set(np.nonzero(~alive)[0])
    present = set(v for row in t[:-1] for v in row if v < n)
    assert present.isdisjoint(dead)
    assert len(present) == alive.sum()


def test_nlist_complete_vs_brute():
    box = Box((0.0, 0.0, 0.0), (7.0, 4.5, 4.5), (False, True, True))
    p = _params(box)
    r = np.random.default_rng(2)
    n = 150
    x = r.uniform([0, 0, 0], [7, 4.5, 4.5], (n, 3)).astype(np.float32)
    alive = np.ones(n, bool)
    ns = full_rebuild(p, box, jnp.asarray(x), jnp.asarray(alive))
    assert int(ns.overflow) == 0
    rows = _row_sets(ns.nlist, alive, n)
    L = np.asarray(box.lengths)
    per = np.asarray(box.periodic)
    rl2 = (p.cutoff + p.skin) ** 2
    for i in range(n):
        expect = set()
        for j in range(n):
            if i == j:
                continue
            d = x[i] - x[j]
            d = np.where(per, d - L * np.round(d / L), d)
            if d @ d < rl2:
                expect.add(j)
        assert rows[i] == expect, i


def test_patch_insertions_symmetric():
    box = Box((0.0, 0.0, 0.0), (7.0, 4.5, 4.5), (False, True, True))
    p = _params(box)
    r = np.random.default_rng(3)
    n_real = 120
    n = 140   # capacity with free slots
    x = np.zeros((n, 3), np.float32)
    x[:n_real] = r.uniform([0, 0, 0], [7, 4.5, 4.5], (n_real, 3))
    alive = np.zeros(n, bool)
    alive[:n_real] = True
    ns = full_rebuild(p, box, jnp.asarray(x), jnp.asarray(alive))

    # insert 3 new atoms into free slots
    new = np.asarray([120, 121, 122], np.int32)
    x2 = x.copy()
    x2[new] = r.uniform([0.5, 0.5, 0.5], [6.5, 4, 4], (3, 3))
    alive2 = alive.copy()
    alive2[new] = True
    pad_new = np.full(8, n, np.int32)
    pad_new[:3] = new
    ns2 = jax.jit(lambda ns, x, a, s: patch_insertions(p, box, ns, x, a, s))(
        ns, jnp.asarray(x2), jnp.asarray(alive2), jnp.asarray(pad_new))

    # resulting rows must equal a from-scratch build (as sets)
    ref = full_rebuild(p, box, jnp.asarray(x2), jnp.asarray(alive2))
    got = _row_sets(ns2.nlist, alive2, n)
    want = _row_sets(ref.nlist, alive2, n)
    assert got == want


def test_displacement_triggers_rebuild():
    from obmd_tpu.neighbors import maybe_rebuild
    box = Box((0.0, 0.0, 0.0), (6.0, 4.0, 4.0), (False, True, True))
    p = _params(box, skin=0.4)
    r = np.random.default_rng(4)
    n = 60
    x = r.uniform([0, 0, 0], [6, 4, 4], (n, 3)).astype(np.float32)
    alive = jnp.ones(n, bool)
    ns = full_rebuild(p, box, jnp.asarray(x), alive)
    # small move: no rebuild
    x_small = x + 0.05
    ns1 = maybe_rebuild(p, box, ns, jnp.asarray(x_small), alive)
    assert int(ns1.rebuilds) == int(ns.rebuilds)
    # one atom moves > skin/2: rebuild
    x_big = x.copy()
    x_big[5] += 0.3
    ns2 = maybe_rebuild(p, box, ns, jnp.asarray(x_big), alive)
    assert int(ns2.rebuilds) == int(ns.rebuilds) + 1


def test_obmd_scene_rows_do_not_overflow():
    """Regression: the OBMD_DPD scene at rho=3 with skin 0.39 averages ~34
    neighbors within cut+skin; a too-small max_neighbors silently drops
    real pairs (counted in NeighborState.overflow, which must stay 0 —
    it measured 52 with the old default of 48)."""
    from obmd_tpu import scenes
    from obmd_tpu.integrate import make_step, setup
    sc = scenes.obmd_dpd_scene(scale=0.2, seed=1, insert_kmax=4,
                               cell_capacity=28, force_path="nlist")
    state = setup(sc.cfg, sc.state)
    step = jax.jit(make_step(sc.cfg))
    for _ in range(5):
        state = step(state)
    assert int(state.nbrs.overflow) == 0
