import jax.numpy as jnp
import numpy as np

from obmd_tpu.cells import GridSpec, build_cells
from obmd_tpu.geometry import Box


def _brute_pairs(x, box, cutoff):
    """All unordered pairs within cutoff, minimum image."""
    n = len(x)
    pairs = set()
    L = np.asarray(box.lengths)
    per = np.asarray(box.periodic)
    for i in range(n):
        for j in range(i + 1, n):
            d = x[i] - x[j]
            d = np.where(per, d - L * np.round(d / L), d)
            if np.dot(d, d) < cutoff**2:
                pairs.add((i, j))
    return pairs


def _cell_pairs(spec, table, x, box, cutoff):
    """Pairs reachable through the stencil (unordered, within cutoff)."""
    n = len(x)
    tab = np.asarray(table.table)
    nbr = spec.stencil_neighbors()
    L = np.asarray(box.lengths)
    per = np.asarray(box.periodic)
    found = set()
    for k in range(nbr.shape[0]):
        for c in range(spec.n_cells):
            jc = nbr[k][c]
            for i in tab[c]:
                if i >= n:
                    continue
                for j in tab[jc]:
                    if j >= n or i == j:
                        continue
                    d = x[i] - x[j]
                    d = np.where(per, d - L * np.round(d / L), d)
                    if np.dot(d, d) < cutoff**2:
                        found.add((min(i, j), max(i, j)))
    return found


def test_cell_build_ranks_and_overflow():
    box = Box((0.0, 0.0, 0.0), (4.0, 4.0, 4.0), (False, True, True))
    spec = GridSpec.create(box, 1.0, capacity=2)
    # 3 atoms in the same cell with capacity 2 -> one overflow
    x = jnp.asarray([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.3, 0.3, 0.3],
                     [3.5, 3.5, 3.5]])
    alive = jnp.asarray([True, True, True, True])
    tab = build_cells(spec, x, alive)
    assert int(tab.overflow) == 1
    t = np.asarray(tab.table)
    # cell (0,0,0) holds two of the three; last row (trash) all sentinel
    assert (t[0] < 4).sum() == 2
    assert (t[-1] == 4).all()


def test_dead_atoms_excluded():
    box = Box((0.0, 0.0, 0.0), (4.0, 4.0, 4.0), (False, True, True))
    spec = GridSpec.create(box, 1.0, capacity=4)
    x = jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]])
    alive = jnp.asarray([True, False])
    tab = build_cells(spec, x, alive)
    t = np.asarray(tab.table)
    assert (t == 1).sum() == 0  # dead atom nowhere in the grid
    assert (t == 0).sum() == 1


def test_stencil_covers_all_pairs_random():
    rng = np.random.default_rng(0)
    box = Box((0.0, 0.0, 0.0), (6.0, 5.0, 4.0), (False, True, True))
    cutoff = 1.0
    x = rng.uniform([0, 0, 0], [6, 5, 4], size=(120, 3)).astype(np.float32)
    spec = GridSpec.create(box, cutoff, capacity=16)
    tab = build_cells(spec, jnp.asarray(x), jnp.ones(120, bool))
    assert int(tab.overflow) == 0
    brute = _brute_pairs(x, box, cutoff)
    found = _cell_pairs(spec, tab, x, box, cutoff)
    assert brute == found


def test_stencil_small_periodic_axis():
    # periodic axis spanned by 2 cells: the -1/+1 stencil neighbors alias
    # under mod, so the stencil must deduplicate; pairs must not be double
    # counted and must all be found.  (2-cell axes are kept — collapsing to
    # 1 cell concentrated atoms and overflowed cell capacity.)
    rng = np.random.default_rng(1)
    box = Box((0.0, 0.0, 0.0), (6.0, 2.5, 2.5), (False, True, True))
    cutoff = 1.0
    x = rng.uniform([0, 0, 0], [6, 2.5, 2.5], size=(60, 3)).astype(np.float32)
    spec = GridSpec.create(box, cutoff, capacity=64)
    assert spec.dims[1] == 2 and spec.dims[2] == 2
    tab = build_cells(spec, jnp.asarray(x), jnp.ones(60, bool))
    brute = _brute_pairs(x, box, cutoff)
    found = _cell_pairs(spec, tab, x, box, cutoff)
    assert brute == found
    # no duplicated (cell, neighbor) edges for same pair: verify stencil dedup
    nbr = spec.stencil_neighbors()
    for c in range(spec.n_cells):
        tgt = [nbr[k][c] for k in range(27) if nbr[k][c] != spec.n_cells]
        assert len(tgt) == len(set(tgt))
