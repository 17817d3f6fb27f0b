"""Fixed-capacity, validity-masked SoA particle state.

This single pytree replaces the reference's dynamic per-rank atom store +
atom map + exchange/borders machinery (atom.cpp / atom_vec.cpp /
comm_brick.cpp): particle count changes are expressed as mask flips and
masked writes under fully static shapes, which is what XLA wants.

Deletion = `alive` flip + momentum tally; insertion = write into free slots;
"natoms" = alive.sum().  Atom identity is the `tag` (global id) — stable
under any re-sorting, and the key for counter-based pair noise.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .config import SceneConfig


@struct.dataclass
class ObmdScalars:
    """Per-step OBMD stage products + running statistics.

    momentum/shear forces are computed in the pre-exchange stage and consumed
    by the post-force stage of the *same* step (fix_obmd_merged.cpp:607-630 ->
    :1229-1240)."""

    momentum_force_left: jnp.ndarray   # [3]
    momentum_force_right: jnp.ndarray  # [3]
    shear_force_left: jnp.ndarray      # [3]
    shear_force_right: jnp.ndarray     # [3]
    ndeleted: jnp.ndarray              # i32 running total (ref: `ndeleted`)
    ninserted: jnp.ndarray             # i32 running total
    insert_fail: jnp.ndarray           # i32 running total of unmet insertions
    usher_iters: jnp.ndarray           # i32 running total of USHER iterations

    @staticmethod
    def zeros(dtype=jnp.float32):
        z3 = jnp.zeros((3,), dtype)
        zi = jnp.zeros((), jnp.int32)
        return ObmdScalars(z3, z3, z3, z3, zi, zi, zi, zi)


@struct.dataclass
class State:
    """SoA particle store, capacity N = x.shape[0].

    Dead slots: alive=False, positions parked at the box center (any finite
    value works — dead atoms are excluded from the cell grid by mask, not by
    position), tag = -1.
    """

    x: jnp.ndarray        # [N,3] positions
    v: jnp.ndarray        # [N,3] velocities
    f: jnp.ndarray        # [N,3] forces from the previous step's evaluation
    type: jnp.ndarray     # [N] i32, 0-based
    tag: jnp.ndarray      # [N] i32 global id, -1 for dead slots
    alive: jnp.ndarray    # [N] bool
    q: jnp.ndarray        # [N] per-atom charge (atom_vec_adress.cpp:23 q_flag)
    mol: jnp.ndarray      # [N] i32 molecule id (0 = not in a molecule)
    # AdResS per-atom fields (registered at atom.cpp:550-557 and carried in
    # every halo exchange by atom_vec_adress.cpp:36-61):
    lambdaF: jnp.ndarray   # [N] resolution parameter (set by AdResS drivers)
    cms_mol: jnp.ndarray   # [N,3] molecule center-of-mass position
    vcms_mol: jnp.ndarray  # [N,3] molecule center-of-mass velocity
    rep_atom: jnp.ndarray  # [N] i32 representative-atom flag (from the
                           # molecule template, atom.cpp:2143-2148)
    bond1: jnp.ndarray    # [N] i32 SLOT of 1st bond partner (-1 = none);
    bond2: jnp.ndarray    # [N] i32 SLOT of 2nd bond partner (-1 = none).
                          # Slot references are remapped by every relayout
                          # (cellpad.layout_build / relayout_incremental), so
                          # resolution is exact for any tag value — unlike a
                          # tag-keyed map, which breaks once inserted tags
                          # outgrow the capacity (round-1 Weak #3).
    step: jnp.ndarray     # i32 scalar
    sim_time: jnp.ndarray # scalar, advanced in the OBMD stage like the
                          # reference's simulation_time (fix_obmd_merged.cpp:612)
    maxtag: jnp.ndarray   # i32 scalar, current max global id
    key: jnp.ndarray      # jax PRNG key (uint32[2]) for the cold path
    obmd: ObmdScalars
    cell_overflow: jnp.ndarray  # i32: atoms dropped from overfull cells (diagnostic)
    nbrs: Optional[object] = None  # NeighborState (nlist path); built by setup()
    # Branched topology (absent = None for chain scenes, so they compile to
    # exactly the 2-partner graphs; fix_obmd_merged.cpp:709-821 keeps
    # bond/angle/dihedral/improper bookkeeping for arbitrary molecules):
    bond3: Optional[jnp.ndarray] = None  # [N] i32 SLOT of 3rd bond partner
    bond4: Optional[jnp.ndarray] = None  # [N] i32 SLOT of 4th bond partner
    impr: Optional[jnp.ndarray] = None   # [N,3] i32 SLOTS of (i1, i3, i4) of
    #   the harmonic improper centered on this atom (improper_harmonic.cpp
    #   quadruple order i1-i2-i3-i4 with i2 = this atom); -1 rows = none.

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def bond_partners(self) -> tuple:
        """All present bond-partner SLOT columns (2 for chains, 4 for
        branched topologies) — the iteration unit of every bonded pass."""
        cols = [self.bond1, self.bond2]
        if self.bond3 is not None:
            cols.append(self.bond3)
        if self.bond4 is not None:
            cols.append(self.bond4)
        return tuple(cols)

    @property
    def natoms(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    @property
    def dtype(self):
        return self.x.dtype


def init_state(cfg: SceneConfig, x, v=None, types=None, seed: int = 0,
               tags=None, q=None, mol=None, bonds=None, lambdaF=None,
               rep_atom=None, impropers=None) -> State:
    """Build a State from host arrays of n <= n_max real atoms.

    bonds: optional [nb, 2] 1-based atom-tag pairs, each atom in at most
    FOUR bonds (stored as per-atom partner SLOTS, remapped on every
    relayout; the bond3/bond4 columns exist only when some atom actually
    has >2 partners, so chain scenes keep their 2-column graphs).

    impropers: optional [ni, 4] 1-based atom-tag quadruples (i1, i2, i3,
    i4) in improper_harmonic.cpp order — i2 is the center and must be
    bonded to i1, i3 AND i4 (the out-of-plane convention); stored as a
    per-CENTER [N,3] slot triplet."""
    import numpy as np

    cfg = cfg.finalize()
    dtype = jnp.dtype(cfg.dtype)
    n_max = cfg.capacity.n_max
    x = np.asarray(x, dtype=dtype)
    n = x.shape[0]
    if n > n_max:
        raise ValueError(f"{n} atoms > capacity {n_max}")

    center = np.asarray([(l + h) * 0.5 for l, h in zip(cfg.box.lo, cfg.box.hi)], dtype=dtype)
    xp = np.tile(center, (n_max, 1))
    xp[:n] = x
    vp = np.zeros((n_max, 3), dtype=dtype)
    if v is not None:
        vp[:n] = np.asarray(v, dtype=dtype)
    tp = np.zeros((n_max,), dtype=np.int32)
    if types is not None:
        tp[:n] = np.asarray(types, dtype=np.int32)
    tagp = np.full((n_max,), -1, dtype=np.int32)
    if tags is not None:
        tagp[:n] = np.asarray(tags, dtype=np.int32)
    else:
        tagp[:n] = np.arange(1, n + 1, dtype=np.int32)
    alive = np.zeros((n_max,), dtype=bool)
    alive[:n] = True
    qp = np.zeros((n_max,), dtype=dtype)
    if q is not None:
        qp[:n] = np.asarray(q, dtype=dtype)
    molp = np.zeros((n_max,), dtype=np.int32)
    if mol is not None:
        molp[:n] = np.asarray(mol, dtype=np.int32)
    lamp = np.zeros((n_max,), dtype=dtype)
    if lambdaF is not None:
        lamp[:n] = np.asarray(lambdaF, dtype=dtype)
    repp = np.zeros((n_max,), dtype=np.int32)
    if rep_atom is not None:
        repp[:n] = np.asarray(rep_atom, dtype=np.int32)
    bcols = [np.full((n_max,), -1, dtype=np.int32) for _ in range(4)]
    tag2row = {int(t): i for i, t in enumerate(tagp[:n])}
    if bonds is not None:
        for a, b in np.asarray(bonds, dtype=np.int64):
            for me, other in ((int(a), int(b)), (int(b), int(a))):
                row = tag2row[me]
                orow = tag2row[other]
                for col in bcols:
                    if col[row] < 0:
                        col[row] = orow
                        break
                else:
                    raise ValueError(
                        f"atom tag {me} has more than four bonds; the "
                        "per-atom partner-slot storage holds <= 4")
    branched = bool((bcols[2] >= 0).any()) or cfg.branched_topology
    imprp = None
    if cfg.improper is not None and cfg.branched_topology:
        # insertion templates may carry impropers even when the initial
        # atoms do not — the column must exist for inserted rows to land in
        imprp = np.full((n_max, 3), -1, dtype=np.int32)
    if impropers is not None and len(impropers):
        if not branched:
            raise ValueError(
                "impropers require the center to carry >= 3 bonds")
        if imprp is None:
            imprp = np.full((n_max, 3), -1, dtype=np.int32)
        for quad in np.asarray(impropers, dtype=np.int64):
            i1, i2, i3, i4 = (int(v_) for v_ in quad[-4:])
            c = tag2row[i2]
            ends = [tag2row[i1], tag2row[i3], tag2row[i4]]
            prt = {int(p) for p in (bcols[0][c], bcols[1][c],
                                    bcols[2][c], bcols[3][c]) if p >= 0}
            for e, t_ in zip(ends, (i1, i3, i4)):
                if e not in prt:
                    raise ValueError(
                        f"improper ({i1},{i2},{i3},{i4}): center {i2} is "
                        f"not bonded to {t_} — only the out-of-plane "
                        "convention (center bonded to all three ends) is "
                        "stored per-center")
            if imprp[c, 0] >= 0:
                raise ValueError(
                    f"atom tag {i2} is the center of two impropers; the "
                    "per-center storage holds one")
            imprp[c] = ends

    return State(
        x=jnp.asarray(xp), v=jnp.asarray(vp), f=jnp.zeros((n_max, 3), dtype),
        type=jnp.asarray(tp), tag=jnp.asarray(tagp), alive=jnp.asarray(alive),
        q=jnp.asarray(qp), mol=jnp.asarray(molp),
        lambdaF=jnp.asarray(lamp),
        cms_mol=jnp.zeros((n_max, 3), dtype),
        vcms_mol=jnp.zeros((n_max, 3), dtype),
        rep_atom=jnp.asarray(repp),
        bond1=jnp.asarray(bcols[0]), bond2=jnp.asarray(bcols[1]),
        bond3=jnp.asarray(bcols[2]) if branched else None,
        bond4=jnp.asarray(bcols[3]) if branched else None,
        impr=jnp.asarray(imprp) if imprp is not None else None,
        step=jnp.zeros((), jnp.int32), sim_time=jnp.zeros((), dtype),
        maxtag=jnp.asarray(int(tagp.max(initial=0)), jnp.int32),
        key=jax.random.PRNGKey(seed),
        obmd=ObmdScalars.zeros(dtype),
        cell_overflow=jnp.zeros((), jnp.int32),
    )


def masses_array(cfg: SceneConfig, dtype=None) -> jnp.ndarray:
    dtype = dtype or jnp.dtype(cfg.dtype)
    return jnp.asarray(cfg.masses, dtype=dtype)


def per_atom_mass(cfg: SceneConfig, state: State) -> jnp.ndarray:
    if cfg.ntypes == 1:
        # single type: a broadcast constant — the [N] type gather costs a
        # full pass at production sizes and the hot loop takes this twice
        # per step
        return jnp.full((state.capacity,), float(cfg.masses[0]),
                        state.dtype)
    return masses_array(cfg, state.dtype)[state.type]


def temperature(cfg: SceneConfig, state: State) -> jnp.ndarray:
    """LAMMPS `compute temp` convention: T = sum(m v^2) / (dof kB),
    dof = 3 N - 3 (kB = 1 in LJ units)."""
    m = per_atom_mass(cfg, state)
    ke2 = jnp.sum(jnp.where(state.alive[:, None], m[:, None] * state.v**2, 0.0))
    n = state.natoms
    dof = jnp.maximum(3 * n - 3, 1).astype(state.dtype)
    return ke2 / dof


def kinetic_energy(cfg: SceneConfig, state: State) -> jnp.ndarray:
    m = per_atom_mass(cfg, state)
    return 0.5 * jnp.sum(jnp.where(state.alive[:, None], m[:, None] * state.v**2, 0.0))


def momentum(cfg: SceneConfig, state: State) -> jnp.ndarray:
    m = per_atom_mass(cfg, state)
    return jnp.sum(jnp.where(state.alive[:, None], m[:, None] * state.v, 0.0), axis=0)
