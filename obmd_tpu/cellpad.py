"""Padded cell-major state layout management (the "cellpad" fast path).

The particle store itself is the cell structure: slot = (block, rank, lane)
with lane = cell (see forces/pallas_dpd.PadGeometry).  Consequences:

  * the Pallas force kernel reads state arrays directly — zero gathers in
    the hot loop;
  * buffer-region subsets for the OBMD stage are *contiguous slices* (the
    open axis is the block-major axis) — zero gathers there too;
  * insertion = claiming a free rank in the target cell's lane column;
  * the layout is rebuilt (sort + scatter) only when the half-skin
    displacement criterion trips, exactly like a LAMMPS reneighbor
    (neighbor.cpp:2342).

Between rebuilds the cell assignment is stale by at most skin/2 per atom,
which the cutoff+skin cell size absorbs — the standard Verlet-skin argument.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .forces.pallas_dpd import PadGeometry
from .geometry import Box
from .state import State


@struct.dataclass
class PadAux:
    """Per-epoch bookkeeping for the cellpad layout."""

    xref: jnp.ndarray          # [n_slots, 3] positions at epoch start
    force_rebuild: jnp.ndarray
    rebuilds: jnp.ndarray
    overflow: jnp.ndarray      # atoms that did not fit their cell at build
    skin_trips: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))
    # i32: epochs whose end-of-epoch max displacement exceeded skin/2 — on
    # the static-schedule runner this is the post-hoc validity telemetry
    # (neighbor.cpp:2342's check as an assertion instead of a trigger);
    # any nonzero value means rebuild_every is set too high for the scene.
    #
    # Kernel-layout caches (HOT-PATH: the per-step [N] -> (nb, cap, lanes)
    # retile is a pathological minor-dim shuffle on TPU, ~0.5 ms EACH at
    # 94k atoms — measured round 4).  Rebuilt at every relayout (amortized
    # over the epoch), patched in place by insertions; deletions may leave
    # stale values (dead atoms are excluded by x = BIG / alive masking, so
    # a stale tag or a stale-high occ bound is harmless by construction).
    tag3d: Optional[jnp.ndarray] = None   # [nb, cap, lanes] i32 tags
    occ: Optional[jnp.ndarray] = None     # [nb] i32 max occupied rank + 1


def scatter_rows(arr, idx, vals, mode="drop"):
    """Row scatter decomposed per component.

    XLA lowers a row scatter into an [N, C] operand by forcing the operand
    to row-major {1,0:T(8,128)} layout, whose tiling pads C=3 up to 128
    lanes — a 42x memory blowup.  Inside a scanned step that layout
    propagates to the whole [N, C] loop carry, so EVERY elementwise pass
    reads/writes ~100 MB instead of ~3 MB (measured ~0.6 ms/step at 94k
    atoms).  C independent 1-D scatters plus a restack keep every [N, C]
    array in the sane {0,1:T(4,128)} layout."""
    if arr.ndim == 1:
        return arr.at[idx].set(vals, mode=mode)
    cols = [arr[:, k].at[idx].set(vals[..., k], mode=mode)
            for k in range(arr.shape[1])]
    return jnp.stack(cols, axis=1)


def kernel_caches(geom: PadGeometry, tag, alive) -> dict:
    """The per-epoch kernel-layout caches: tag3d (pair-noise keys + bonded
    exclusion j-tags) and occ (the i-rank loop bound, max occupied rank + 1
    per block).  Computed ONLY at relayout — the [N] -> (nb, cap, lanes)
    retile costs ~0.5 ms/step at 94k atoms if done per step."""
    nb, cap, lanes = geom.n_blocks, geom.cap, geom.lanes
    tag3d = tag.reshape(nb, cap, lanes)
    rank = jnp.arange(cap, dtype=jnp.int32)[None, :, None]
    occ = jnp.max(jnp.where(alive.reshape(nb, cap, lanes), rank, -1),
                  axis=(1, 2)) + 1
    return dict(tag3d=tag3d, occ=occ)


def patch_kernel_caches(geom: PadGeometry, aux: "PadAux", slot, tags,
                        n_slots: int) -> "PadAux":
    """Insertion-time cache patch: write the inserted atoms' tags into
    tag3d and raise the occ bound for their ranks (slot == n_slots rows are
    dropped).  Deletion needs no patch — stale tags/occ are masked/safe."""
    if aux.tag3d is None:
        return aux
    cap, lanes = geom.cap, geom.lanes
    b = slot // (cap * lanes)
    rem = slot % (cap * lanes)
    r = rem // lanes
    l_ = rem % lanes
    ok = slot < n_slots
    nb = geom.n_blocks
    bc = jnp.where(ok, b, nb)
    tag3d = aux.tag3d.at[bc, r, l_].set(tags, mode="drop")
    occ = aux.occ.at[bc].max(r + 1, mode="drop")
    return aux.replace(tag3d=tag3d, occ=occ)


def slot_index(geom: PadGeometry, cell, rank):
    """Flat slot id of (cell, rank)."""
    block, lane = geom.slot_of_cell(cell)
    return (block * geom.cap + rank) * geom.lanes + lane


def layout_build(geom: PadGeometry, box: Box, state: State) -> State:
    """(Re)pack the whole state into cell-major padded order.  Slot identity
    changes; tags carry atom identity."""
    n_slots = geom.n_slots
    n_cells = geom.n_cells
    cap = geom.cap

    cell = jnp.where(state.alive, geom.cell_of(state.x), n_cells)
    order = jnp.argsort(cell, stable=True)
    sc = cell[order]
    start = jnp.searchsorted(sc, sc, side="left")
    rank = (jnp.arange(state.capacity, dtype=jnp.int32)
            - start.astype(jnp.int32))
    ok = (sc < n_cells) & (rank < geom.fcap)
    overflow = jnp.sum(((sc < n_cells)
                        & (rank >= geom.fcap)).astype(jnp.int32))
    dest = jnp.where(ok, slot_index(geom, sc, rank), n_slots)

    center = jnp.asarray([(l + h) * 0.5 for l, h in zip(box.lo, box.hi)],
                         state.x.dtype)

    def scat(src, fill):
        out = jnp.full((n_slots,) + src.shape[1:], fill, src.dtype)
        return scatter_rows(out, dest, src[order])

    # bond partner SLOT references follow the permutation: old -> new
    n_cap = state.capacity
    new_of_old = jnp.full((n_cap,), -1, jnp.int32).at[order].set(
        jnp.where(ok, dest, -1).astype(jnp.int32), mode="drop")

    def remap(bond):
        return jnp.where(bond >= 0, new_of_old[jnp.clip(bond, 0, n_cap - 1)],
                         -1)

    x = jnp.broadcast_to(center, (n_slots, 3)).astype(state.x.dtype)
    x = scatter_rows(x, dest, state.x[order])
    new = State(
        x=x,
        v=scat(state.v, 0), f=scat(state.f, 0),
        type=scat(state.type, 0), tag=scat(state.tag, -1),
        alive=jnp.zeros((n_slots,), bool).at[dest].set(
            state.alive[order], mode="drop"),
        q=scat(state.q, 0), mol=scat(state.mol, 0),
        lambdaF=scat(state.lambdaF, 0), cms_mol=scat(state.cms_mol, 0),
        vcms_mol=scat(state.vcms_mol, 0), rep_atom=scat(state.rep_atom, 0),
        bond1=scat(remap(state.bond1), -1), bond2=scat(remap(state.bond2), -1),
        bond3=(scat(remap(state.bond3), -1)
               if state.bond3 is not None else None),
        bond4=(scat(remap(state.bond4), -1)
               if state.bond4 is not None else None),
        impr=(scat(remap(state.impr), -1)
              if state.impr is not None else None),
        step=state.step, sim_time=state.sim_time, maxtag=state.maxtag,
        key=state.key, obmd=state.obmd,
        cell_overflow=state.cell_overflow + overflow,
        nbrs=None)
    aux = PadAux(xref=new.x,
                 force_rebuild=jnp.zeros((), bool),
                 rebuilds=(state.nbrs.rebuilds + 1
                           if isinstance(state.nbrs, PadAux)
                           else jnp.ones((), jnp.int32)),
                 overflow=(state.nbrs.overflow + overflow
                           if isinstance(state.nbrs, PadAux)
                           else overflow),
                 skin_trips=(state.nbrs.skin_trips
                             if isinstance(state.nbrs, PadAux)
                             else jnp.zeros((), jnp.int32)),
                 **kernel_caches(geom, new.tag, new.alive))
    return new.replace(nbrs=aux)


def half_skin_tripped(box: Box, skin: float, state: State) -> jnp.ndarray:
    """True when some live atom drifted more than skin/2 from its epoch
    reference position (neighbor.cpp:2342 semantics)."""
    aux: PadAux = state.nbrs
    d = box.min_image(state.x - aux.xref)
    disp2 = jnp.where(state.alive, jnp.sum(d * d, axis=-1), 0.0)
    return (jnp.max(disp2) > (0.5 * skin) ** 2) | aux.force_rebuild


def note_skin_check(box: Box, skin: float, state: State) -> State:
    """Record an end-of-epoch half-skin violation in the telemetry counter
    (static-schedule runner: validity is asserted, not reacted to)."""
    aux: PadAux = state.nbrs
    trip = half_skin_tripped(box, skin, state)
    return state.replace(
        nbrs=aux.replace(skin_trips=aux.skin_trips + trip.astype(jnp.int32)))


def slot_cells(geom: PadGeometry) -> np.ndarray:
    """Static [n_slots] map slot -> linear cell id (-1 for lane padding).
    The cellpad layout's defining invariant: an alive atom in slot s sits in
    cell slot_cells[s] (up to half-skin drift within an epoch)."""
    lanes, s, p, cap = geom.lanes, geom.s, geom.p, geom.cap
    lane = np.arange(lanes)
    if p == 1:
        within = np.where(lane < s, lane, -1)
        slab_off = np.zeros_like(lane)
    else:
        within = np.where(lane < p * s, lane % s, -1)
        slab_off = np.where(lane < p * s, lane // s, 0)
    blocks = np.arange(geom.n_blocks)[:, None]
    slab = blocks * p + slab_off[None, :]
    nx = geom.dims[0]
    cell = np.where((within[None, :] >= 0) & (slab < nx),
                    slab * s + within[None, :], -1)
    return np.broadcast_to(cell[:, None, :],
                           (geom.n_blocks, cap, lanes)).reshape(-1).astype(np.int32)


def big_cumsum(v: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a long 1-D i32 array via a two-level
    hierarchy: row-wise lane cumsum on a [R, 512] reshape plus a short
    cumsum of row totals.  XLA lowers a flat 1-D cumsum at 300k elements
    to a ~1.4 ms loop on TPU; this form is ~10x faster (log-shift adds
    vectorized across sublanes)."""
    n = v.shape[0]
    C = 512
    if n < 4 * C:
        return jnp.cumsum(v)
    R = (n + C - 1) // C
    pad = R * C - n
    m = jnp.pad(v, (0, pad)).reshape(R, C)
    inner = jnp.cumsum(m, axis=1)
    rows = inner[:, -1]
    offs = jnp.cumsum(rows) - rows          # exclusive row offsets
    return (inner + offs[:, None]).reshape(-1)[:n]


def compact_indices(mask: jnp.ndarray, size: int, fill: int) -> jnp.ndarray:
    """`jnp.nonzero(mask, size=size, fill_value=fill)[0]` without the sort
    XLA lowers nonzero to (measured ~4 ms at 300k slots vs ~0.4 ms for
    this cumsum-rank + scatter construction)."""
    n = mask.shape[0]
    rank = big_cumsum(mask.astype(jnp.int32)) - 1
    dest = jnp.where(mask & (rank < size), rank, size)
    out = jnp.full((size + 1,), fill, jnp.int32)
    out = out.at[dest].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    return out[:size]


def relayout_incremental(geom: PadGeometry, box: Box, state: State,
                         m_max: int = 0, has_bonds: bool = True,
                         has_mol: bool = True,
                         has_charge: bool = True,
                         has_types: bool = True,
                         move_f: bool = True) -> State:
    """Movers-only epoch relayout — the fast replacement for layout_build.

    A full argsort relayout of the padded store measured 139 ms at 316k
    slots on v5e (XLA sort); but between epochs only a few % of atoms change
    cell.  So: find movers (current cell != slot cell), place each directly
    into a free rank of its current cell — movers are ordered within their
    target cell (small argsort over m_max) and the j-th mover of a cell
    takes the cell column's j-th free rank (one rank-axis prefix sum over
    the free mask + one [M, cap] gather; no claim/verify rounds) — copy
    their fields over, free the old slots, and reset the epoch reference
    positions.  Atoms that cannot be placed (cell at capacity, or more
    movers than m_max) stay in their old slot — stale by one cell, counted
    in PadAux.overflow so a mis-sized capacity is loud, never silent.

    has_mol/has_charge/has_types: scatter/gather ops here have a large
    per-op cost at production sizes regardless of row count, so fields
    that are globally CONSTANT for the scene (q == 0, mol/lambdaF/cms/rep
    == 0, type == 0, bonds == -1) skip their row-moves entirely — a
    mover's value at the new slot already equals the old one.  Callers
    derive the flags from the scene config (engine_cellpad.relayout_flags)."""
    n_slots = geom.n_slots
    cap, lanes = geom.cap, geom.lanes
    if m_max <= 0:
        m_max = max(2048, n_slots // 32)
    aux: PadAux = state.nbrs
    sc = jnp.asarray(slot_cells(geom))
    cur = geom.cell_of(state.x)
    mover = state.alive & (cur != sc)
    n_mov = jnp.sum(mover.astype(jnp.int32))
    midx = compact_indices(mover, m_max, n_slots)
    act = midx < n_slots
    missed = n_mov - jnp.sum(act.astype(jnp.int32))

    safe = jnp.clip(midx, 0, n_slots - 1)
    pos = state.x[safe]

    # target cell of each mover; same-cell movers get ordinals 0,1,2,...
    n_cells = geom.n_cells
    cell = jnp.where(act, cur[safe], n_cells)
    order = jnp.argsort(cell)
    cell_s = cell[order]
    first = jnp.searchsorted(cell_s, cell_s, side="left")
    ordinal_s = jnp.arange(m_max, dtype=jnp.int32) - first.astype(jnp.int32)
    ordinal = jnp.zeros((m_max,), jnp.int32).at[order].set(ordinal_s)

    # j-th free rank of each cell column via a prefix sum over the rank
    # axis.  One gather: `free at rank r` is recoverable from the cumsum
    # (cumfree[r] > cumfree[r-1]); with ordinal+1 matching, the hit rank is
    # exactly where cumfree first reaches ordinal+1 AND the slot is free.
    free = ~state.alive
    cumfree = jnp.cumsum(
        free.reshape(geom.n_blocks, cap, lanes).astype(jnp.int32),
        axis=1).reshape(-1)
    block, lane = geom.slot_of_cell(jnp.clip(cell, 0, n_cells - 1))
    col0 = (block * cap) * lanes + lane
    # placement considers only the FILING ranks (rows fcap..cap-1 are
    # dead storage padding, never filed)
    col_slots = col0[:, None] + (jnp.arange(geom.fcap, dtype=jnp.int32)
                                 * lanes)[None, :]
    cf = cumfree[col_slots]                               # [M, fcap]
    cf_prev = jnp.concatenate(
        [jnp.zeros((m_max, 1), jnp.int32), cf[:, :-1]], axis=1)
    hit = (cf > cf_prev) & (cf == (ordinal + 1)[:, None])
    landed = act & jnp.any(hit, axis=1)
    r = jnp.argmax(hit, axis=1).astype(jnp.int32)
    slot = jnp.where(landed, col0 + r * lanes, n_slots)
    old = jnp.where(landed, midx, n_slots)
    unplaced = jnp.sum((act & ~landed).astype(jnp.int32))

    # ---- row moves: ONE scatter per field with the move and the
    # old-slot clear merged (indices [slot; old], values [rows; fill]) —
    # scatter cost at this size is per-op, not per-row, and the [n, 17]
    # packed intermediate of the previous version forced pack/unpack
    # passes over lane-padded layouts that cost more than they saved ----
    center = jnp.asarray([(l + h) * 0.5 for l, h in zip(box.lo, box.hi)],
                         state.x.dtype)
    dst = jnp.concatenate([slot, old])                    # [2M]

    def move(arr, fill):
        rows = arr[safe]
        fill_rows = jnp.broadcast_to(jnp.asarray(fill, arr.dtype),
                                     rows.shape)
        return scatter_rows(arr, dst, jnp.concatenate([rows, fill_rows]))

    x = move(state.x, center)
    alive = state.alive.at[dst].set(
        jnp.concatenate([jnp.ones((m_max,), bool),
                         jnp.zeros((m_max,), bool)]), mode="drop")

    upd = dict(x=x, v=move(state.v, 0.0), alive=alive,
               tag=move(state.tag, -1))
    if move_f:
        upd["f"] = move(state.f, 0.0)
    # move_f=False: the caller guarantees f is dead here (consumed by the
    # first half-kick, recomputed before its next read) — see
    # engine_cellpad._plain_step(relayout=True).
    if has_bonds:
        # bond partner SLOT references of every atom follow the moves
        moved_map = jnp.arange(n_slots, dtype=jnp.int32).at[old].set(
            jnp.where(landed, slot, 0), mode="drop")

        def remap(bond):
            return jnp.where(bond >= 0,
                             moved_map[jnp.clip(bond, 0, n_slots - 1)], -1)

        upd["bond1"] = remap(move(state.bond1, -1))
        upd["bond2"] = remap(move(state.bond2, -1))
        if state.bond3 is not None:
            upd["bond3"] = remap(move(state.bond3, -1))
        if state.bond4 is not None:
            upd["bond4"] = remap(move(state.bond4, -1))
        if state.impr is not None:
            upd["impr"] = remap(move(state.impr, -1))
    if has_charge:
        upd["q"] = move(state.q, 0.0)
    if has_mol:
        upd.update(lambdaF=move(state.lambdaF, 0.0),
                   cms_mol=move(state.cms_mol, 0.0),
                   vcms_mol=move(state.vcms_mol, 0.0),
                   mol=move(state.mol, 0),
                   rep_atom=move(state.rep_atom, 0))
    if has_types:
        upd["type"] = move(state.type, 0)

    new = state.replace(**upd)
    return new.replace(nbrs=aux.replace(
        xref=new.x, force_rebuild=jnp.zeros((), bool),
        rebuilds=aux.rebuilds + 1,
        overflow=aux.overflow + missed + unplaced,
        **kernel_caches(geom, new.tag, new.alive)))


def maybe_rebuild(geom: PadGeometry, box: Box, skin: float,
                  state: State, has_bonds: bool = True,
                  **field_flags) -> State:
    """Half-skin displacement trigger (neighbor.cpp:2342 analogue).  The
    taken branch is the cheap incremental relayout, so the data-dependent
    cond no longer hides a 139-ms argsort behind itself."""
    aux: PadAux = state.nbrs
    if skin <= 0.0:
        return relayout_incremental(geom, box, state, has_bonds=has_bonds,
                                    **field_flags)
    d = box.min_image(state.x - aux.xref)
    disp2 = jnp.where(state.alive, jnp.sum(d * d, axis=-1), 0.0)
    trip = jnp.max(disp2) > (0.5 * skin) ** 2
    need = trip | aux.force_rebuild
    return jax.lax.cond(need,
                        lambda s: relayout_incremental(
                            geom, box, s, has_bonds=has_bonds,
                            **field_flags),
                        lambda s: s, state)


def place_insertions(geom: PadGeometry, state: State, pos, accepted):
    """Claim a free rank in each accepted candidate's cell.

    pos: [M,3]; accepted: [M].  Returns (slot [M] with n_slots = failed,
    landed mask).  Same-cell candidates are ordered by a small argsort and
    the j-th candidate of a cell takes the cell column's j-th free rank
    (one rank-axis prefix sum over the free mask + one [M, cap] gather) —
    the relayout_incremental placement scheme: exact for any M, no
    scatter-verify rounds (a round-based loop paid ~17us launch overhead
    per round).  Cap-full cells fail the insertion (counted by caller)."""
    n_slots = geom.n_slots
    cap = geom.cap
    lanes = geom.lanes
    m = pos.shape[0]
    n_cells = geom.n_cells

    cell = jnp.where(accepted, geom.cell_of(pos), n_cells)
    order = jnp.argsort(cell)
    cell_s = cell[order]
    first = jnp.searchsorted(cell_s, cell_s, side="left")
    ordinal_s = jnp.arange(m, dtype=jnp.int32) - first.astype(jnp.int32)
    ordinal = jnp.zeros((m,), jnp.int32).at[order].set(ordinal_s)

    free = ~state.alive
    cumfree = jnp.cumsum(
        free.reshape(geom.n_blocks, cap, lanes).astype(jnp.int32),
        axis=1).reshape(-1)
    block, lane = geom.slot_of_cell(jnp.clip(cell, 0, n_cells - 1))
    col0 = (block * cap) * lanes + lane          # rank-0 slot of the cell
    col_slots = col0[:, None] + (jnp.arange(geom.fcap, dtype=jnp.int32)
                                 * lanes)[None, :]
    hit = free[col_slots] & (cumfree[col_slots] == (ordinal + 1)[:, None])
    landed = accepted & jnp.any(hit, axis=1)
    r = jnp.argmax(hit, axis=1).astype(jnp.int32)
    slot = jnp.where(landed, col0 + r * lanes, n_slots)
    return slot, landed


def slab_slice_bounds(geom: PadGeometry, box: Box, x_lo: float, x_hi: float):
    """Static slot range [a, b) covering every cell whose x-extent
    intersects [x_lo, x_hi] — buffer subsets as contiguous slices."""
    csx = geom.cell_size[0]
    nx = geom.dims[0]
    lo_slab = int(np.clip(np.floor((x_lo - geom.lo[0]) / csx), 0, nx - 1))
    hi_slab = int(np.clip(np.floor((x_hi - geom.lo[0]) / csx), 0, nx - 1))
    b0 = lo_slab // geom.p
    b1 = hi_slab // geom.p
    a = b0 * geom.cap * geom.lanes
    b = (b1 + 1) * geom.cap * geom.lanes
    return a, b
