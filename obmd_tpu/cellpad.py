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
    ok = (sc < n_cells) & (rank < cap)
    overflow = jnp.sum(((sc < n_cells) & (rank >= cap)).astype(jnp.int32))
    dest = jnp.where(ok, slot_index(geom, sc, rank), n_slots)

    center = jnp.asarray([(l + h) * 0.5 for l, h in zip(box.lo, box.hi)],
                         state.x.dtype)

    def scat(src, fill):
        out = jnp.full((n_slots,) + src.shape[1:], fill, src.dtype)
        return out.at[dest].set(src[order], mode="drop")

    x = jnp.broadcast_to(center, (n_slots, 3)).astype(state.x.dtype)
    x = x.at[dest].set(state.x[order], mode="drop")
    new = State(
        x=x,
        v=scat(state.v, 0), f=scat(state.f, 0),
        type=scat(state.type, 0), tag=scat(state.tag, -1),
        alive=jnp.zeros((n_slots,), bool).at[dest].set(
            state.alive[order], mode="drop"),
        q=scat(state.q, 0), mol=scat(state.mol, 0),
        bond1=scat(state.bond1, -1), bond2=scat(state.bond2, -1),
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
                           else overflow))
    return new.replace(nbrs=aux)


def maybe_rebuild(geom: PadGeometry, box: Box, skin: float,
                  state: State) -> State:
    """Half-skin displacement trigger (neighbor.cpp:2342 analogue)."""
    aux: PadAux = state.nbrs
    if skin <= 0.0:
        return layout_build(geom, box, state)
    d = box.min_image(state.x - aux.xref)
    disp2 = jnp.where(state.alive, jnp.sum(d * d, axis=-1), 0.0)
    trip = jnp.max(disp2) > (0.5 * skin) ** 2
    need = trip | aux.force_rebuild
    return jax.lax.cond(need,
                        lambda s: layout_build(geom, box, s),
                        lambda s: s, state)


def place_insertions(geom: PadGeometry, state: State, pos, accepted,
                     rounds: int = 4):
    """Claim a free rank in each accepted candidate's cell.

    pos: [M,3]; accepted: [M].  Returns (slot [M] with n_slots = failed,
    landed mask).  Conflicts between same-cell candidates are resolved with
    scatter-verify rounds; cap-full cells fail the insertion (counted by the
    caller)."""
    n_slots = geom.n_slots
    cap = geom.cap
    lanes = geom.lanes
    m = pos.shape[0]

    cell = geom.cell_of(pos)
    block, lane = geom.slot_of_cell(cell)
    col0 = (block * cap) * lanes + lane          # rank-0 slot of the cell
    ranks = jnp.arange(cap, dtype=jnp.int32)[None, :] * lanes  # stride
    col_slots = col0[:, None] + ranks            # [M, cap] slot ids

    alive = state.alive
    taken = jnp.concatenate([alive, jnp.ones((1,), bool)])  # guard

    placed = ~accepted
    rank_try = jnp.zeros((m,), jnp.int32)
    slot = jnp.full((m,), n_slots, jnp.int32)
    marker = jnp.full((n_slots + 1,), -1, jnp.int32)

    def body(carry, _):
        taken, marker, placed, rank_try, slot = carry
        occ = taken[col_slots]                   # [M, cap]
        cols = jnp.arange(cap, dtype=jnp.int32)[None, :]
        free_ok = ~occ & (cols >= rank_try[:, None])
        has = jnp.any(free_ok, axis=1)
        r = jnp.argmax(free_ok, axis=1).astype(jnp.int32)
        cand_slot = jnp.take_along_axis(col_slots, r[:, None], axis=1)[:, 0]
        attempt = ~placed & has
        tgt = jnp.where(attempt, cand_slot, n_slots)
        me = jnp.arange(m, dtype=jnp.int32)
        marker = marker.at[tgt].set(me, mode="drop")
        won = attempt & (marker[jnp.clip(tgt, 0, n_slots)] == me) & \
            (tgt < n_slots)
        slot = jnp.where(won, tgt, slot)
        taken = taken.at[jnp.where(won, tgt, n_slots)].set(True, mode="drop")
        placed = placed | won
        rank_try = jnp.where(attempt & ~won, r + 1, rank_try)
        return (taken, marker, placed, rank_try, slot), None

    (taken, marker, placed, rank_try, slot), _ = jax.lax.scan(
        body, (taken, marker, placed, rank_try, slot), None, length=rounds)
    landed = accepted & (slot < n_slots)
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
