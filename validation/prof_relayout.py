"""Bisect relayout_incremental's 22 ms: cumulative-prefix timings of its
internal phases, each jitted separately on realistic state."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cellpad import compact_indices, slot_cells


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    sc = scenes.obmd_dpd_scene(scale=float(os.environ.get("BENCH_SCALE", "8")),
                               seed=7)
    cfg = sc.cfg.finalize()
    state = setup(cfg, sc.state)
    state = equilibrate(cfg, state, 1500)
    np.asarray(state.x)
    geom = ec.make_geometry(cfg)
    box = cfg.box
    n_slots = geom.n_slots
    cap, lanes = geom.cap, geom.lanes
    m_max = max(2048, n_slots // 32)
    n_cells = geom.n_cells
    sc_arr = jnp.asarray(slot_cells(geom))

    @jax.jit
    def p1(s):
        cur = geom.cell_of(s.x)
        mover = s.alive & (cur != sc_arr)
        midx = compact_indices(mover, m_max, n_slots)
        return midx

    @jax.jit
    def p2(s):
        midx = p1(s)
        act = midx < n_slots
        safe = jnp.clip(midx, 0, n_slots - 1)
        cur = geom.cell_of(s.x)
        cell = jnp.where(act, cur[safe], n_cells)
        order = jnp.argsort(cell)
        cell_s = cell[order]
        first = jnp.searchsorted(cell_s, cell_s, side="left")
        ordinal_s = jnp.arange(m_max, dtype=jnp.int32) - first.astype(jnp.int32)
        ordinal = jnp.zeros((m_max,), jnp.int32).at[order].set(ordinal_s)
        return ordinal

    @jax.jit
    def p3(s):
        ordinal = p2(s)
        midx = p1(s)
        act = midx < n_slots
        safe = jnp.clip(midx, 0, n_slots - 1)
        cur = geom.cell_of(s.x)
        cell = jnp.where(act, cur[safe], n_cells)
        free = ~s.alive
        cumfree = jnp.cumsum(
            free.reshape(geom.n_blocks, cap, lanes).astype(jnp.int32),
            axis=1).reshape(-1)
        block, lane = geom.slot_of_cell(jnp.clip(cell, 0, n_cells - 1))
        col0 = (block * cap) * lanes + lane
        col_slots = col0[:, None] + (jnp.arange(cap, dtype=jnp.int32)
                                     * lanes)[None, :]
        hit = (free[col_slots] & (cumfree[col_slots] == (ordinal + 1)[:, None]))
        landed = act & jnp.any(hit, axis=1)
        r = jnp.argmax(hit, axis=1).astype(jnp.int32)
        slot = jnp.where(landed, col0 + r * lanes, n_slots)
        return slot

    @jax.jit
    def p4(s):
        slot = p3(s)
        midx = p1(s)
        safe = jnp.clip(midx, 0, n_slots - 1)
        fcols = [s.x, s.v, s.f, s.q[:, None], s.lambdaF[:, None],
                 s.cms_mol, s.vcms_mol]
        fpack = jnp.concatenate(fcols, axis=1)
        frows = fpack[safe]
        fpack = fpack.at[slot].set(frows, mode="drop")
        return fpack

    def tail(s, upto):
        slot = p3(s)
        midx = p1(s)
        act = midx < n_slots
        safe = jnp.clip(midx, 0, n_slots - 1)
        landed = slot < n_slots
        old = jnp.where(landed, safe, n_slots)
        fcols = [s.x, s.v, s.f, s.q[:, None], s.lambdaF[:, None],
                 s.cms_mol, s.vcms_mol]
        fpack = jnp.concatenate(fcols, axis=1)
        frows = fpack[safe]
        fpack = fpack.at[slot].set(frows, mode="drop")
        ffill = jnp.zeros((17,), s.x.dtype)
        fpack = fpack.at[old].set(jnp.broadcast_to(ffill, frows.shape),
                                  mode="drop")
        if upto == "fclear":
            return fpack
        icols = [s.type[:, None], s.tag[:, None], s.mol[:, None],
                 s.rep_atom[:, None], s.bond1[:, None], s.bond2[:, None]]
        ipack = jnp.concatenate(icols, axis=1)
        irows = ipack[safe]
        ipack = ipack.at[slot].set(irows, mode="drop")
        ifill = jnp.asarray([0, -1, 0, 0, -1, -1], jnp.int32)
        ipack = ipack.at[old].set(jnp.broadcast_to(ifill, irows.shape),
                                  mode="drop")
        if upto == "ipack":
            return fpack, ipack
        alive = s.alive.at[slot].set(True, mode="drop")
        alive = alive.at[old].set(False, mode="drop")
        if upto == "alive":
            return fpack, ipack, alive
        new = s.replace(
            x=fpack[:, 0:3], v=fpack[:, 3:6], f=fpack[:, 6:9],
            q=fpack[:, 9], lambdaF=fpack[:, 10],
            cms_mol=fpack[:, 11:14], vcms_mol=fpack[:, 14:17],
            alive=alive,
            type=ipack[:, 0], tag=ipack[:, 1], mol=ipack[:, 2],
            rep_atom=ipack[:, 3], bond1=ipack[:, 4], bond2=ipack[:, 5])
        return new

    t_fclear = jax.jit(lambda s: tail(s, "fclear"))
    t_ipack = jax.jit(lambda s: tail(s, "ipack"))
    t_alive = jax.jit(lambda s: tail(s, "alive"))
    t_state = jax.jit(lambda s: tail(s, "state"))

    @jax.jit
    def full(s):
        from obmd_tpu.cellpad import relayout_incremental
        return relayout_incremental(geom, box, s, has_bonds=False)

    print("p1 movers+compact   %.3f ms" % timeit(p1, state))
    print("p2 +argsort/ordinal %.3f ms" % timeit(p2, state))
    print("p3 +placement       %.3f ms" % timeit(p3, state))
    print("p4 +float pack/scat %.3f ms" % timeit(p4, state))
    print("p5 +fpack clear     %.3f ms" % timeit(t_fclear, state))
    print("p6 +ipack both      %.3f ms" % timeit(t_ipack, state))
    print("p7 +alive           %.3f ms" % timeit(t_alive, state))
    print("p8 +state slices    %.3f ms" % timeit(t_state, state))
    print("full relayout       %.3f ms" % timeit(full, state))


if __name__ == "__main__":
    main()

# finer tail bisect: appended prefix stages (run with PROF_TAIL=1)
