"""Bisect relayout_incremental (current field-skip version) at the
production cap=16 layout: cumulative-prefix timings of its phases, each
jitted separately on realistic equilibrated state."""
import dataclasses
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
from obmd_tpu.cellpad import compact_indices, layout_build, slot_cells


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cap = int(os.environ.get("BENCH_CAP", "16"))
    sc = scenes.obmd_dpd_scene(scale=float(os.environ.get("BENCH_SCALE", "8")),
                               seed=7)
    cfg0 = sc.cfg.finalize()
    state = setup(cfg0, sc.state)
    state = equilibrate(cfg0, state, 1500)
    np.asarray(state.x)
    cfg = dataclasses.replace(
        cfg0, capacity=dataclasses.replace(cfg0.capacity,
                                           cell_capacity=cap)).finalize()
    geom = ec.make_geometry(cfg)
    state = jax.jit(lambda s: layout_build(geom, cfg.box, s))(state)
    box = cfg.box
    n_slots = geom.n_slots
    capg, lanes = geom.cap, geom.lanes
    m_max = max(2048, n_slots // 32)
    n_cells = geom.n_cells
    sc_arr = jnp.asarray(slot_cells(geom))
    print(f"cap={cap} n_slots={n_slots} m_max={m_max}")

    @jax.jit
    def p1(s):
        cur = geom.cell_of(s.x)
        mover = s.alive & (cur != sc_arr)
        return compact_indices(mover, m_max, n_slots)

    def place(s):
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
        free = ~s.alive
        cumfree = jnp.cumsum(
            free.reshape(geom.n_blocks, capg, lanes).astype(jnp.int32),
            axis=1).reshape(-1)
        block, lane = geom.slot_of_cell(jnp.clip(cell, 0, n_cells - 1))
        col0 = (block * capg) * lanes + lane
        col_slots = col0[:, None] + (jnp.arange(capg, dtype=jnp.int32)
                                     * lanes)[None, :]
        cf = cumfree[col_slots]
        cf_prev = jnp.concatenate(
            [jnp.zeros((m_max, 1), jnp.int32), cf[:, :-1]], axis=1)
        hit = (cf > cf_prev) & (cf == (ordinal + 1)[:, None])
        landed = act & jnp.any(hit, axis=1)
        r = jnp.argmax(hit, axis=1).astype(jnp.int32)
        slot = jnp.where(landed, col0 + r * lanes, n_slots)
        old = jnp.where(landed, midx, n_slots)
        return slot, old, safe

    p3 = jax.jit(place)

    def upto(s, n_fields):
        slot, old, safe = place(s)
        center = jnp.asarray([(l + h) * 0.5 for l, h in zip(box.lo, box.hi)],
                             s.x.dtype)
        dst = jnp.concatenate([slot, old])

        def move(arr, fill):
            rows = arr[safe]
            fill_rows = jnp.broadcast_to(jnp.asarray(fill, arr.dtype),
                                         rows.shape)
            return arr.at[dst].set(jnp.concatenate([rows, fill_rows]),
                                   mode="drop")

        outs = []
        fields = [(s.x, center), (s.v, 0.0), (s.f, 0.0), (s.tag, -1)]
        for arr, fill in fields[:n_fields]:
            outs.append(move(arr, fill))
        alive = s.alive.at[dst].set(
            jnp.concatenate([jnp.ones((m_max,), bool),
                             jnp.zeros((m_max,), bool)]), mode="drop")
        outs.append(alive)
        return tuple(outs)

    p4 = jax.jit(lambda s: upto(s, 1))
    p5 = jax.jit(lambda s: upto(s, 2))
    p6 = jax.jit(lambda s: upto(s, 3))
    p7 = jax.jit(lambda s: upto(s, 4))

    from obmd_tpu.cellpad import relayout_incremental
    flags = ec.relayout_flags(cfg)
    full = jax.jit(lambda s: relayout_incremental(geom, box, s, **flags))

    print("p1 movers+compact     %.3f ms" % timeit(p1, state))
    print("p3 +placement         %.3f ms" % timeit(p3, state))
    print("p4 +x move (+alive)   %.3f ms" % timeit(p4, state))
    print("p5 +v move            %.3f ms" % timeit(p5, state))
    print("p6 +f move            %.3f ms" % timeit(p6, state))
    print("p7 +tag move          %.3f ms" % timeit(p7, state))
    print("full relayout         %.3f ms" % timeit(full, state))


if __name__ == "__main__":
    main()
