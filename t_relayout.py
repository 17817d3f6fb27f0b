import time
import jax, jax.numpy as jnp, numpy as np
from obmd_tpu import scenes
from obmd_tpu.integrate import setup, equilibrate
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cellpad import slot_cells

sc = scenes.obmd_dpd_scene(scale=8, seed=7)
cfg = sc.cfg
geom = ec.make_geometry(cfg)
state = setup(cfg, sc.state)
state = equilibrate(cfg, state, 100)
jax.block_until_ready(state.x)
n_slots = geom.n_slots
cap, lanes = geom.cap, geom.lanes
m_max = max(2048, n_slots // 32)
sc_arr = jnp.asarray(slot_cells(geom))

def timeit(name, fn, iters=30):
    @jax.jit
    def loop(s):
        def body(acc, _):
            out = fn(s.replace(x=s.x + acc))
            leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, 'dtype')]
            tot = sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)
            return tot * 1e-38, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return acc
    o = loop(state); jax.block_until_ready(o)
    t0 = time.perf_counter(); o = loop(state); jax.block_until_ready(o)
    print(f"{name:32s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)

def movers(s):
    cur = geom.cell_of(s.x)
    return s.alive & (cur != sc_arr)

timeit("mover mask", lambda s: movers(s))
timeit("+ nonzero", lambda s: jnp.nonzero(movers(s), size=m_max, fill_value=n_slots)[0])
def upto_ordinal(s):
    mover = movers(s)
    midx = jnp.nonzero(mover, size=m_max, fill_value=n_slots)[0].astype(jnp.int32)
    act = midx < n_slots
    safe = jnp.clip(midx, 0, n_slots - 1)
    cell = jnp.where(act, geom.cell_of(s.x)[safe], geom.n_cells)
    order = jnp.argsort(cell)
    return order
timeit("+ argsort ordinal", upto_ordinal)
def cumfree_part(s):
    free = ~s.alive
    return jnp.cumsum(free.reshape(geom.n_blocks, cap, lanes).astype(jnp.int32), axis=1).reshape(-1)
timeit("cumfree", cumfree_part)
def bondremap(s):
    moved_map = jnp.arange(n_slots, dtype=jnp.int32)
    return (jnp.where(s.bond1 >= 0, moved_map[jnp.clip(s.bond1, 0, n_slots-1)], -1),
            jnp.where(s.bond2 >= 0, moved_map[jnp.clip(s.bond2, 0, n_slots-1)], -1))
timeit("bond remap gathers", bondremap)
from obmd_tpu.cellpad import relayout_incremental
timeit("full relayout", lambda s: relayout_incremental(geom, cfg.box, s), iters=10)

from obmd_tpu.cellpad import PadAux
def relayout_stage(s, upto):
    geom_ = geom; box = cfg.box
    n_slots_ = geom_.n_slots
    m_max_ = max(2048, n_slots_ // 32)
    aux = s.nbrs
    sc_ = jnp.asarray(slot_cells(geom_))
    cur = geom_.cell_of(s.x)
    mover = s.alive & (cur != sc_)
    n_mov = jnp.sum(mover.astype(jnp.int32))
    midx = jnp.nonzero(mover, size=m_max_, fill_value=n_slots_)[0].astype(jnp.int32)
    if upto == 1: return midx
    act = midx < n_slots_
    missed = n_mov - jnp.sum(act.astype(jnp.int32))
    safe = jnp.clip(midx, 0, n_slots_ - 1)
    pos = s.x[safe]
    n_cells = geom_.n_cells
    cell = jnp.where(act, cur[safe], n_cells)
    order = jnp.argsort(cell)
    cell_s = cell[order]
    first = jnp.searchsorted(cell_s, cell_s, side="left")
    ordinal_s = jnp.arange(m_max_, dtype=jnp.int32) - first.astype(jnp.int32)
    ordinal = jnp.zeros((m_max_,), jnp.int32).at[order].set(ordinal_s)
    if upto == 2: return ordinal
    free = ~s.alive
    cumfree = jnp.cumsum(free.reshape(geom_.n_blocks, cap, lanes).astype(jnp.int32), axis=1).reshape(-1)
    block, lane = geom_.slot_of_cell(jnp.clip(cell, 0, n_cells - 1))
    col0 = (block * cap) * lanes + lane
    col_slots = col0[:, None] + (jnp.arange(cap, dtype=jnp.int32) * lanes)[None, :]
    hit = (free[col_slots] & (cumfree[col_slots] == (ordinal + 1)[:, None]))
    landed = act & jnp.any(hit, axis=1)
    r = jnp.argmax(hit, axis=1).astype(jnp.int32)
    slot = jnp.where(landed, col0 + r * lanes, n_slots_)
    old = jnp.where(landed, midx, n_slots_)
    if upto == 3: return slot
    def move(field, dead_val):
        val = field[safe]
        field = field.at[slot].set(val, mode="drop")
        fill = jnp.broadcast_to(jnp.asarray(dead_val, field.dtype), val.shape)
        return field.at[old].set(fill, mode="drop")
    x2 = move(s.x, 0.0)
    if upto == 4: return x2
    out = [move(s.v, 0.0), move(s.f, 0.0), move(s.type, 0), move(s.tag, -1),
           move(s.q, 0.0), move(s.mol, 0), move(s.lambdaF, 0.0),
           move(s.cms_mol, 0.0), move(s.vcms_mol, 0.0), move(s.rep_atom, 0)]
    if upto == 5: return (x2, *out)
    moved_map = jnp.arange(n_slots_, dtype=jnp.int32).at[old].set(jnp.where(landed, slot, 0), mode="drop")
    b1 = jnp.where(s.bond1 >= 0, moved_map[jnp.clip(s.bond1, 0, n_slots_ - 1)], -1)
    b2 = jnp.where(s.bond2 >= 0, moved_map[jnp.clip(s.bond2, 0, n_slots_ - 1)], -1)
    return (x2, b1, b2, *out)

for u in (1, 2, 3, 4, 5, 6):
    timeit(f"relayout upto {u}", lambda s, uu=u: relayout_stage(s, uu), iters=10)
