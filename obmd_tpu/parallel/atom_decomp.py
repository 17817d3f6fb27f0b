"""Multi-chip SPMD step: atom decomposition over a 1-D device mesh.

The TPU-native replacement for the reference's MPI machinery (SURVEY.md
§2.4/§2.5): instead of translating CommBrick's exchange/borders/forward/
reverse point-to-point calls, the state is sharded by particle *slot* across
the mesh and each step does

  * one `all_gather` of (x, v, type, tag, alive[, q]) over ICI — the
    forward_comm analogue (positions+velocities, comm.cpp:192,201),
  * replicated cell-table construction (cheap vs. force work),
  * per-device force evaluation for owned slots only (full-neighbor, so no
    reverse_comm analogue is needed),
  * `psum` for every global scalar the reference computes with
    MPI_Allreduce (deletion tallies, buffer census, weight normalizations,
    fix_obmd_merged.cpp:604-605,677-678,1305).

Atom decomposition (Plimpton, J. Comp. Phys. 117, 1 (1995)) is exact at any
particle count and keeps every collective on ICI; the spatial x-slab
decomposition with ppermute halos (SURVEY.md §2.4) is the planned scale-out
for boxes too large to replicate, and slots in behind the same API.

OBMD insertion is rank-collective by construction in the reference (same-
seeded RanPark on every rank, fix_obmd_merged.cpp:275): here every device
draws identical candidates (replicated PRNG key), runs the identical USHER
search on replicated gathered state, and accepted candidate j is written by
the device that owns free slot rank j — deterministic, no communication.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import rng
from ..cells import GridSpec, build_cells
from ..config import SceneConfig, eval_param
from ..forces.gathered import forces_for_subset
from ..integrate import PURPOSE_PAIR_NOISE, make_grid_spec
from ..obmd.stage import (_sequential_accept, _usher_search, _near_check,
                          feedback_count, smooth_weight)
from ..state import State

AXIS = "atoms"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devs), (AXIS,))


def shard_state(state: State, mesh: Mesh) -> State:
    """Place per-atom leaves sharded on axis 0, scalars replicated."""
    def put(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and \
                leaf.shape[0] == state.capacity:
            return jax.device_put(leaf, NamedSharding(mesh, P(AXIS)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, state)


def make_sharded_step(cfg: SceneConfig, mesh: Mesh):
    """Jitted sharded step(state) -> state with the same semantics as
    integrate.make_step (validated against it in tests)."""
    cfg = cfg.finalize()
    spec = make_grid_spec(cfg)
    dt = float(cfg.dt)
    obmd = cfg.obmd
    n_max = cfg.capacity.n_max
    ndev = mesh.devices.size
    if n_max % ndev != 0:
        raise ValueError(f"n_max={n_max} must divide the mesh size {ndev}")
    n_loc = n_max // ndev

    masses = tuple(cfg.masses)

    def local_mass(types, dtype):
        return jnp.asarray(masses, dtype=dtype)[types]

    def spmd_step(state: State) -> State:
        """Body run under shard_map: per-atom leaves are local shards."""
        dtype = state.x.dtype.type
        me = jax.lax.axis_index(AXIS)
        my_slot0 = me.astype(jnp.int32) * n_loc

        m = local_mass(state.type, state.x.dtype)[:, None]
        alive3 = state.alive[:, None]
        dtf = dtype(0.5 * dt)

        # ---- initial integrate (local) ----
        v = jnp.where(alive3, state.v + dtf * state.f / m, state.v)
        x = jnp.where(alive3, state.x + dtype(dt) * v, state.x)
        state = state.replace(x=x, v=v)

        # ---- OBMD pre-exchange ----
        if obmd is not None:
            state = _pre_exchange_spmd(cfg, spec, state, my_slot0)

        # ---- wrap ----
        state = state.replace(x=cfg.box.wrap(state.x))

        # ---- gather + cells + forces ----
        full_x = jax.lax.all_gather(state.x, AXIS, tiled=True)
        full_v = jax.lax.all_gather(state.v, AXIS, tiled=True)
        full_t = jax.lax.all_gather(state.type, AXIS, tiled=True)
        full_g = jax.lax.all_gather(state.tag, AXIS, tiled=True)
        full_a = jax.lax.all_gather(state.alive, AXIS, tiled=True)
        full_q = jax.lax.all_gather(state.q, AXIS, tiled=True)

        ctab = build_cells(spec, full_x, full_a)
        seed = getattr(cfg.pair, "seed", 0)
        salt = rng.step_salt(seed, state.step, PURPOSE_PAIR_NOISE)
        my_slot = my_slot0 + jnp.arange(n_loc, dtype=jnp.int32)
        f, _pe = forces_for_subset(
            cfg.pair, cfg.box, spec, ctab, full_x, full_v, full_t, full_g,
            full_q, my_slot, state.x, state.v, state.type, state.tag,
            state.q, salt, dt=dt)

        if obmd is not None:
            f = _boundary_force_spmd(cfg, state, f)

        f = jnp.where(state.alive[:, None], f, 0.0)

        # ---- final integrate (local) ----
        m = local_mass(state.type, state.x.dtype)[:, None]
        v = jnp.where(state.alive[:, None], state.v + dtf * f / m, state.v)

        return state.replace(v=v, f=f, step=state.step + 1,
                             cell_overflow=state.cell_overflow + ctab.overflow)

    # shard_map spec: per-atom leaves split on axis 0, the rest replicated.
    def leaf_spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and \
                leaf.shape[0] == n_max:
            return P(AXIS)
        return P()

    def specs_of(state: State):
        return jax.tree_util.tree_map(leaf_spec, state)

    def step(state: State) -> State:
        sp = specs_of(state)
        fn = jax.shard_map(spmd_step, mesh=mesh, in_specs=(sp,), out_specs=sp,
                           check_vma=False)
        return fn(state)

    return jax.jit(step)


def _pre_exchange_spmd(cfg: SceneConfig, spec: GridSpec, state: State,
                       my_slot0):
    """SPMD version of obmd.stage.pre_exchange: local masks + psum tallies;
    insertion replicated with ownership by free-slot rank."""
    obmd = cfg.obmd
    box = cfg.box
    dtype = state.x.dtype.type
    dt = dtype(cfg.dt)
    t = state.sim_time
    n_loc = state.x.shape[0]

    pxx = eval_param(obmd.pxx, t)
    pxy = eval_param(obmd.pxy, t)
    pxz = eval_param(obmd.pxz, t)
    dpxx = eval_param(obmd.dpxx, t)
    freq = eval_param(obmd.freq, t)
    alpha = eval_param(obmd.alpha, t)
    tau = eval_param(obmd.tau, t)
    nbuf = eval_param(obmd.nbuf, t)

    # deletion (local) + psum tallies
    x0 = state.x[:, 0]
    doomed = state.alive & ((x0 < box.lo[0]) | (x0 > box.hi[0]))
    mid = 0.5 * (box.lo[0] + box.hi[0])
    left = doomed & (x0 < mid)
    m = jnp.asarray(cfg.masses, state.x.dtype)[state.type]
    mv = m[:, None] * state.v
    vnewl = jax.lax.psum(jnp.sum(jnp.where(left[:, None], mv, 0.0), axis=0), AXIS)
    vnewr = jax.lax.psum(
        jnp.sum(jnp.where((doomed & ~left)[:, None], mv, 0.0), axis=0), AXIS)
    ndel = jax.lax.psum(jnp.sum(doomed.astype(jnp.int32)), AXIS)
    state = state.replace(alive=state.alive & ~doomed,
                          tag=jnp.where(doomed, -1, state.tag),
                          obmd=state.obmd.replace(
                              ndeleted=state.obmd.ndeleted + ndel))

    # census (psum) + feedback law
    def pcount(region):
        local = jnp.sum((state.alive & region.match(state.x)).astype(jnp.int32))
        return jax.lax.psum(local, AXIS)

    nins_l = feedback_count(pcount(obmd.region1), obmd.mol_len, alpha, nbuf,
                            dt, tau)
    nins_r = feedback_count(pcount(obmd.region2), obmd.mol_len, alpha, nbuf,
                            dt, tau)

    # insertion: replicated candidate evaluation on gathered state
    K = obmd.insert_kmax
    full_x = jax.lax.all_gather(state.x, AXIS, tiled=True)
    full_t = jax.lax.all_gather(state.type, AXIS, tiled=True)
    full_a = jax.lax.all_gather(state.alive, AXIS, tiled=True)
    full_q = jax.lax.all_gather(state.q, AXIS, tiled=True)
    ctab = build_cells(spec, full_x, full_a)

    gathered = state.replace(x=full_x, type=full_t, alive=full_a, q=full_q)

    key = rng.fold_key(state.key, state.step)
    kl, kr, knext = jax.random.split(key, 3)

    def one_side(k_key, region, budget):
        u = jax.random.uniform(k_key, (K, 3), dtype=state.x.dtype)
        cand = region.sample_uniform(u)
        ctype = jnp.full((K,), obmd.ntype, jnp.int32)
        if obmd.usher is not None:
            pos, ok, iters, _E = _usher_search(cfg, spec, ctab, gathered,
                                               cand, ctype, region)
        else:
            ok, _E = _near_check(cfg, spec, ctab, gathered, cand, ctype)
            pos, iters = cand, jnp.zeros((K,), jnp.int32)
        budget = jnp.clip(budget, 0, K)
        accepted, count = _sequential_accept(cfg, pos, ctype, ok, budget)
        return pos, accepted, count, iters

    pos_l, acc_l, cnt_l, it_l = one_side(kl, obmd.region5, nins_l)
    pos_r, acc_r, cnt_r, it_r = one_side(kr, obmd.region6, nins_r)
    pos = jnp.concatenate([pos_l, pos_r], axis=0)
    accepted = jnp.concatenate([acc_l, acc_r], axis=0)

    # ownership: accepted candidate with global free-slot rank r goes to the
    # device owning that free slot.  Each device computes the number of free
    # slots on lower-indexed devices (exclusive scan via psum trick).
    me = jax.lax.axis_index(AXIS)
    my_free = jnp.nonzero(~state.alive, size=2 * K, fill_value=n_loc)[0]
    my_nfree = jnp.sum((~state.alive).astype(jnp.int32))
    # exclusive prefix: sum over devices with index < me
    ndev = jax.lax.psum(jnp.ones((), jnp.int32), AXIS)
    all_nfree = jax.lax.all_gather(my_nfree, AXIS)          # [ndev]
    idx = jnp.arange(all_nfree.shape[0])
    before = jnp.sum(jnp.where(idx < me, all_nfree, 0))

    order = jnp.cumsum(accepted.astype(jnp.int32)) - 1      # global rank
    mine = accepted & (order >= before) & (order < before + jnp.minimum(my_nfree, 2 * K))
    local_rank = jnp.clip(order - before, 0, 2 * K - 1)
    slot = jnp.where(mine, my_free[local_rank], n_loc)

    n_acc_total = jax.lax.psum(jnp.sum(mine.astype(jnp.int32)), AXIS)
    new_tag = state.maxtag + 1 + order.astype(jnp.int32)

    dtype_arr = state.x.dtype
    x = state.x.at[slot].set(pos, mode="drop")
    v = state.v.at[slot].set(jnp.zeros((2 * K, 3), dtype_arr), mode="drop")
    f = state.f.at[slot].set(jnp.zeros((2 * K, 3), dtype_arr), mode="drop")
    typ = state.type.at[slot].set(jnp.full((2 * K,), obmd.ntype, jnp.int32),
                                  mode="drop")
    tag = state.tag.at[slot].set(new_tag, mode="drop")
    qn = state.q.at[slot].set(jnp.zeros((2 * K,), dtype_arr), mode="drop")
    nb1 = state.bond1.at[slot].set(jnp.full((2 * K,), -1, jnp.int32),
                                   mode="drop")
    nb2 = state.bond2.at[slot].set(jnp.full((2 * K,), -1, jnp.int32),
                                   mode="drop")
    alive = state.alive.at[slot].set(True, mode="drop")
    extra_cols = {}
    if state.bond3 is not None:
        none_col = jnp.full((2 * K,), -1, jnp.int32)
        extra_cols["bond3"] = state.bond3.at[slot].set(none_col, mode="drop")
        extra_cols["bond4"] = state.bond4.at[slot].set(none_col, mode="drop")
    if state.impr is not None:
        extra_cols["impr"] = state.impr.at[slot].set(
            jnp.full((2 * K, 3), -1, jnp.int32), mode="drop")

    want = jnp.clip(nins_l, 0) + jnp.clip(nins_r, 0)
    state = state.replace(
        x=x, v=v, f=f, type=typ, tag=tag, q=qn, alive=alive,
        bond1=nb1, bond2=nb2, **extra_cols,
        maxtag=state.maxtag + n_acc_total, key=knext,
        obmd=state.obmd.replace(
            ninserted=state.obmd.ninserted + n_acc_total,
            insert_fail=state.obmd.insert_fail +
            jnp.maximum(want - n_acc_total, 0),
            usher_iters=state.obmd.usher_iters + jnp.sum(it_l) + jnp.sum(it_r)))

    # setpoint forces
    area = dtype(box.cross_area)
    sim_time = t + dt
    factor = pxx + dpxx * jnp.sin(2.0 * jnp.pi * freq * sim_time)
    mfl = jnp.stack([vnewl[0] / dt + factor * area, vnewl[1] / dt, vnewl[2] / dt])
    mfr = jnp.stack([vnewr[0] / dt - pxx * area, vnewr[1] / dt, vnewr[2] / dt])
    sfl = jnp.stack([dtype(0.0) * area, pxy * area, pxz * area])
    return state.replace(
        sim_time=sim_time,
        obmd=state.obmd.replace(
            momentum_force_left=mfl.astype(dtype_arr),
            momentum_force_right=mfr.astype(dtype_arr),
            shear_force_left=sfl.astype(dtype_arr),
            shear_force_right=(-sfl).astype(dtype_arr)))


def _boundary_force_spmd(cfg: SceneConfig, state: State, f: jnp.ndarray):
    """Boundary-force distribution with psum'd weight normalization
    (the MPI_Allreduce at fix_obmd_merged.cpp:1305/1378)."""
    obmd = cfg.obmd
    m = jnp.asarray(cfg.masses, state.x.dtype)[state.type]
    x0 = state.x[:, 0]
    sc = state.obmd

    def add(f, region, F, smooth):
        if region is None:   # zero-extent shear sub-region
            return f
        member = state.alive & region.match(state.x)
        g = smooth_weight(cfg, x0, m) if smooth else m
        g = jnp.where(member, g, 0.0)
        gsum = jax.lax.psum(jnp.sum(g), AXIS)
        scale = jnp.where(gsum > 0.0, g / jnp.maximum(gsum, 1e-30), 0.0)
        return f + scale[:, None] * F[None, :]

    f = add(f, obmd.region1, sc.momentum_force_left, smooth=True)
    f = add(f, obmd.region2, sc.momentum_force_right, smooth=True)
    f = add(f, obmd.region3, sc.shear_force_left, smooth=False)
    f = add(f, obmd.region4, sc.shear_force_right, smooth=False)
    return f
