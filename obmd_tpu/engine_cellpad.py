"""The cellpad engine: fused step over the padded cell-major layout with the
Pallas DPD force kernel.  Fast path for the flagship OBMD_DPD workload
(single-type DPD, open x).  Step order mirrors Verlet::run exactly like
integrate.make_step (SURVEY.md §3.2)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rng
from .cellpad import (PadAux, layout_build, maybe_rebuild, place_insertions,
                      slab_slice_bounds)
from .cells import BIG
from .config import DPDParams, LJCutParams, SceneConfig, eval_param
from .forces.pallas_dpd import PadGeometry, make_dpd_kernel
from .obmd.stage import (_sequential_accept, apply_boundary_force,
                         delete_outside, feedback_count, region_count)
from .obmd.subset import (Subset, expand_region, near_check_subset,
                          usher_search_subset)
from .state import State, per_atom_mass

PURPOSE_PAIR_NOISE = 1


def supports(cfg: SceneConfig) -> bool:
    """Single-type DPD or LJ.  Periodic x is supported only without the
    OBMD stage (open boundaries require open x by definition)."""
    if cfg.ntypes != 1:
        return False
    if not isinstance(cfg.pair, (DPDParams, LJCutParams)):
        return False
    if cfg.box.periodic[0] and cfg.obmd is not None:
        return False
    try:
        PadGeometry.create(cfg.box, cfg.pair.max_cut + cfg.skin,
                           cfg.capacity.cell_capacity)
    except (ValueError, NotImplementedError):
        return False
    return True


def make_geometry(cfg: SceneConfig) -> PadGeometry:
    return PadGeometry.create(cfg.box, cfg.pair.max_cut + cfg.skin,
                              cfg.capacity.cell_capacity)


def _make_kernel(cfg: SceneConfig, geom: PadGeometry):
    p = cfg.pair
    exb = cfg.bond is not None
    if isinstance(p, DPDParams):
        return make_dpd_kernel(geom, a0=p.a0[0][0], gamma=p.gamma[0][0],
                               sigma=p.sigma[0][0], cut=p.cut[0][0],
                               dt=cfg.dt, law="dpd", exclude_bonded=exb)
    return make_dpd_kernel(geom, cut=p.cut[0][0], dt=cfg.dt, law="lj",
                           lj_eps=p.epsilon[0][0], lj_sig=p.sigma[0][0],
                           exclude_bonded=exb)


def _forces(cfg, geom, kern, state: State):
    """Pair + boundary forces.  jax.named_scope phases mirror the reference
    Timer categories (verlet.cpp:257-350: PAIR / MODIFY) for profiler
    traces."""
    nb, cap, lanes = geom.n_blocks, geom.cap, geom.lanes
    a3 = state.alive[:, None]
    xm = jnp.where(a3, state.x, BIG).astype(jnp.float32)
    fld = jnp.concatenate([xm, state.v.astype(jnp.float32)], axis=1)  # [N,6]
    fld = fld.reshape(nb, cap, lanes, 6).transpose(0, 3, 1, 2)
    tag = state.tag.reshape(nb, cap, lanes)
    salt = rng.step_salt(getattr(cfg.pair, "seed", 0), state.step, PURPOSE_PAIR_NOISE)
    # per-block highest occupied rank + 1 (i-side loop bound in the kernel)
    rank = jnp.arange(cap, dtype=jnp.int32)[None, :, None]
    occ = jnp.max(jnp.where(state.alive.reshape(nb, cap, lanes), rank, -1),
                  axis=(1, 2)) + 1
    pbond = None
    if cfg.bond is not None:
        pbond = jnp.stack([state.bond1.reshape(nb, cap, lanes),
                           state.bond2.reshape(nb, cap, lanes)], axis=1)
    with jax.named_scope("pair"):
        fpad = kern(fld, tag, salt, occ, pbond)      # [nb, 3, cap, lanes]
    f = fpad.transpose(0, 2, 3, 1).reshape(-1, 3).astype(state.x.dtype)
    if cfg.obmd is not None:
        with jax.named_scope("obmd_post_force"):
            f = apply_boundary_force(cfg, state, f)
    if cfg.bond is not None:
        from .forces.bonded import fene_forces
        with jax.named_scope("bond"):
            fb, _ = fene_forces(cfg.bond, cfg.box, state.x, state.bond1,
                                state.bond2, state.tag, state.alive)
            f = f + fb
    if cfg.langevin is not None:
        from .forces.bonded import langevin_force
        f = f + langevin_force(cfg.langevin, cfg, state)
    return jnp.where(a3, f, 0.0)


def _subset_slice(cfg, geom, state, region, pad):
    """Buffer subset as a contiguous slot slice (no gather)."""
    a, b = slab_slice_bounds(geom, cfg.box, region.lo[0] - pad,
                             region.hi[0] + pad)
    exp = expand_region(region, pad)
    xs = jax.lax.slice_in_dim(state.x, a, b, axis=0)
    al = jax.lax.slice_in_dim(state.alive, a, b, axis=0)
    valid = al & exp.match(xs)
    n = b - a
    return Subset(
        idx=jnp.arange(a, b, dtype=jnp.int32),
        x=jnp.where(valid[:, None], xs, BIG),
        type=jax.lax.slice_in_dim(state.type, a, b, axis=0),
        q=jax.lax.slice_in_dim(state.q, a, b, axis=0),
        valid=valid,
        overflow=jnp.zeros((), bool))


def _insert_mol(cfg, geom, state: State, nins_l, nins_r, sub_l, sub_r):
    """Molecule-mode insertion (ref try_inserting MOLECULE branch): K
    template candidates per buffer with random rotations (ref :1012-1024),
    translation-USHER or near check over all template atoms, all-or-nothing
    placement (check_mol_proc analogue, ref :1098-1107), intra-molecule
    bonds wired into the per-slot partner tags."""
    import numpy as np
    from .obmd.subset import (mol_candidates, mol_sequential_accept,
                              near_check_subset_mol, random_rotations,
                              usher_search_subset_mol)
    obmd = cfg.obmd
    tpl = obmd.mol
    m = tpl.natoms
    dtype = state.dtype
    K = obmd.insert_kmax
    n_slots = geom.n_slots

    key = rng.fold_key(state.key, state.step)
    kl, krl, kr_, krr, knext = jax.random.split(key, 5)
    mol_types = (jnp.asarray(np.asarray(tpl.types), jnp.int32)
                 + jnp.int32(obmd.ntype))

    def one_side(k_key, k_rot, region, budget, sub):
        u = jax.random.uniform(k_key, (K, 3), dtype=dtype)
        centers = region.sample_uniform(u)
        rots = random_rotations(k_rot, K, dtype)
        coords = mol_candidates(tpl, centers, rots)       # [K, m, 3]
        if obmd.usher is not None:
            pos, ok, iters = usher_search_subset_mol(cfg, sub, coords,
                                                     mol_types, region)
        else:
            ok = near_check_subset_mol(cfg, sub, coords)
            pos, iters = coords, jnp.zeros((K,), jnp.int32)
        # all atoms must sit inside the box/region (check_mol_region)
        ok = ok & jnp.all(region.match(pos), axis=1)
        budget = jnp.clip(budget, 0, K)
        accepted, _ = mol_sequential_accept(cfg, pos, mol_types, ok, budget)
        return pos, accepted, iters

    pos_l, acc_l, it_l = one_side(kl, krl, obmd.region5, nins_l, sub_l)
    pos_r, acc_r, it_r = one_side(kr_, krr, obmd.region6, nins_r, sub_r)
    pos = jnp.concatenate([pos_l, pos_r])                 # [2K, m, 3]
    accepted = jnp.concatenate([acc_l, acc_r])            # [2K]

    km = 2 * K
    apos = pos.reshape(km * m, 3)
    a_acc = jnp.repeat(accepted, m)
    slot, landed = place_insertions(geom, state, apos, a_acc)
    landed_mol = jnp.all(landed.reshape(km, m), axis=1)
    act = jnp.repeat(landed_mol, m)
    slot = jnp.where(act, slot, n_slots)                  # atomic commit

    mol_rank = jnp.cumsum(landed_mol.astype(jnp.int32)) - 1
    tag_base = state.maxtag + mol_rank * m                # [2K]
    atom_idx = jnp.tile(jnp.arange(m, dtype=jnp.int32), (km,))
    new_tag = jnp.repeat(tag_base, m) + atom_idx + 1
    mol_id = jnp.repeat(tag_base + 1, m)                  # first atom's tag

    # intra-molecule bond partners from the static template graph
    pidx = np.full((m, 2), -1, np.int64)
    for a, b in tpl.bonds:
        for me, other in ((a, b), (b, a)):
            if pidx[me, 0] < 0:
                pidx[me, 0] = other
            elif pidx[me, 1] < 0:
                pidx[me, 1] = other
            else:
                raise ValueError("template atom in >2 bonds")
    p1_idx = jnp.tile(jnp.asarray(pidx[:, 0], jnp.int32), (km,))
    p2_idx = jnp.tile(jnp.asarray(pidx[:, 1], jnp.int32), (km,))
    base_rep = jnp.repeat(tag_base, m)
    p1_tag = jnp.where(p1_idx >= 0, base_rep + p1_idx + 1, -1)
    p2_tag = jnp.where(p2_idx >= 0, base_rep + p2_idx + 1, -1)

    types_flat = jnp.tile(mol_types, (km,))
    q_flat = jnp.tile(jnp.asarray(np.asarray(tpl.q), dtype), (km,))

    x = state.x.at[slot].set(apos, mode="drop")
    v = state.v.at[slot].set(jnp.zeros((km * m, 3), dtype), mode="drop")
    f = state.f.at[slot].set(jnp.zeros((km * m, 3), dtype), mode="drop")
    typ = state.type.at[slot].set(types_flat, mode="drop")
    tag = state.tag.at[slot].set(new_tag, mode="drop")
    qn = state.q.at[slot].set(q_flat, mode="drop")
    moln = state.mol.at[slot].set(mol_id, mode="drop")
    nb1 = state.bond1.at[slot].set(p1_tag, mode="drop")
    nb2 = state.bond2.at[slot].set(p2_tag, mode="drop")
    aliv = state.alive.at[slot].set(True, mode="drop")

    aux: PadAux = state.nbrs
    aux = aux.replace(xref=aux.xref.at[slot].set(apos, mode="drop"))

    n_mols = jnp.sum(landed_mol.astype(jnp.int32))
    want = jnp.clip(nins_l, 0) + jnp.clip(nins_r, 0)
    return state.replace(
        x=x, v=v, f=f, type=typ, tag=tag, q=qn, mol=moln, alive=aliv,
        bond1=nb1, bond2=nb2, nbrs=aux,
        maxtag=state.maxtag + n_mols * m, key=knext,
        obmd=state.obmd.replace(
            ninserted=state.obmd.ninserted + n_mols * m,
            insert_fail=state.obmd.insert_fail +
            jnp.maximum(want - n_mols, 0),
            usher_iters=state.obmd.usher_iters + jnp.sum(it_l) + jnp.sum(it_r)))


def _insert(cfg, geom, state: State, nins_l, nins_r, sub_l, sub_r):
    if cfg.obmd.mol is not None:
        return _insert_mol(cfg, geom, state, nins_l, nins_r, sub_l, sub_r)
    obmd = cfg.obmd
    dtype = state.dtype
    K = obmd.insert_kmax
    n_slots = geom.n_slots

    key = rng.fold_key(state.key, state.step)
    kl, kr, knext = jax.random.split(key, 3)

    def one_side(k_key, region, budget, sub):
        u = jax.random.uniform(k_key, (K, 3), dtype=dtype)
        cand = region.sample_uniform(u)
        ctype = jnp.full((K,), obmd.ntype, jnp.int32)
        if obmd.usher is not None:
            pos, ok, iters = usher_search_subset(cfg, sub, cand, ctype,
                                                 region)
        else:
            ok = near_check_subset(cfg, sub, cand)
            pos, iters = cand, jnp.zeros((K,), jnp.int32)
        budget = jnp.clip(budget, 0, K)
        accepted, _cnt = _sequential_accept(cfg, pos, ctype, ok, budget)
        return pos, accepted, iters

    pos_l, acc_l, it_l = one_side(kl, obmd.region5, nins_l, sub_l)
    pos_r, acc_r, it_r = one_side(kr, obmd.region6, nins_r, sub_r)
    pos = jnp.concatenate([pos_l, pos_r])
    accepted = jnp.concatenate([acc_l, acc_r])

    slot, landed = place_insertions(geom, state, pos, accepted)
    order = jnp.cumsum(landed.astype(jnp.int32)) - 1
    new_tag = state.maxtag + 1 + order

    m = 2 * K
    x = state.x.at[slot].set(pos, mode="drop")
    v = state.v.at[slot].set(jnp.zeros((m, 3), dtype), mode="drop")
    f = state.f.at[slot].set(jnp.zeros((m, 3), dtype), mode="drop")
    typ = state.type.at[slot].set(jnp.full((m,), obmd.ntype, jnp.int32),
                                  mode="drop")
    tag = state.tag.at[slot].set(new_tag, mode="drop")
    qn = state.q.at[slot].set(jnp.zeros((m,), dtype), mode="drop")
    nb1 = state.bond1.at[slot].set(jnp.full((m,), -1, jnp.int32), mode="drop")
    nb2 = state.bond2.at[slot].set(jnp.full((m,), -1, jnp.int32), mode="drop")
    aliv = state.alive.at[slot].set(True, mode="drop")

    aux: PadAux = state.nbrs
    aux = aux.replace(xref=aux.xref.at[slot].set(pos, mode="drop"))

    n_landed = jnp.sum(landed.astype(jnp.int32))
    want = jnp.clip(nins_l, 0) + jnp.clip(nins_r, 0)
    return state.replace(
        x=x, v=v, f=f, type=typ, tag=tag, q=qn, alive=aliv, nbrs=aux,
        bond1=nb1, bond2=nb2,
        maxtag=state.maxtag + n_landed, key=knext,
        obmd=state.obmd.replace(
            ninserted=state.obmd.ninserted + n_landed,
            insert_fail=state.obmd.insert_fail +
            jnp.maximum(want - n_landed, 0),
            usher_iters=state.obmd.usher_iters + jnp.sum(it_l) + jnp.sum(it_r)))


def _obmd_stage(cfg, geom, state: State, with_rebuild: bool = True) -> State:
    obmd = cfg.obmd
    box = cfg.box
    dtype = state.x.dtype.type
    dt = dtype(cfg.dt)
    t = state.sim_time

    pxx = eval_param(obmd.pxx, t)
    pxy = eval_param(obmd.pxy, t)
    pxz = eval_param(obmd.pxz, t)
    dpxx = eval_param(obmd.dpxx, t)
    freq = eval_param(obmd.freq, t)
    alpha = eval_param(obmd.alpha, t)
    tau = eval_param(obmd.tau, t)
    nbuf = eval_param(obmd.nbuf, t)

    with jax.named_scope("obmd_delete"):
        state, vnewl, vnewr = delete_outside(cfg, state)
    if with_rebuild:
        with jax.named_scope("neigh_decide"):
            state = maybe_rebuild(geom, box, cfg.skin, state)

    nins_l = feedback_count(region_count(state, obmd.region1),
                            obmd.mol_len, alpha, nbuf, dt, tau)
    nins_r = feedback_count(region_count(state, obmd.region2),
                            obmd.mol_len, alpha, nbuf, dt, tau)

    pad = cfg.pair.max_cut + cfg.skin
    with jax.named_scope("obmd_insert"):
        sub_l = _subset_slice(cfg, geom, state, obmd.region5, pad)
        sub_r = _subset_slice(cfg, geom, state, obmd.region6, pad)
        state = _insert(cfg, geom, state, nins_l, nins_r, sub_l, sub_r)

    area = dtype(box.cross_area)
    sim_time = t + dt
    factor = pxx + dpxx * jnp.sin(2.0 * jnp.pi * freq * sim_time)
    mfl = jnp.stack([vnewl[0] / dt + factor * area, vnewl[1] / dt,
                     vnewl[2] / dt])
    mfr = jnp.stack([vnewr[0] / dt - pxx * area, vnewr[1] / dt,
                     vnewr[2] / dt])
    sfl = jnp.stack([dtype(0.0), pxy * area, pxz * area])
    arr = state.x.dtype
    return state.replace(
        sim_time=sim_time,
        obmd=state.obmd.replace(
            momentum_force_left=mfl.astype(arr),
            momentum_force_right=mfr.astype(arr),
            shear_force_left=sfl.astype(arr),
            shear_force_right=(-sfl).astype(arr)))


def setup_cellpad(cfg: SceneConfig, state: State) -> State:
    """Pack into cellpad layout + initial force evaluation."""
    cfg = cfg.finalize()
    geom = make_geometry(cfg)
    kern = _make_kernel(cfg, geom)

    @jax.jit
    def _go(state):
        state = state.replace(x=cfg.box.wrap(state.x))
        state = layout_build(geom, cfg.box, state)
        if cfg.obmd is not None:
            state = _obmd_stage(cfg, geom, state)
        f = _forces(cfg, geom, kern, state)
        return state.replace(f=f)

    return _go(state)


def make_step_cellpad(cfg: SceneConfig):
    cfg = cfg.finalize()
    if not supports(cfg):
        raise ValueError(
            "cellpad path: single-type DPD/LJ; open x required with OBMD")
    geom = make_geometry(cfg)
    kern = _make_kernel(cfg, geom)
    dt = float(cfg.dt)

    def step(state: State) -> State:
        dtype = state.x.dtype.type
        m = per_atom_mass(cfg, state)[:, None]
        a3 = state.alive[:, None]
        dtf = dtype(0.5 * dt)

        v = jnp.where(a3, state.v + dtf * state.f / m, state.v)
        x = jnp.where(a3, state.x + dtype(dt) * v, state.x)
        x = cfg.box.wrap(x)
        state = state.replace(x=x, v=v)

        if cfg.obmd is not None:
            nfreq = cfg.obmd.nfreq
            if nfreq <= 1:
                state = _obmd_stage(cfg, geom, state)
            else:
                state = jax.lax.cond(state.step % nfreq == 0,
                                     lambda s: _obmd_stage(cfg, geom, s),
                                     lambda s: s, state)
        else:
            state = maybe_rebuild(geom, cfg.box, cfg.skin, state)

        f = _forces(cfg, geom, kern, state)

        m = per_atom_mass(cfg, state)[:, None]
        v = jnp.where(state.alive[:, None], state.v + dtf * f / m, state.v)
        return state.replace(v=v, f=f, step=state.step + 1)

    return step


def _plain_step(cfg, geom, kern, state: State) -> State:
    """One step with NO rebuild logic (the runner guarantees the half-skin
    budget via its freeze/rebuild protocol)."""
    dt = float(cfg.dt)
    dtype = state.x.dtype.type
    m = per_atom_mass(cfg, state)[:, None]
    a3 = state.alive[:, None]
    dtf = dtype(0.5 * dt)

    v = jnp.where(a3, state.v + dtf * state.f / m, state.v)
    x = cfg.box.wrap(jnp.where(a3, state.x + dtype(dt) * v, state.x))
    state = state.replace(x=x, v=v)
    if cfg.obmd is not None:
        state = _obmd_stage(cfg, geom, state, with_rebuild=False)
    f = _forces(cfg, geom, kern, state)
    m = per_atom_mass(cfg, state)[:, None]
    v = jnp.where(state.alive[:, None], state.v + dtf * f / m, state.v)
    return state.replace(v=v, f=f, step=state.step + 1)


def make_run_cellpad(cfg: SceneConfig, nsteps: int, chunk: int = 8):
    """EXPERIMENTAL host-chunked runner (not the default).

    Motivation: a heavy rebuild branch inside `lax.cond` costs ~9 ms/step at
    100k atoms *even when not taken* (broken scan-carry aliasing).  This
    variant moves the rebuild to the host between frozen-flag chunks —
    exact semantics (a step never executes on a tripped structure) — but
    measured 2x SLOWER end-to-end on the axon transport (per-chunk host
    syncs + full-state masked writes).  Kept as the reference implementation
    for the round-2 fused-kernel runner; integrate.make_run uses the
    scan+cond path.
    """
    cfg = cfg.finalize()
    if not supports(cfg):
        raise ValueError(
            "cellpad path: single-type DPD/LJ; open x required with OBMD")
    geom = make_geometry(cfg)
    kern = _make_kernel(cfg, geom)
    skin = float(cfg.skin)

    if skin <= 0.0 or (cfg.obmd is not None and cfg.obmd.nfreq > 1):
        step = make_step_cellpad(cfg)

        @jax.jit
        def run_scan(state: State) -> State:
            def body(c, _):
                return step(c), None
            c, _ = jax.lax.scan(body, state, None, length=nsteps)
            return c

        return run_scan

    # 0.95 safety factor: the freeze check runs pre-drift (one step earlier
    # than LAMMPS's post-drift check), so shave one step's drift off the
    # half-skin budget.
    trip2 = (0.5 * skin * 0.95) ** 2

    def tripped(s):
        aux = s.nbrs
        d = cfg.box.min_image(s.x - aux.xref)
        disp2 = jnp.where(s.alive, jnp.sum(d * d, axis=-1), 0.0)
        return (jnp.max(disp2) > trip2) | aux.force_rebuild

    @jax.jit
    def chunk_run(state: State):
        def body(c, _):
            s, frozen = c
            frozen = frozen | tripped(s)
            s2 = _plain_step(cfg, geom, kern, s)
            s3 = jax.tree_util.tree_map(
                lambda old, new: jnp.where(frozen, old, new), s, s2)
            return (s3, frozen), None
        (s, frozen), _ = jax.lax.scan(body, (state, jnp.zeros((), bool)),
                                      None, length=chunk)
        return s, frozen

    rebuild = jax.jit(lambda s: layout_build(geom, cfg.box, s))

    def run(state: State) -> State:
        start = int(state.step)
        while int(state.step) - start < nsteps:
            state, frozen = chunk_run(state)
            if bool(frozen):
                state = rebuild(state)
        return state

    return run


# NOTE: a rebuild-segmented runner (nested lax.while_loop with the half-skin
# check in the loop condition) was prototyped and measured ~30% SLOWER than
# lax.scan over the cond-carrying step at 100k atoms: TPU while-loop carries
# copy buffers per iteration where scan carries alias.  The scan + lax.cond
# structure in make_step_cellpad is the fast path.
