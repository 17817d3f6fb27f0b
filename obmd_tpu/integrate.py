"""The fused timestep: velocity-Verlet + OBMD stage + neighboring + pair
forces, mirroring Verlet::run's per-step order (reference verlet.cpp:229-360):

  initial_integrate (fix_nve.cpp:80: v += dt/2 f/m; x += dt v)
  -> [every nfreq steps] OBMD pre-exchange (delete/insert, setpoints)
  -> pbc wrap (y,z)               (domain.cpp:529; x is 'f')
  -> neighbor maintenance         (Neighbor::decide/build analogue)
  -> pair compute                 (pair_dpd.cpp:66)
  -> OBMD post_force              (boundary forces)
  -> final_integrate              (fix_nve.cpp:185: v += dt/2 f/m)

Two force paths:
  * "nlist" (default, fast): persistent incremental cell table + [N,K]
    Verlet list with half-skin displacement rebuilds (neighbors.py).
  * "sweep": stateless cell-pair sweep rebuilt every step — the reference
    semantics path used for cross-validation.

The force array lives in the State so step t+1's initial kick reuses the
forces computed at step t, exactly like LAMMPS's persistent atom->f.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rng
from .cells import GridSpec, build_cells
from .config import SceneConfig
from .forces.nlist import nlist_sweep
from .forces.pairs import pair_sweep
from .neighbors import NeighborParams, full_rebuild, maybe_rebuild
from .obmd.stage import (apply_boundary_force, delete_outside, eval_param,
                         feedback_count, pre_exchange, region_count)
from .state import State, per_atom_mass

PURPOSE_PAIR_NOISE = 1


def make_grid_spec(cfg: SceneConfig) -> GridSpec:
    cut = cfg.pair.max_cut + cfg.skin
    return GridSpec.create(cfg.box, cut, cfg.capacity.cell_capacity)


def make_neighbor_params(cfg: SceneConfig) -> NeighborParams:
    return NeighborParams(spec=make_grid_spec(cfg),
                          k_max=cfg.capacity.max_neighbors,
                          movers_max=cfg.capacity.movers_max,
                          cutoff=cfg.pair.max_cut, skin=cfg.skin)


def _sig_scale(cfg: SceneConfig, state):
    from .forces.pairs import sig_scale_of
    return sig_scale_of(cfg.pair, state.step, state.dtype)


def _salt(cfg: SceneConfig, step):
    seed = getattr(cfg.pair, "seed", 0)
    return rng.step_salt(seed, step, PURPOSE_PAIR_NOISE)


def _extra_forces(cfg: SceneConfig, state: State, f):
    """OBMD boundary forces + FENE bonds + Langevin fix (post-pair force
    hooks, mirroring the reference's Modify::post_force ordering)."""
    if cfg.obmd is not None:
        f = apply_boundary_force(cfg, state, f)
    more = state.bond_partners[2:]
    if cfg.bond is not None:
        from .forces.bonded import bond_forces
        fb, _ = bond_forces(cfg.bond, cfg.box, state.x, state.bond1,
                            state.bond2, state.alive, more_partners=more)
        f = f + fb
    if cfg.angle is not None:
        from .forces.bonded import angle_forces
        fa, _ = angle_forces(cfg.angle, cfg.box, state.x, state.bond1,
                             state.bond2, state.type, state.alive,
                             more_partners=more)
        f = f + fa
    if cfg.dihedral is not None:
        from .forces.bonded import dihedral_forces
        if more:
            raise NotImplementedError(
                "dihedrals on branched topologies (>2 bonds/atom) are not "
                "supported by the center-bond dihedral storage")
        fd, _ = dihedral_forces(cfg.dihedral, cfg.box, state.x,
                                state.bond1, state.bond2, state.alive)
        f = f + fd
    if cfg.improper is not None and state.impr is not None:
        from .forces.bonded import improper_forces
        fi, _ = improper_forces(cfg.improper, cfg.box, state.x,
                                state.bond_partners, state.impr,
                                state.type, state.alive)
        f = f + fi
    if cfg.langevin is not None:
        from .forces.bonded import langevin_force
        f = f + langevin_force(cfg.langevin, cfg, state)
    return f


def compute_forces(cfg: SceneConfig, spec: GridSpec, state: State,
                   *, compute_energy: bool = False,
                   compute_virial: bool = False,
                   compute_virial_atom: bool = False):
    """Stateless force evaluation (sweep path): cell rebuild + pair sweep +
    OBMD boundary forces.  The observables layer and the sweep step use
    this; the nlist step has its own inline force stage."""
    from .forces.pairs import sig_scale_of
    ctab = build_cells(spec, state.x, state.alive)
    pf = pair_sweep(cfg.pair, cfg.box, spec, ctab,
                    state.x, state.v, state.type, state.tag, state.q,
                    _salt(cfg, state.step), dt=cfg.dt,
                    sig_scale=sig_scale_of(cfg.pair, state.step,
                                           state.dtype),
                    compute_energy=compute_energy,
                    compute_virial=compute_virial,
                    compute_virial_atom=compute_virial_atom)
    f = _extra_forces(cfg, state, pf.f)
    return pf._replace(f=f), ctab


def setup(cfg: SceneConfig, state: State) -> State:
    """Initial neighbor build + force evaluation before the first step
    (Verlet::setup, verlet.cpp:93).  Runs the OBMD stage first like
    setup_pre_exchange (ref fix_obmd_merged.cpp:542)."""
    cfg = cfg.finalize()
    if cfg.force_path == "cellpad":
        from .engine_cellpad import setup_cellpad
        return setup_cellpad(cfg, state)
    spec = make_grid_spec(cfg)
    nparams = make_neighbor_params(cfg)

    @jax.jit
    def _setup(state):
        if cfg.obmd is not None:
            state = pre_exchange(cfg, spec, state)
        state = state.replace(x=cfg.box.wrap(state.x))
        nbrs = full_rebuild(nparams, cfg.box, state.x, state.alive)
        state = state.replace(nbrs=nbrs)
        if cfg.force_path == "nlist":
            pf = nlist_sweep(cfg.pair, cfg.box, nbrs.nlist, state.x, state.v,
                             state.type, state.tag, state.q, state.alive,
                             _salt(cfg, state.step), dt=cfg.dt,
                             bond1=state.bond1 if cfg.bond else None,
                             bond2=state.bond2 if cfg.bond else None,
                             more_bonds=(state.bond_partners[2:]
                                         if cfg.bond else ()),
                             sig_scale=_sig_scale(cfg, state))
            f = pf.f
            f = _extra_forces(cfg, state, f)
        else:
            pf, _ = compute_forces(cfg, spec, state)
            f = pf.f
        alive3 = state.alive[:, None]
        return state.replace(f=jnp.where(alive3, f, 0.0))

    return _setup(state)


def rebuild_neighbors(cfg: SceneConfig, state: State) -> State:
    """(Re)build the neighbor structures without touching physics — the
    restart path (checkpoint stores physical state only) and the recovery
    path after external state edits."""
    cfg = cfg.finalize()
    if cfg.force_path == "cellpad":
        from .cellpad import layout_build
        from .engine_cellpad import make_geometry
        geom = make_geometry(cfg)
        return jax.jit(lambda s: layout_build(geom, cfg.box, s))(state)
    nparams = make_neighbor_params(cfg)

    @jax.jit
    def _go(state):
        return state.replace(
            nbrs=full_rebuild(nparams, cfg.box, state.x, state.alive))

    return _go(state)


def _obmd_stage_fast(cfg, spec, nparams, state):
    """OBMD pre-exchange against the persistent table: delete -> file table
    -> census -> insert (energies via current table) -> patch structures ->
    setpoint forces.  Mirrors obmd.stage.pre_exchange but keeps the
    neighbor structures current instead of re-sorting."""
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

    prev_alive = state.alive
    state, vnewl, vnewr = delete_outside(cfg, state)

    # tombstone freed slots: their ids may linger in other rows until the
    # next rebuild, so they must not be re-bound to a new atom
    nbrs = state.nbrs
    dead_now = prev_alive & ~state.alive
    nbrs = nbrs.replace(tombstone=nbrs.tombstone | dead_now)
    # rebuild now if flagged / displacement tripped (keeps insertion rows
    # consistent with the current configuration)
    nbrs = maybe_rebuild(nparams, box, nbrs, state.x, state.alive)
    state = state.replace(nbrs=nbrs)

    cnt_left = region_count(state, obmd.region1, obmd.group_types)
    cnt_right = region_count(state, obmd.region2, obmd.group_types)
    nins_l = feedback_count(cnt_left, obmd.mol_len, alpha, nbuf, dt, tau)
    nins_r = feedback_count(cnt_right, obmd.mol_len, alpha, nbuf, dt, tau)

    # per-buffer subsets (pad by cutoff+skin: serves both USHER energies and
    # the new atoms' neighbor rows)
    from .obmd.subset import region_subset, subset_rows
    b_max = cfg.capacity.insert_region_max or (cfg.capacity.n_max // 2)
    pad = cfg.pair.max_cut + cfg.skin
    sub_l = region_subset(cfg, state, obmd.region5, pad, b_max)
    sub_r = region_subset(cfg, state, obmd.region6, pad, b_max)

    # free-slot choice must avoid tombstoned slots (stale list references)
    masked_alive = state.alive | state.nbrs.tombstone
    from .obmd.stage import insert_particles_subset
    state_ins, new_slots, pins_l, pins_r = insert_particles_subset(
        cfg, state.replace(alive=masked_alive), nins_l, nins_r, sub_l, sub_r)
    # restore true alive: translate the masked view back
    n = state.capacity
    added = jnp.zeros((n,), bool).at[new_slots].set(new_slots < n, mode="drop")
    state = state_ins.replace(alive=state.alive | added)

    # patch the Verlet list: fresh rows from the side-specific subsets
    # (new_slots layout: left block then right block, rounds*K each)
    from .neighbors import apply_new_rows
    from .obmd.stage import rounds_of
    M = rounds_of(cfg) * cfg.obmd.insert_kmax
    pos_all = state.x[jnp.clip(new_slots, 0, n - 1)]
    act = new_slots < n
    row_l, ok_l, ov_l = subset_rows(nparams, cfg.box, sub_l,
                                    pos_all[:M], new_slots[:M], act[:M])
    row_r, ok_r, ov_r = subset_rows(nparams, cfg.box, sub_r,
                                    pos_all[M:], new_slots[M:], act[M:])
    row = jnp.concatenate([row_l, row_r])
    row_ok = jnp.concatenate([ok_l, ok_r])
    nbrs = apply_new_rows(nparams, state.nbrs, state.x, new_slots, row,
                          row_ok, ov_l + ov_r)
    nbrs = nbrs.replace(
        force_rebuild=nbrs.force_rebuild | sub_l.overflow | sub_r.overflow)
    state = state.replace(nbrs=nbrs)

    # second deletion pass (ref :596-597) is a no-op for ATOM-mode insertion
    # inside the box; skipped on the fast path.

    area = dtype(box.cross_area)
    sim_time = t + dt
    factor = pxx + dpxx * jnp.sin(2.0 * jnp.pi * freq * sim_time)
    vnewl = vnewl - pins_l
    vnewr = vnewr - pins_r
    mfl = jnp.stack([vnewl[0] / dt + factor * area, vnewl[1] / dt,
                     vnewl[2] / dt])
    mfr = jnp.stack([vnewr[0] / dt - pxx * area, vnewr[1] / dt,
                     vnewr[2] / dt])
    sfl = jnp.stack([dtype(0.0) * area, pxy * area, pxz * area])
    arr = state.x.dtype
    return state.replace(
        sim_time=sim_time,
        obmd=state.obmd.replace(
            momentum_force_left=mfl.astype(arr),
            momentum_force_right=mfr.astype(arr),
            shear_force_left=sfl.astype(arr),
            shear_force_right=(-sfl).astype(arr)))


def make_step(cfg: SceneConfig):
    """Build the jitted one-step function for this scene."""
    cfg = cfg.finalize()
    if cfg.force_path == "cellpad":
        from .engine_cellpad import make_step_cellpad
        return make_step_cellpad(cfg)
    if cfg.obmd is not None and cfg.obmd.mol is not None:
        raise NotImplementedError(
            "molecule-mode insertion is implemented on the cellpad engine "
            "(force_path='cellpad')")
    spec = make_grid_spec(cfg)
    nparams = make_neighbor_params(cfg)
    dt = float(cfg.dt)
    fast = cfg.force_path == "nlist"
    if not fast and cfg.bond is not None:
        raise NotImplementedError(
            "the sweep path has no special-bonds 1-2 exclusion; bonded "
            "scenes run on nlist or cellpad")

    def step(state: State) -> State:
        dtype = state.x.dtype.type
        m = per_atom_mass(cfg, state)[:, None]
        alive3 = state.alive[:, None]
        dtf = dtype(0.5 * dt)

        # initial integrate (half kick + drift), live atoms only
        v = jnp.where(alive3, state.v + dtf * state.f / m, state.v)
        if cfg.rigid:
            from .rigid import rigid_drift
            x, v = rigid_drift(cfg, state, v)   # wraps internally
        else:
            x = jnp.where(alive3, state.x + dtype(dt) * v, state.x)
            # wrap periodic axes before any cell filing; x stays open
            x = cfg.box.wrap(x)
        if cfg.shake is not None:
            from .shake import shake_positions
            x, v = shake_positions(cfg, state.x, x, v, state.type,
                                   state.bond1, state.bond2, state.alive,
                                   1.0 / m[:, 0],
                                   more_partners=state.bond_partners[2:])
        state = state.replace(x=x, v=v)

        # OBMD stage every nfreq steps (ref fix_obmd_merged.cpp:279-281,632)
        if cfg.obmd is not None:
            nfreq = cfg.obmd.nfreq
            if fast:
                stage_fn = lambda s: _obmd_stage_fast(cfg, spec, nparams, s)
            else:
                stage_fn = lambda s: pre_exchange(cfg, spec, s)
            if nfreq <= 1:
                state = stage_fn(state)
            else:
                state = jax.lax.cond(state.step % nfreq == 0, stage_fn,
                                     lambda s: s, state)

        if fast:
            nbrs = state.nbrs
            if cfg.obmd is None:
                nbrs = maybe_rebuild(nparams, cfg.box, nbrs, state.x,
                                     state.alive)
                state = state.replace(nbrs=nbrs)
            pf = nlist_sweep(cfg.pair, cfg.box, state.nbrs.nlist, state.x,
                             state.v, state.type, state.tag, state.q,
                             state.alive, _salt(cfg, state.step), dt=dt,
                             bond1=state.bond1 if cfg.bond else None,
                             bond2=state.bond2 if cfg.bond else None,
                             more_bonds=(state.bond_partners[2:]
                                         if cfg.bond else ()),
                             sig_scale=_sig_scale(cfg, state))
            f = pf.f
            f = _extra_forces(cfg, state, f)
        else:
            pf, ctab = compute_forces(cfg, spec, state)
            f = pf.f
            state = state.replace(
                cell_overflow=state.cell_overflow + ctab.overflow)

        f = jnp.where(state.alive[:, None], f, 0.0)

        # final integrate (half kick)
        m = per_atom_mass(cfg, state)[:, None]
        v = jnp.where(state.alive[:, None], state.v + dtf * f / m, state.v)
        if cfg.rigid:
            from .rigid import rigid_project
            v = rigid_project(cfg, state, v)
        if cfg.shake is not None:
            from .shake import rattle_velocities
            v = rattle_velocities(cfg, state.x, v, state.type, state.bond1,
                                  state.bond2, state.alive, 1.0 / m[:, 0],
                                  more_partners=state.bond_partners[2:])

        return state.replace(v=v, f=f, step=state.step + 1)

    return step


def make_run(cfg: SceneConfig, nsteps: int):
    """Fused multi-step runner, one device dispatch for nsteps.

    cellpad: static rebuild schedule (engine_cellpad.make_run_cellpad) —
    no data-dependent lax.cond in the hot loop (a cond-guarded rebuild
    measured ~10.7 ms/step of pure carry overhead at 100k atoms).
    Other paths: lax.scan over the step function."""
    cfg = cfg.finalize()
    if cfg.force_path == "cellpad":
        from .engine_cellpad import make_run_cellpad
        return make_run_cellpad(cfg, nsteps)
    step = make_step(cfg)

    @jax.jit
    def run(state: State) -> State:
        def body(s, _):
            return step(s), None
        state, _ = jax.lax.scan(body, state, None, length=nsteps)
        return state

    return run


def equilibrate(cfg: SceneConfig, state: State, nsteps: int,
                temp: float = 1.0, rescale_every: int = 25) -> State:
    """Tame the startup transient of a freshly drawn configuration with
    periodic velocity rescaling to `temp` (the reference workloads start
    from pre-equilibrated data files; a uniform random gas under DPD's stiff
    a0 needs a few hundred tempered steps first)."""
    from .state import temperature
    cfg = cfg.finalize()
    run = make_run(cfg, rescale_every)

    @jax.jit
    def rescale(state):
        t_now = temperature(cfg, state)
        scale = jnp.sqrt(temp / jnp.maximum(t_now, 1e-6))
        v = jnp.where(state.alive[:, None], state.v * scale, state.v)
        return state.replace(v=v)

    for _ in range(max(1, nsteps // rescale_every)):
        state = rescale(run(state))
    # The violent overlap transient of a random gas routinely outruns the
    # half-skin budget for a few epochs; that staleness is acceptable here
    # by construction (velocities are being rescaled anyway), so clear the
    # staleness counter at exit — production telemetry starts clean.
    # Overflow counters are NOT cleared: dropped atoms are permanent damage.
    if state.nbrs is not None and hasattr(state.nbrs, "skin_trips"):
        state = state.replace(nbrs=state.nbrs.replace(
            skin_trips=jnp.zeros((), jnp.int32)))
    return state


def run_loop(cfg: SceneConfig, state: State, nsteps: int,
             callback=None, callback_every: int = 0) -> State:
    """Host-driven loop with optional periodic host callback(state) — the
    thermo/dump path (output.cpp analogue)."""
    step = jax.jit(make_step(cfg), donate_argnums=0)
    for i in range(nsteps):
        state = step(state)
        if callback is not None and callback_every and (i + 1) % callback_every == 0:
            callback(state)
    return state
