"""The fused timestep: velocity-Verlet + OBMD stage + cell rebuild + pair
forces, mirroring Verlet::run's per-step order (reference verlet.cpp:229-360):

  initial_integrate (fix_nve.cpp:80: v += dt/2 f/m; x += dt v)
  -> [every nfreq steps] OBMD pre_exchange (delete/insert, setpoints)
  -> pbc wrap (y,z)               (domain.cpp:529; x is 'f')
  -> cell rebuild                 (neighbor build analogue)
  -> pair compute                 (pair_dpd.cpp:66)
  -> OBMD post_force              (boundary forces)
  -> final_integrate              (fix_nve.cpp:185: v += dt/2 f/m)

The force array lives in the State so step t+1's initial kick reuses the
forces computed at step t, exactly like LAMMPS's persistent atom->f.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from . import rng
from .cells import GridSpec, build_cells
from .config import SceneConfig
from .forces.pairs import pair_sweep
from .obmd.stage import apply_boundary_force, pre_exchange
from .state import State, per_atom_mass

PURPOSE_PAIR_NOISE = 1


def make_grid_spec(cfg: SceneConfig) -> GridSpec:
    cut = cfg.pair.max_cut + cfg.skin
    return GridSpec.create(cfg.box, cut, cfg.capacity.cell_capacity)


def compute_forces(cfg: SceneConfig, spec: GridSpec, state: State,
                   *, compute_energy: bool = False,
                   compute_virial: bool = False):
    """Cell rebuild + pair sweep + OBMD boundary forces on current positions.
    Returns (PairFields with boundary forces folded into .f, CellTable)."""
    ctab = build_cells(spec, state.x, state.alive)
    seed = getattr(cfg.pair, "seed", 0)
    salt = rng.step_salt(seed, state.step, PURPOSE_PAIR_NOISE)
    pf = pair_sweep(cfg.pair, cfg.box, spec, ctab,
                    state.x, state.v, state.type, state.tag, state.q, salt,
                    dt=cfg.dt, compute_energy=compute_energy,
                    compute_virial=compute_virial)
    f = pf.f
    if cfg.obmd is not None:
        f = apply_boundary_force(cfg, state, f)
    return pf._replace(f=f), ctab


def setup(cfg: SceneConfig, state: State) -> State:
    """Initial force evaluation before the first step (Verlet::setup,
    verlet.cpp:93: forces must exist for the first initial kick).  Runs the
    OBMD stage first like setup_pre_exchange (ref fix_obmd_merged.cpp:542)."""
    spec = make_grid_spec(cfg)

    @jax.jit
    def _setup(state):
        if cfg.obmd is not None:
            state = pre_exchange(cfg, spec, state)
        state = state.replace(x=cfg.box.wrap(state.x))
        pf, ctab = compute_forces(cfg, spec, state)
        alive3 = state.alive[:, None]
        return state.replace(f=jnp.where(alive3, pf.f, 0.0),
                             cell_overflow=state.cell_overflow + ctab.overflow)

    return _setup(state)


def make_step(cfg: SceneConfig):
    """Build the jitted one-step function for this scene."""
    cfg = cfg.finalize()
    spec = make_grid_spec(cfg)
    dt = float(cfg.dt)

    def step(state: State) -> State:
        dtype = state.dtype.type
        m = per_atom_mass(cfg, state)[:, None]
        alive3 = state.alive[:, None]
        dtf = dtype(0.5 * dt)

        # initial integrate (half kick + drift), live atoms only
        v = jnp.where(alive3, state.v + dtf * state.f / m, state.v)
        x = jnp.where(alive3, state.x + dtype(dt) * v, state.x)
        state = state.replace(x=x, v=v)

        # OBMD stage every nfreq steps (ref forces reneighbor+pre_exchange
        # via next_reneighbor, fix_obmd_merged.cpp:279-281,632)
        if cfg.obmd is not None:
            nfreq = cfg.obmd.nfreq
            if nfreq <= 1:
                state = pre_exchange(cfg, spec, state)
            else:
                state = jax.lax.cond(state.step % nfreq == 0,
                                     lambda s: pre_exchange(cfg, spec, s),
                                     lambda s: s, state)

        # wrap periodic axes (y,z); x is open
        state = state.replace(x=cfg.box.wrap(state.x))

        pf, ctab = compute_forces(cfg, spec, state)
        f = jnp.where(state.alive[:, None], pf.f, 0.0)

        # final integrate (half kick)
        m = per_atom_mass(cfg, state)[:, None]
        v = jnp.where(state.alive[:, None], state.v + dtf * f / m, state.v)

        return state.replace(
            v=v, f=f, step=state.step + 1,
            cell_overflow=state.cell_overflow + ctab.overflow)

    return step


def make_run(cfg: SceneConfig, nsteps: int):
    """Fused multi-step runner: lax.scan over the step function — the
    benchmark path (one device dispatch for nsteps)."""
    step = make_step(cfg)

    @jax.jit
    def run(state: State) -> State:
        def body(s, _):
            return step(s), None
        state, _ = jax.lax.scan(body, state, None, length=nsteps)
        return state

    return run


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
