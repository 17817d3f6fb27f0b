"""Observables: thermo quantities and x-resolved profiles.

Counterpart of the reference's thermo/compute layer (thermo.cpp,
compute_temp.cpp, compute_stress_atom.cpp) restricted to what OBMD papers
plot: T, P, and density / velocity / pressure profiles along the open axis
(SURVEY.md §5 metrics note).

Pressure convention (LAMMPS): P V = N kB T + virial_sum (per-direction:
P_aa V = sum m v_a^2 + W_aa).  Profiles use per-atom virial shares binned by
x, divided by the bin volume.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .cells import build_cells
from .config import SceneConfig
from .forces.pairs import pair_sweep
from .integrate import PURPOSE_PAIR_NOISE, make_grid_spec
from . import rng
from .state import State, per_atom_mass, temperature


class Thermo(NamedTuple):
    step: jnp.ndarray
    natoms: jnp.ndarray
    temp: jnp.ndarray
    pe: jnp.ndarray          # total potential energy (epair + emol)
    ke: jnp.ndarray
    pressure: jnp.ndarray    # scalar P = (W_xx+W_yy+W_zz + sum m v^2)/(3V)
    pxx: jnp.ndarray
    # thermo.cpp keyword breadth (press tensor, energy split, force norms)
    press_tensor: jnp.ndarray = jnp.zeros(6)   # pxx pyy pzz pxy pxz pyz
    epair: jnp.ndarray = jnp.zeros(())
    ebond: jnp.ndarray = jnp.zeros(())
    eangle: jnp.ndarray = jnp.zeros(())
    edihed: jnp.ndarray = jnp.zeros(())
    eimp: jnp.ndarray = jnp.zeros(())
    fmax: jnp.ndarray = jnp.zeros(())
    fnorm: jnp.ndarray = jnp.zeros(())


class Profiles(NamedTuple):
    """x-binned profiles. All [nbins]."""
    x_centers: jnp.ndarray
    density: jnp.ndarray       # number density
    vx: jnp.ndarray            # mean x velocity
    temp: jnp.ndarray          # local temperature
    pxx: jnp.ndarray           # local P_xx (kinetic + virial share)
    count: jnp.ndarray


def make_thermo_fn(cfg: SceneConfig):
    cfg = cfg.finalize()
    spec = make_grid_spec(cfg)

    @jax.jit
    def thermo(state: State) -> Thermo:
        ctab = build_cells(spec, state.x, state.alive)
        seed = getattr(cfg.pair, "seed", 0)
        salt = rng.step_salt(seed, state.step, PURPOSE_PAIR_NOISE)
        pf = pair_sweep(cfg.pair, cfg.box, spec, ctab, state.x, state.v,
                        state.type, state.tag, state.q, salt, dt=cfg.dt,
                        compute_energy=True, compute_virial=True)
        m = per_atom_mass(cfg, state)
        alive = state.alive
        mv2 = jnp.where(alive[:, None], m[:, None] * state.v**2, 0.0)
        vol = state.dtype.type(cfg.box.volume)
        w = pf.virial
        pressure = (jnp.sum(mv2) + w[0] + w[1] + w[2]) / (3.0 * vol)
        pxx = (jnp.sum(mv2[:, 0]) + w[0]) / vol
        # full pressure tensor: P_ab = (sum m v_a v_b + W_ab) / V
        v_ = jnp.where(alive[:, None], state.v, 0.0)
        mvv = jnp.stack([
            jnp.sum(mv2[:, 0]), jnp.sum(mv2[:, 1]), jnp.sum(mv2[:, 2]),
            jnp.sum(m * v_[:, 0] * v_[:, 1]),
            jnp.sum(m * v_[:, 0] * v_[:, 2]),
            jnp.sum(m * v_[:, 1] * v_[:, 2])])
        press_tensor = (mvv + w) / vol
        epair = jnp.sum(jnp.where(alive, pf.pe, 0.0))
        zero = jnp.zeros((), state.dtype)
        ebond = eangle = edihed = eimp = zero
        more = state.bond_partners[2:]
        if cfg.bond is not None:
            from .forces.bonded import bond_forces
            _, eb = bond_forces(cfg.bond, cfg.box, state.x, state.bond1,
                                state.bond2, alive, compute_energy=True,
                                more_partners=more)
            ebond = jnp.sum(jnp.where(alive, eb, 0.0))
        if cfg.angle is not None:
            from .forces.bonded import angle_forces
            _, ea = angle_forces(cfg.angle, cfg.box, state.x, state.bond1,
                                 state.bond2, state.type, alive,
                                 compute_energy=True, more_partners=more)
            eangle = jnp.sum(jnp.where(alive, ea, 0.0))
        if cfg.dihedral is not None:
            from .forces.bonded import dihedral_forces
            _, ed = dihedral_forces(cfg.dihedral, cfg.box, state.x,
                                    state.bond1, state.bond2, alive,
                                    compute_energy=True)
            edihed = jnp.sum(jnp.where(alive, ed, 0.0))
        if cfg.improper is not None and state.impr is not None:
            from .forces.bonded import improper_forces
            _, ei = improper_forces(cfg.improper, cfg.box, state.x,
                                    state.bond_partners, state.impr,
                                    state.type, alive, compute_energy=True)
            eimp = jnp.sum(jnp.where(alive, ei, 0.0))
        fa = jnp.where(alive[:, None], state.f, 0.0)
        return Thermo(step=state.step, natoms=state.natoms,
                      temp=temperature(cfg, state),
                      pe=epair + ebond + eangle + edihed + eimp,
                      ke=0.5 * jnp.sum(mv2), pressure=pressure, pxx=pxx,
                      press_tensor=press_tensor, epair=epair, ebond=ebond,
                      eangle=eangle, edihed=edihed, eimp=eimp,
                      fmax=jnp.max(jnp.abs(fa)),
                      fnorm=jnp.sqrt(jnp.sum(fa * fa)))

    return thermo


def make_profile_fn(cfg: SceneConfig, nbins: int = 64):
    """Instantaneous profile snapshot; average over calls on the host."""
    cfg = cfg.finalize()
    spec = make_grid_spec(cfg)
    xlo, xhi = cfg.box.lo[0], cfg.box.hi[0]
    dx = (xhi - xlo) / nbins
    ly, lz = cfg.box.lengths[1], cfg.box.lengths[2]
    bin_vol = dx * ly * lz

    @jax.jit
    def profiles(state: State) -> Profiles:
        dtype = state.dtype
        ctab = build_cells(spec, state.x, state.alive)
        seed = getattr(cfg.pair, "seed", 0)
        salt = rng.step_salt(seed, state.step, PURPOSE_PAIR_NOISE)
        pf = pair_sweep(cfg.pair, cfg.box, spec, ctab, state.x, state.v,
                        state.type, state.tag, state.q, salt, dt=cfg.dt,
                        compute_virial_atom=True)
        alive = state.alive
        m = per_atom_mass(cfg, state)
        b = jnp.clip(((state.x[:, 0] - xlo) / dx).astype(jnp.int32), 0,
                     nbins - 1)
        b = jnp.where(alive, b, nbins)  # dead -> overflow bin

        def binsum(vals):
            out = jnp.zeros((nbins + 1,), dtype)
            return out.at[b].add(jnp.where(alive, vals, 0.0))[:nbins]

        cnt = binsum(jnp.ones_like(m))
        safe = jnp.maximum(cnt, 1.0)
        mvx2 = m * state.v[:, 0] ** 2
        mv2 = m * jnp.sum(state.v**2, axis=-1)
        wxx = pf.virial_atom[:, 0]
        return Profiles(
            x_centers=xlo + (jnp.arange(nbins, dtype=dtype) + 0.5) * dx,
            density=cnt / bin_vol,
            vx=binsum(state.v[:, 0]) / safe,
            temp=binsum(mv2) / (3.0 * safe),
            pxx=(binsum(mvx2) + binsum(wxx)) / bin_vol,
            count=cnt,
        )

    return profiles


class ObmdMetrics(NamedTuple):
    """Per-interval OBMD observables (SURVEY.md §5: exactly what the OBMD
    papers plot and the reference only exposes as ad-hoc couts)."""

    step: jnp.ndarray
    nbuf_left: jnp.ndarray       # atoms in region1
    nbuf_right: jnp.ndarray      # atoms in region2
    ninserted: jnp.ndarray       # running totals
    ndeleted: jnp.ndarray
    insert_fail: jnp.ndarray
    usher_iters: jnp.ndarray
    momentum_force_left: jnp.ndarray   # [3] current setpoints
    momentum_force_right: jnp.ndarray  # [3]


def make_obmd_metrics_fn(cfg: SceneConfig):
    cfg = cfg.finalize()
    if cfg.obmd is None:
        raise ValueError("scene has no OBMD stage")
    r1, r2 = cfg.obmd.region1, cfg.obmd.region2

    @jax.jit
    def metrics(state: State) -> ObmdMetrics:
        def count(region):
            return jnp.sum((state.alive & region.match(state.x))
                           .astype(jnp.int32))
        sc = state.obmd
        return ObmdMetrics(
            step=state.step,
            nbuf_left=count(r1), nbuf_right=count(r2),
            ninserted=sc.ninserted, ndeleted=sc.ndeleted,
            insert_fail=sc.insert_fail, usher_iters=sc.usher_iters,
            momentum_force_left=sc.momentum_force_left,
            momentum_force_right=sc.momentum_force_right)

    return metrics


def check_invariants(cfg: SceneConfig, state: State,
                     raise_on_violation: bool = True) -> dict:
    """Host-side audit of a finished run's validity counters.

    The engines track every capacity/staleness violation (cell overflow,
    Verlet-row / relayout overflow, half-skin trips on the static relayout
    schedule) but a jitted runner cannot raise — so drivers MUST call this
    after a run.  A nonzero violation means pair interactions were dropped
    or stale and the trajectory is not trustworthy (the failure mode behind
    the round-2 hot-thermostat incident).  Returns the counter dict; raises
    RuntimeError on violations unless raise_on_violation=False.
    """
    tel = {"cell_overflow": int(state.cell_overflow)}
    nbrs = state.nbrs
    if nbrs is not None:
        # NeighborState (nlist path) and PadAux (cellpad path) both carry
        # overflow/rebuilds; PadAux adds skin_trips.
        if hasattr(nbrs, "overflow"):
            tel["layout_overflow"] = int(nbrs.overflow)
        if hasattr(nbrs, "skin_trips"):
            tel["skin_trips"] = int(nbrs.skin_trips)
        if hasattr(nbrs, "rebuilds"):
            tel["rebuilds"] = int(nbrs.rebuilds)
    if cfg.obmd is not None:
        tel["ninserted"] = int(state.obmd.ninserted)
        tel["ndeleted"] = int(state.obmd.ndeleted)
        tel["insert_fail"] = int(state.obmd.insert_fail)
    bad = {k: tel[k] for k in ("cell_overflow", "layout_overflow",
                               "skin_trips") if tel.get(k)}
    if bad and raise_on_violation:
        raise RuntimeError(
            f"run invariants violated: {bad} — pair interactions were "
            f"dropped or stale (raise Capacity.cell_capacity / "
            f"max_neighbors, or lower rebuild_every). Full telemetry: {tel}")
    return tel
