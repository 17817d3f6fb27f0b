"""Canonical scene builders mirroring the reference example decks.

`obmd_dpd_scene` reproduces examples/OBMD_DPD/input.py:17-124 (the in-file
generator): DPD fluid at rho=3, T=1 with open x-boundaries, constant normal
load pxx on both buffers, USHER insertion.  `scale` stretches the box in x
(the scaling axis of this workload, SURVEY.md §5) — scale=8 gives the ~100k
particle north-star config.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .config import (Capacity, DPDParams, LJCutParams, ObmdParams, SceneConfig,
                     UsherParams)
from .geometry import Box, RegionBlock
from .state import State, init_state


@dataclasses.dataclass
class Scene:
    cfg: SceneConfig
    state: State


def obmd_dpd_config(scale: float = 1.0, n_max: Optional[int] = None,
                    nbuf: Optional[float] = None, usher: bool = True,
                    dtype: str = "float32",
                    cell_capacity: int = 24,
                    insert_kmax: int = 16,
                    skin: float = 0.39,
                    force_path: str = "cellpad") -> SceneConfig:
    """The OBMD_DPD deck (input.py values), box stretched `scale`x in x."""
    xhi = 33.594 * scale
    yhi = zhi = 11.198
    rho = 3.0
    buffer_size = 0.15 * 33.594 * scale  # 0.15*Lx as in input.py:56
    n_expected = int(rho * xhi * yhi * zhi)
    if n_max is None:
        n_max = int(n_expected * 1.25)
    if nbuf is None:
        # input.py:47 uses 1327 for the base box = rho*Vbuf*alpha-ish anchor;
        # scale with buffer volume.
        nbuf = 1327.0 * scale

    box = Box((0.0, 0.0, 0.0), (xhi, yhi, zhi), (False, True, True))
    r1 = RegionBlock((0.0, 0.0, 0.0), (buffer_size, yhi, zhi))
    r2 = RegionBlock((xhi - buffer_size, 0.0, 0.0), (xhi, yhi, zhi))
    degenerate = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    r5 = RegionBlock((0.0, 0.0, 0.0), (buffer_size, yhi, zhi))
    r6 = RegionBlock((xhi - buffer_size, 0.0, 0.0), (xhi, yhi, zhi))

    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=2349852,
                            a0=209.6, gamma=4.5, ntypes=1)

    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=872634,
        pxx=188.0, pxy=0.0, pxz=0.0, dpxx=0.0, freq=0.0,
        alpha=0.7, tau=0.005, nbuf=float(nbuf),
        region1=r1, region2=r2, region3=degenerate, region4=degenerate,
        region5=r5, region6=r6,
        buffer_size=buffer_size, g_fac=0.25,
        maxattempt=1,
        usher=UsherParams(etarget=31.03, ds0=1.0, dtheta0=0.02, uovlp=1e4,
                          dsovlp=1.5, eps=1.0, nattempt=40) if usher else None,
        near=None if usher else 0.35,
        insert_kmax=insert_kmax,
    )

    return SceneConfig(
        box=box, masses=(1.0,), pair=pair, dt=0.001464,
        # max_neighbors: rho=3 within r=cut+skin=1.39 averages ~34
        # neighbors; the default 48 clips the tail (silently-counted row
        # overflow drops real pairs on the nlist path), 72 clears it
        capacity=Capacity(n_max=n_max, cell_capacity=cell_capacity,
                          max_neighbors=72),
        obmd=obmd, dtype=dtype, force_path=force_path,
        # 0.39 keeps the cell grid at ny=nz=8 (s=64 divides the 128 lanes,
        # p=2 — the zero-padding-waste packing) while widening the
        # half-skin drift budget enough for a ~13-step static relayout
        # period with margin (see engine_cellpad.auto_rebuild_every).
        skin=skin,
    ).finalize()


def obmd_dpd_scene(scale: float = 1.0, seed: int = 12345,
                   temp: float = 1.0, **kwargs) -> Scene:
    """Config + a freshly drawn uniform gas initial state at rho=3 with
    Maxwell-Boltzmann velocities at `temp` (the reference data file is a
    pre-equilibrated fluid; DPD fluids equilibrate from uniform in O(1k)
    steps)."""
    cfg = obmd_dpd_config(scale=scale, **kwargs)
    rng = np.random.default_rng(seed)
    lo = np.asarray(cfg.box.lo)
    hi = np.asarray(cfg.box.hi)
    n = int(3.0 * cfg.box.volume)
    x = rng.uniform(lo, hi, (n, 3))
    v = rng.normal(0.0, np.sqrt(temp), (n, 3))
    v -= v.mean(axis=0)  # zero net momentum
    state = init_state(cfg, x, v=v, seed=seed)
    return Scene(cfg=cfg, state=state)


def lj_melt_scene(nx: int = 20, dtype: str = "float32",
                  force_path: str = "cellpad", skin: float = 0.55,
                  cell_capacity: int = 36,
                  rebuild_every: int = 0) -> Scene:
    """The reference's headline benchmark: LJ melt (code/bench/in.lj) —
    fcc lattice at rho* = 0.8442, 4*nx^3 atoms (nx=20 -> 32,000 like the
    published logs), T0 = 1.44, rc = 2.5, dt = 0.005, NVE."""
    rho = 0.8442
    a = (4.0 / rho) ** (1.0 / 3.0)          # fcc lattice constant
    L = nx * a
    box = Box((0.0, 0.0, 0.0), (L, L, L), (True, True, True))
    # fcc basis
    basis = np.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                        [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]])
    cells = np.stack(np.meshgrid(np.arange(nx), np.arange(nx),
                                 np.arange(nx), indexing="ij"),
                     axis=-1).reshape(-1, 1, 3)
    x = ((cells + basis[None, :, :]) * a).reshape(-1, 3)
    n = len(x)
    rng = np.random.default_rng(87287)
    v = rng.normal(0.0, np.sqrt(1.44), (n, 3))
    v -= v.mean(axis=0)
    pair = LJCutParams.create(cutoff=2.5, epsilon=1.0, sigma=1.0)
    # skin 0.55 keeps the SAME 11^3 cell grid as the reference's
    # `neighbor 0.3 bin` (cells are floor(L/rlist) wide either way) while
    # doubling the half-skin drift budget -> half the relayout epochs;
    # skin only affects validity/perf, never the physics.
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.005,
                      capacity=Capacity(n_max=n,
                                        cell_capacity=cell_capacity),
                      obmd=None, skin=skin, dtype=dtype,
                      rebuild_every=rebuild_every,
                      force_path=force_path)
    return Scene(cfg=cfg, state=init_state(cfg, x, v=v))


def chain_scene(data_path: str = "/root/reference/code/bench/data.chain",
                force_path: str = "cellpad", skin: float = 0.98,
                cell_capacity: int = 18) -> Scene:
    """The reference's chain headline benchmark (bench/in.chain): FENE
    bead-spring melt — 32k beads, WCA pair (lj/cut 1.12 shifted, 1-2 pairs
    excluded per `special_bonds fene`), bond fene 30.0 1.5 1.0 1.0,
    Langevin thermostat T=1 damp=10, dt=0.012.

    cell_capacity 18 is occupancy-tight for this melt (measured max cell
    occupancy 18 over 2k steps at skin 0.98; cap 17 overflows).  Overflow
    is loud — observe.check_invariants raises — so raise the cap if a
    longer run ever trips it."""
    from .config import BondFENEParams, LangevinParams
    from .io.lammps_data import read_data
    df = read_data(data_path, atom_style="bond")
    box = df.box(periodic=(True, True, True))
    pair = LJCutParams.create(cutoff=1.12, epsilon=1.0, sigma=1.0,
                              shift=True)
    cfg = SceneConfig(
        box=box, masses=(1.0,), pair=pair, dt=0.012,
        capacity=Capacity(n_max=df.natoms, cell_capacity=cell_capacity),
        bond=BondFENEParams(k=30.0, r0=1.5, epsilon=1.0, sigma=1.0),
        langevin=LangevinParams(temp=1.0, damp=10.0, seed=904297),
        skin=skin, force_path=force_path)
    state = init_state(cfg, df.x, v=df.v, types=df.types, tags=df.tags,
                       mol=df.mol, bonds=df.bonds)
    return Scene(cfg=cfg, state=state)


def closed_dpd_scene(n: int = 3000, box_l: float = 10.0, seed: int = 0,
                     temp: float = 1.0, n_max: Optional[int] = None,
                     dtype: str = "float32") -> Scene:
    """Closed-box (fully periodic) DPD fluid — Milestone A validation
    (SURVEY.md §7 stage 4): NVE + DPD thermostat must hold T at `temp`."""
    box = Box((0.0, 0.0, 0.0), (box_l, box_l, box_l), (True, True, True))
    pair = DPDParams.create(temp=temp, cutoff=1.0, seed=90823,
                            a0=25.0, gamma=4.5, ntypes=1)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.04,
                      capacity=Capacity(n_max=n_max or n, cell_capacity=24),
                      obmd=None, dtype=dtype)
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, box_l, (n, 3))
    v = rng.normal(0, np.sqrt(temp), (n, 3))
    v -= v.mean(axis=0)
    return Scene(cfg=cfg, state=init_state(cfg, x, v=v, seed=seed))
