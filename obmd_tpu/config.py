"""Typed configuration mirroring the reference's input surface.

`ObmdParams` mirrors the `fix obmd` argument list 1:1
(fix_obmd_merged.cpp:66-287 positional parsing, :1881-2164 keyword parsing;
README.ProgrammersManual.md:32-125), `DPDParams` mirrors
`pair_style dpd T rc seed` + `pair_coeff` (DPD-BASIC/pair_dpd.cpp:195,223),
and `LJCutRFParams` mirrors `pair_style lj/cut/rf` (pair_lj_cut_rf.cpp:227,254).

Any of the eight law parameters (pxx pxy pxz dpxx freq alpha tau nbuf) may be
a python callable `f(t) -> value` instead of a float — the counterpart of
LAMMPS equal-style `v_name` variables re-evaluated each pre_exchange
(fix_obmd_merged.cpp:563-572).  Callables are traced into the jitted step, so
they must be jnp-composable functions of the (traced) simulation time.

All configs are frozen dataclasses: hashable, usable as jit static args.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple, Union

import numpy as np

from .geometry import Box, RegionBlock

# A boundary-law parameter: constant or equal-style-variable analogue.
Param = Union[float, Callable]


def eval_param(p: Param, t):
    """Resolve a Param at simulation time t (traced)."""
    return p(t) if callable(p) else p


def _sym(table, ntypes, name):
    """Validate/symmetrize an (ntypes, ntypes) coefficient table."""
    arr = np.asarray(table, dtype=np.float64)
    if arr.shape == ():
        arr = np.full((ntypes, ntypes), float(arr))
    if arr.shape != (ntypes, ntypes):
        raise ValueError(f"{name} must be scalar or ({ntypes},{ntypes}), got {arr.shape}")
    if not np.allclose(arr, arr.T):
        raise ValueError(f"{name} table must be symmetric")
    return tuple(tuple(float(v) for v in row) for row in arr)


@dataclasses.dataclass(frozen=True)
class DPDParams:
    """`pair_style dpd T rc seed` + per-type-pair coeffs.

    Force law (pair_dpd.cpp:128-137):
      F = (a0*wd - gamma*wd^2*(rhat . dv)) * rhat + sigma*wd*xi/sqrt(dt)*rhat,
      wd = 1 - r/rc,  sigma = sqrt(2 kB T gamma)  (init_one, pair_dpd.cpp:283).
    Conservative energy (shifted to 0 at cutoff): 0.5*a0*rc*wd^2.
    """

    temp: float
    cutoff: float          # global cutoff (pair_style arg)
    seed: int
    ntypes: int = 1
    a0: Tuple[Tuple[float, ...], ...] = ()
    gamma: Tuple[Tuple[float, ...], ...] = ()
    cut: Tuple[Tuple[float, ...], ...] = ()   # per-pair cutoff (defaults to `cutoff`)
    gaussian_noise: bool = False  # validation path; default uniform (same variance)

    @staticmethod
    def create(temp, cutoff, seed, a0, gamma, cut=None, ntypes=1, gaussian_noise=False):
        cut = cutoff if cut is None else cut
        return DPDParams(
            temp=float(temp), cutoff=float(cutoff), seed=int(seed), ntypes=ntypes,
            a0=_sym(a0, ntypes, "a0"), gamma=_sym(gamma, ntypes, "gamma"),
            cut=_sym(cut, ntypes, "cut"), gaussian_noise=gaussian_noise)

    @property
    def sigma(self) -> Tuple[Tuple[float, ...], ...]:
        g = np.asarray(self.gamma)
        return tuple(tuple(float(v) for v in row)
                     for row in np.sqrt(2.0 * self.temp * g))

    @property
    def max_cut(self) -> float:
        return float(np.max(np.asarray(self.cut))) if self.cut else self.cutoff


@dataclasses.dataclass(frozen=True)
class DPDTstatParams:
    """`pair_style dpd/tstat T_start T_stop rc seed` — thermostat-only DPD
    (DPD-BASIC/pair_dpd_tstat.cpp): the DPD drag + random forces with NO
    conservative term, used to thermostat some other conservative field.
    Coeffs per type pair: gamma [cut] (pair_dpd_tstat.cpp:174-201).

    The reference ramps T linearly from t_start to t_stop over each run
    (:52-60, t_target from update->beginstep/endstep).  Here the ramp
    window is the static `ramp` = (begin_step, end_step) pair — the deck
    front end sets it per `run` command exactly like the reference; library
    users set it explicitly.  The noise amplitude scales as
    sqrt(T(step)/t_start) inside the jitted step (sigma = sqrt(2 kB T
    gamma), pair_dpd_tstat.cpp:96-101 recomputes sigma per step).
    """

    temp: float
    cutoff: float
    seed: int
    ntypes: int = 1
    gamma: Tuple[Tuple[float, ...], ...] = ()
    cut: Tuple[Tuple[float, ...], ...] = ()
    gaussian_noise: bool = False
    t_stop: Optional[float] = None        # None or == temp: constant T
    ramp: Optional[Tuple[int, int]] = None  # (begin_step, end_step)

    @staticmethod
    def create(t_start, cutoff, seed, gamma, t_stop=None, cut=None,
               ntypes=1, gaussian_noise=False, ramp=None):
        if (t_stop is not None and float(t_stop) != float(t_start)
                and float(t_start) <= 0.0):
            raise ValueError("dpd/tstat ramp needs t_start > 0 (the noise "
                             "scale is relative to t_start)")
        cut = cutoff if cut is None else cut
        return DPDTstatParams(
            temp=float(t_start), cutoff=float(cutoff), seed=int(seed),
            ntypes=ntypes, gamma=_sym(gamma, ntypes, "gamma"),
            cut=_sym(cut, ntypes, "cut"), gaussian_noise=gaussian_noise,
            t_stop=None if t_stop is None else float(t_stop),
            ramp=None if ramp is None else (int(ramp[0]), int(ramp[1])))

    @property
    def is_ramp(self) -> bool:
        return self.t_stop is not None and self.t_stop != self.temp

    @property
    def sigma(self) -> Tuple[Tuple[float, ...], ...]:
        g = np.asarray(self.gamma)
        return tuple(tuple(float(v) for v in row)
                     for row in np.sqrt(2.0 * self.temp * g))

    @property
    def max_cut(self) -> float:
        return float(np.max(np.asarray(self.cut))) if self.cut else self.cutoff


@dataclasses.dataclass(frozen=True)
class DPDExtParams:
    """`pair_style dpd/ext T rc seed` — extended DPD with transverse
    friction (DPD-BASIC/pair_dpd_ext.cpp:66-203):

      F = [a0*wd - gamma*wdPar^2 (rhat.dv)] rhat + sigma*wdPar*xi/sqrt(dt) rhat
          - gammaT*wdPerp^2 P.dv + sigmaT*wdPerp P.XI/sqrt(dt)
    with P = I - rhat rhat^T, wdPar = wd^ws, wdPerp = wd^wsT, XI a 3-vector
    of unit noises, sigma{,T} = sqrt(2 kB T gamma{,T}).
    Coeffs per type pair: a0 gamma gammaT ws wsT [cut] (:275-310).
    """

    temp: float
    cutoff: float
    seed: int
    ntypes: int = 1
    a0: Tuple[Tuple[float, ...], ...] = ()
    gamma: Tuple[Tuple[float, ...], ...] = ()
    gammaT: Tuple[Tuple[float, ...], ...] = ()
    ws: Tuple[Tuple[float, ...], ...] = ()
    wsT: Tuple[Tuple[float, ...], ...] = ()
    cut: Tuple[Tuple[float, ...], ...] = ()
    gaussian_noise: bool = False
    tstat_only: bool = False   # dpd/ext/tstat: drop the conservative term

    @staticmethod
    def create(temp, cutoff, seed, a0, gamma, gammaT, ws=1.0, wsT=1.0,
               cut=None, ntypes=1, gaussian_noise=False, tstat_only=False):
        cut = cutoff if cut is None else cut
        return DPDExtParams(
            temp=float(temp), cutoff=float(cutoff), seed=int(seed),
            ntypes=ntypes, a0=_sym(a0, ntypes, "a0"),
            gamma=_sym(gamma, ntypes, "gamma"),
            gammaT=_sym(gammaT, ntypes, "gammaT"),
            ws=_sym(ws, ntypes, "ws"), wsT=_sym(wsT, ntypes, "wsT"),
            cut=_sym(cut, ntypes, "cut"), gaussian_noise=gaussian_noise,
            tstat_only=tstat_only)

    @property
    def sigma(self) -> Tuple[Tuple[float, ...], ...]:
        g = np.asarray(self.gamma)
        return tuple(tuple(float(v) for v in row)
                     for row in np.sqrt(2.0 * self.temp * g))

    @property
    def sigmaT(self) -> Tuple[Tuple[float, ...], ...]:
        g = np.asarray(self.gammaT)
        return tuple(tuple(float(v) for v in row)
                     for row in np.sqrt(2.0 * self.temp * g))

    @property
    def max_cut(self) -> float:
        return float(np.max(np.asarray(self.cut))) if self.cut else self.cutoff


@dataclasses.dataclass(frozen=True)
class LJCutParams:
    """`pair_style lj/cut rc` + eps/sigma per type pair (12-6 LJ, energy
    shifted by the cutoff offset when shift=True)."""

    cutoff: float
    ntypes: int = 1
    epsilon: Tuple[Tuple[float, ...], ...] = ()
    sigma: Tuple[Tuple[float, ...], ...] = ()
    cut: Tuple[Tuple[float, ...], ...] = ()
    shift: bool = False

    @staticmethod
    def create(cutoff, epsilon, sigma, cut=None, ntypes=1, shift=False):
        cut = cutoff if cut is None else cut
        return LJCutParams(cutoff=float(cutoff), ntypes=ntypes,
                           epsilon=_sym(epsilon, ntypes, "epsilon"),
                           sigma=_sym(sigma, ntypes, "sigma"),
                           cut=_sym(cut, ntypes, "cut"), shift=shift)

    @property
    def max_cut(self) -> float:
        return float(np.max(np.asarray(self.cut))) if self.cut else self.cutoff


@dataclasses.dataclass(frozen=True)
class LJCutRFParams:
    """`pair_style lj/cut/rf rc_lj [rc_rf]`: 12-6 LJ plus reaction-field
    Coulomb (pair_lj_cut_rf.cpp:118-131 force, :163-171 energy):

      U_rf(r) = C q_i q_j [ 1/r (1 + (eps_rf-1)/(2 eps_rf+1) (r/rc)^3)
                            - 1/rc * 3 eps_rf/(2 eps_rf+1) ]
    with C = qqrd2e (1.0 in LJ units).
    """

    cut_lj: float
    cut_coul: float
    ntypes: int = 1
    epsilon: Tuple[Tuple[float, ...], ...] = ()
    sigma: Tuple[Tuple[float, ...], ...] = ()
    cut: Tuple[Tuple[float, ...], ...] = ()        # per-pair LJ cutoff
    eps_rf: Tuple[Tuple[float, ...], ...] = ()     # dielectric of the RF continuum
    qqrd2e: float = 1.0
    shift: bool = False

    @staticmethod
    def create(cut_lj, epsilon, sigma, eps_rf, cut_coul=None, cut=None, ntypes=1,
               qqrd2e=1.0, shift=False):
        cut_coul = cut_lj if cut_coul is None else cut_coul
        cut = cut_lj if cut is None else cut
        return LJCutRFParams(cut_lj=float(cut_lj), cut_coul=float(cut_coul), ntypes=ntypes,
                             epsilon=_sym(epsilon, ntypes, "epsilon"),
                             sigma=_sym(sigma, ntypes, "sigma"),
                             cut=_sym(cut, ntypes, "cut"),
                             eps_rf=_sym(eps_rf, ntypes, "eps_rf"),
                             qqrd2e=float(qqrd2e), shift=shift)

    @property
    def max_cut(self) -> float:
        mc = float(np.max(np.asarray(self.cut))) if self.cut else self.cut_lj
        return max(mc, self.cut_coul)


PairParams = Union[DPDParams, DPDTstatParams, DPDExtParams, LJCutParams,
                   LJCutRFParams]

BondParams = Union["BondFENEParams", "BondHarmonicParams"]


@dataclasses.dataclass(frozen=True)
class BondFENEParams:
    """`bond_style fene` (bench/in.chain: bond_coeff 1 30.0 1.5 1.0 1.0):
    U = -0.5 K R0^2 ln(1-(r/R0)^2) + WCA(eps, sigma).  `special_bonds fene`
    semantics are implied: 1-2 pairs are excluded from the pair style."""

    k: float = 30.0
    r0: float = 1.5
    epsilon: float = 1.0
    sigma: float = 1.0


@dataclasses.dataclass(frozen=True)
class BondHarmonicParams:
    """`bond_style harmonic` (bond_harmonic.cpp): E = K (r - r0)^2,
    fbond = -2 K (r - r0) / r.  The molecular default for inserted
    templates.  1-2 pairs are excluded from the pair style (the kernel's
    partner-tag exclusion); 1-3/1-4 pairs keep full pair interactions
    (`special_bonds lj/coul 0 1 1` semantics)."""

    k: float = 100.0
    r0: float = 1.0


@dataclasses.dataclass(frozen=True)
class AngleHarmonicParams:
    """`angle_style harmonic` (angle_harmonic.cpp): E = K (theta - theta0)^2
    per declared angle, theta0 in degrees.

    Storage is center-atom based (no separate angle array in the
    fixed-capacity state): an alive atom with TWO bond partners is the
    center of one angle between them when its atom TYPE has k > 0.  This
    covers chain/bent molecule templates (each angle (a1, a2, a3) must have
    bonds a1-a2 and a2-a3, and distinct center types cannot carry distinct
    angle coefficients — validated loudly at template load)."""

    k: Tuple[float, ...]        # per CENTER atom type; 0 = that type bends no angle
    theta0: Tuple[float, ...]   # degrees, per center atom type


@dataclasses.dataclass(frozen=True)
class ImproperHarmonicParams:
    """`improper_style harmonic` (improper_harmonic.cpp): E = K (chi -
    chi0)^2 per declared improper quadruple (i1, i2, i3, i4), chi0 in
    degrees, chi from the reference's dihedral-like construction over
    (x1-x2, x3-x2, x4-x3).

    Storage is center-atom based like angles: the quadruple's partner
    slots (i1, i3, i4) live in State.impr on the CENTER atom i2, and the
    coefficients are keyed by the center's atom TYPE (0 = no improper).
    The out-of-plane convention (center bonded to all three ends) is
    validated at load; each center carries at most one improper."""

    k: Tuple[float, ...]      # per CENTER atom type
    chi0: Tuple[float, ...]   # degrees, per center atom type


def derive_center_improper_table(ntypes: int, impropers, atom_types,
                                 coeffs) -> "ImproperHarmonicParams":
    """Per-CENTER-TYPE improper table from an explicit improper list
    (data file / molecule template `Impropers` section).

    impropers: [(improper_type, i1, i2, i3, i4)] (i2 = center); atom_types:
    {id: 0-based type}; coeffs: {improper_type: (K, chi0_deg)}.  Distinct
    coefficient sets on one center type are refused loudly (same storage
    rule as the angle table)."""
    k = [0.0] * ntypes
    x0 = [0.0] * ntypes
    for itype, _i1, i2, _i3, _i4 in impropers:
        ct = int(atom_types[int(i2)])
        if int(itype) not in coeffs:
            raise ValueError(f"no improper_coeff for improper type {itype}")
        kk, chi = coeffs[int(itype)]
        if k[ct] not in (0.0, float(kk)) or (k[ct] != 0.0
                                             and x0[ct] != float(chi)):
            raise ValueError(
                f"center atom type {ct + 1} would carry two different "
                "improper coefficient sets — unsupported by the "
                "center-atom improper storage")
        k[ct] = float(kk)
        x0[ct] = float(chi)
    return ImproperHarmonicParams(k=tuple(k), chi0=tuple(x0))


@dataclasses.dataclass(frozen=True)
class TemplateStacks:
    """Static numpy stacks of all insertion templates, padded to the
    largest natoms (multi-template molfrac machinery; pad rows are masked
    by `amask` and land at BIG in candidate coordinates)."""

    dx: "np.ndarray"       # [T, m, 3]
    amask: "np.ndarray"    # [T, m] bool
    types: "np.ndarray"    # [T, m] 0-based engine types (ntype applied)
    q: "np.ndarray"        # [T, m]
    rep: "np.ndarray"      # [T, m] rep_atom flags
    natoms: "np.ndarray"   # [T]
    pidx: "np.ndarray"     # [T, m, 4] intra-template partner indices (-1)
    iidx: "np.ndarray"     # [T, m, 3] intra-template improper end indices
                           #   (i1, i3, i4) stored on the center atom (-1)
    frac: "np.ndarray"     # [T] selection probabilities

    @property
    def branched(self) -> bool:
        """Any template atom with >2 bond partners (bond3/4 columns live)."""
        return bool((self.pidx[:, :, 2] >= 0).any())

    @property
    def has_impropers(self) -> bool:
        return bool((self.iidx >= 0).any())


def template_stacks(obmd) -> TemplateStacks:
    tpls = obmd.templates
    T = len(tpls)
    m = obmd.mol_natoms_max
    dx = np.zeros((T, m, 3))
    am = np.zeros((T, m), bool)
    ty = np.zeros((T, m), np.int64)
    q = np.zeros((T, m))
    rep = np.zeros((T, m), np.int64)
    nat = np.zeros((T,), np.int64)
    pidx = np.full((T, m, 4), -1, np.int64)
    iidx = np.full((T, m, 3), -1, np.int64)
    for t, tpl in enumerate(tpls):
        mt = tpl.natoms
        nat[t] = mt
        dx[t, :mt] = np.asarray(tpl.dx)
        am[t, :mt] = True
        ty[t, :mt] = np.asarray(tpl.types) + int(obmd.ntype)
        if len(tpl.q):
            q[t, :mt] = np.asarray(tpl.q)
        if getattr(tpl, "rep_atom", None):
            rep[t, int(tpl.rep_atom) - 1] = 1
        for a, b in tpl.bonds:
            for me_, other in ((a, b), (b, a)):
                for s in range(4):
                    if pidx[t, me_, s] < 0:
                        pidx[t, me_, s] = other
                        break
                else:
                    raise ValueError("template atom in >4 bonds")
        for _it, i1, i2, i3, i4 in getattr(tpl, "impropers", ()):
            prt = {int(p) for p in pidx[t, i2] if p >= 0}
            for e in (i1, i3, i4):
                if int(e) not in prt:
                    raise ValueError(
                        f"template improper ({i1},{i2},{i3},{i4}): center "
                        f"{i2} is not bonded to {e} — only the "
                        "out-of-plane convention is stored per-center")
            if iidx[t, i2, 0] >= 0:
                raise ValueError(
                    f"template atom {i2} is the center of two impropers")
            iidx[t, i2] = (i1, i3, i4)
    frac = (np.asarray(obmd.molfrac, np.float32)
            if obmd.molfrac is not None
            else np.full((T,), 1.0 / T, np.float32))
    return TemplateStacks(dx=dx, amask=am, types=ty, q=q, rep=rep,
                          natoms=nat, pidx=pidx, iidx=iidx, frac=frac)


def derive_center_angle_table(ntypes: int, angles, atom_types, bonds,
                              coeffs) -> "AngleHarmonicParams":
    """Build the per-CENTER-ATOM-TYPE angle table from an explicit angle
    list (data file `Angles` section or a molecule template).

    angles: [(angle_type, a1, a2, a3)] with a* = atom ids (any consistent
    id space); atom_types: {id: 0-based type}; bonds: iterable of (i, j)
    id pairs; coeffs: {angle_type: (K, theta0_deg)}.

    Validates the storage scheme's assumptions loudly: each angle's arms
    must be bonds, a center type cannot carry two different coefficient
    sets, and every multi-bond atom of a covered type must declare ALL
    partner-pair angles (the runtime bends every pair of a covered
    center's partners — the star-polymer convention; a partial angle set
    on one center would spuriously bend the undeclared pairs)."""
    bond_set = set()
    deg: dict = {}
    for i, j in bonds:
        bond_set.add((int(i), int(j)))
        bond_set.add((int(j), int(i)))
        deg[int(i)] = deg.get(int(i), 0) + 1
        deg[int(j)] = deg.get(int(j), 0) + 1
    k = [0.0] * ntypes
    t0 = [0.0] * ntypes
    centers: dict = {}
    for atype, a1, a2, a3 in angles:
        a1, a2, a3 = int(a1), int(a2), int(a3)
        if (a1, a2) not in bond_set or (a2, a3) not in bond_set:
            raise ValueError(
                f"angle ({a1},{a2},{a3}): arms must be bonds for the "
                "center-atom angle storage")
        ct = int(atom_types[a2])
        if int(atype) not in coeffs:
            raise ValueError(f"no angle_coeff for angle type {atype}")
        kk, th = coeffs[int(atype)]
        if k[ct] not in (0.0, float(kk)) or (k[ct] != 0.0
                                             and t0[ct] != float(th)):
            raise ValueError(
                f"center atom type {ct + 1} would carry two different "
                "angle coefficient sets — unsupported by the "
                "center-atom angle storage")
        k[ct] = float(kk)
        t0[ct] = float(th)
        centers.setdefault(a2, set()).add(frozenset((a1, a3)))
    for a, d in deg.items():
        if d > 4:
            raise ValueError("topology limit: <= 4 bonds/atom")
        if d >= 2 and k[int(atom_types[a])] > 0:
            want = d * (d - 1) // 2
            got = len(centers.get(a, ()))
            if got != want:
                raise ValueError(
                    f"atom {a} has {d} bonds and a covered center type but "
                    f"declares {got} of its {want} partner-pair angles — "
                    "the center-atom storage bends EVERY pair of a covered "
                    "center's partners, so all (or none) must be declared")
    return AngleHarmonicParams(k=tuple(k), theta0=tuple(t0))


@dataclasses.dataclass(frozen=True)
class DihedralHarmonicParams:
    """`dihedral_style harmonic` (dihedral_harmonic.cpp):
    E = K [1 + d cos(n phi)] per dihedral, d = +-1, n >= 1.

    Storage is center-BOND based (no dihedral array in the fixed-capacity
    state): every bonded pair (j, k) where BOTH atoms have two bond
    partners spans one dihedral i-j-k-l with i/l the other partners --
    exactly the chain-topology quadruples.  One coefficient set (single
    dihedral type); templates/data files declaring dihedrals are
    validated to match the implicit chain quadruples."""

    k: float
    d: int = 1
    n: int = 1

    def __post_init__(self):
        if self.d not in (1, -1):
            raise ValueError("dihedral harmonic: d must be +1 or -1")
        if self.n < 1:
            raise ValueError("dihedral harmonic: n must be >= 1")


@dataclasses.dataclass(frozen=True)
class ShakeParams:
    """SHAKE/RATTLE distance constraints (RIGID/fix_shake.cpp analogue;
    reached through fix obmd's `shake <fix-ID>` keyword,
    fix_obmd_merged.cpp:1163-1168).

    d0: [ntypes, ntypes] target distances keyed by the endpoint atom
    types (0 = that pair is unconstrained) — the analogue of fix shake's
    `b <btypes> a <atypes>` lists resolving to bond/angle-coefficient
    distances.  Built from the insertion template's own geometry by
    shake_table_from_templates."""

    d0: Tuple[Tuple[float, ...], ...]
    iters: int = 30          # Jacobi position sweeps per step (unrolled)
    vel_iters: int = 10      # RATTLE velocity sweeps per kick

    def __post_init__(self):
        a = np.asarray(self.d0, dtype=np.float64)
        if a.ndim != 2 or a.shape[0] != a.shape[1]:
            raise ValueError("shake d0 must be a square [ntypes, ntypes]")
        if not np.allclose(a, a.T):
            raise ValueError("shake d0 must be symmetric")


def shake_table_from_templates(templates, ntypes: int,
                               **kw) -> "ShakeParams":
    """Derive the constraint table from template bonded pairs: every bonded
    (i, j) constrains |x_i - x_j| to the template's own distance, keyed by
    the endpoint types.  Conflicting distances for the same type pair are
    an error (distinguish the types in the template, exactly like the
    reference requires distinct bond types for distinct lengths)."""
    d0 = np.zeros((ntypes, ntypes), dtype=np.float64)
    for t in templates:
        dx = np.asarray(t.dx, dtype=np.float64)
        types = list(t.types) if t.types else [0] * t.natoms
        for a, b in t.bonds:
            d = float(np.linalg.norm(dx[a] - dx[b]))
            ta, tb = types[a], types[b]
            for i, j in ((ta, tb), (tb, ta)):
                if d0[i, j] > 0 and abs(d0[i, j] - d) > 1e-10:
                    raise ValueError(
                        f"shake: type pair ({i},{j}) carries two different "
                        f"template distances ({d0[i, j]} vs {d}); give the "
                        "atoms distinct types")
                d0[i, j] = d
    return ShakeParams(d0=tuple(tuple(row) for row in d0), **kw)


@dataclasses.dataclass(frozen=True)
class LangevinParams:
    """`fix langevin T T damp seed` (fix_langevin.cpp semantics):
    f += -(m/damp) v + sqrt(24 kB T m / (damp dt)) * uniform(-0.5, 0.5),
    with counter-based per-(atom, step) deviates here."""

    temp: float
    damp: float
    seed: int = 904297


@dataclasses.dataclass(frozen=True)
class MolTemplate:
    """Static molecule template for molecule-mode insertion (the reference's
    `mol template mol_len` keyword, fix_obmd_merged.cpp:2039-2054, with the
    template file parsed by io.molecule.read_molecule).

    dx: per-atom displacements from the insertion anchor (the geometric
    center, Molecule::compute_center / ref :216).  bonds: 0-based intra-
    molecule atom index pairs (each atom in <= 2 bonds).
    """

    dx: Tuple[Tuple[float, float, float], ...]
    types: Tuple[int, ...] = ()
    q: Tuple[float, ...] = ()
    bonds: Tuple[Tuple[int, int], ...] = ()
    # declared angles, (angle_type, a1, a2, a3) with 0-based atom indices —
    # consumed by derive_center_angle_table when the deck defines an
    # angle_style (molecule.cpp's Angles section)
    angles: Tuple[Tuple[int, int, int, int], ...] = ()
    # declared dihedrals, (type, a1..a4) 0-based (molecule.cpp Dihedrals)
    dihedrals: Tuple[Tuple[int, int, int, int, int], ...] = ()
    # declared impropers, (type, i1..i4) 0-based, i2 = center
    # (molecule.cpp Impropers section)
    impropers: Tuple[Tuple[int, int, int, int, int], ...] = ()

    @property
    def natoms(self) -> int:
        return len(self.dx)

    @staticmethod
    def from_file(path: str) -> "MolTemplate":
        from .io.molecule import read_molecule
        m = read_molecule(path)
        return MolTemplate(
            dx=tuple(tuple(float(v) for v in row) for row in m.dx),
            types=tuple(int(t) for t in m.types),
            q=tuple(float(v) for v in (m.q if m.q is not None
                                       else np.zeros(m.natoms))),
            bonds=tuple((int(a) - 1, int(b) - 1)
                        for _t, a, b in (m.bonds if m.bonds is not None
                                         else [])),
            angles=tuple((int(t), int(a) - 1, int(b) - 1, int(c) - 1)
                         for t, a, b, c in (m.angles if m.angles is not None
                                            else [])),
            dihedrals=tuple(
                (int(t), int(a) - 1, int(b) - 1, int(c) - 1, int(e) - 1)
                for t, a, b, c, e in (m.dihedrals
                                      if m.dihedrals is not None else [])),
            impropers=tuple(
                (int(t), int(a) - 1, int(b) - 1, int(c) - 1, int(e) - 1)
                for t, a, b, c, e in (getattr(m, "impropers", None)
                                      if getattr(m, "impropers", None)
                                      is not None else [])))


@dataclasses.dataclass(frozen=True)
class UsherParams:
    """`usher etarget ds0 dtheta0 uovlp dsolvp eps nattempt`
    (fix_obmd_merged.cpp:2025-2038; algorithm at :1518-1616)."""

    etarget: float
    ds0: float = 1.0
    dtheta0: float = 0.02
    uovlp: float = 1.0e4
    dsovlp: float = 1.5
    eps: float = 1.0
    nattempt: int = 40


@dataclasses.dataclass(frozen=True)
class ObmdParams:
    """Mirror of `fix ID group obmd ntype nfreq seed pxx pxy pxz dpxx freq
    alpha tau nbuf [keywords]` (fix_obmd_merged.cpp:66-287).

    region1/2: left/right buffer (normal-force + census + deletion tally),
    region3/4: left/right shear sub-regions (Heaviside weights),
    region5/6: left/right insertion sub-regions.  All six are required by the
    reference's init() (:421-438).
    """

    ntype: int                 # type of inserted particles (0-based here)
    nfreq: int
    seed: int
    pxx: Param
    pxy: Param = 0.0
    pxz: Param = 0.0
    dpxx: Param = 0.0
    freq: Param = 0.0
    alpha: Param = 0.7
    tau: Param = 0.005
    nbuf: Param = 0.0

    region1: Optional[RegionBlock] = None   # left buffer
    region2: Optional[RegionBlock] = None   # right buffer
    region3: Optional[RegionBlock] = None   # left shear
    region4: Optional[RegionBlock] = None   # right shear
    region5: Optional[RegionBlock] = None   # left insertion
    region6: Optional[RegionBlock] = None   # right insertion

    # the fix's GROUP (`fix ID group obmd ...`): census counts only group
    # members (group.cpp:793 count(igroup, region)); None = all.  Stored
    # as 0-based atom types (the deck's type-based `group` command).
    # NOTE the reference's reg_force ignores the group (ref :1414) — the
    # boundary force deliberately stays group-blind here too.
    group_types: Optional[Tuple[int, ...]] = None

    buffer_size: float = 0.0   # default 0.3*Lx applied in SceneConfig.finalize
    g_fac: float = 0.25
    step_parallel: int = 0     # only 0 (smooth) accepted (:2013)
    step_perp: int = 1         # only 1 (Heaviside) accepted (:2019)
    maxattempt: int = 1

    usher: Optional[UsherParams] = None
    near: Optional[float] = None    # `near 1 dist` -> minimum allowed distance
    charged: bool = False
    mol_len: int = 1                # atoms per inserted entity (= mol.natoms)
    mol: Optional[MolTemplate] = None  # molecule-mode insertion template
    # multi-template insertion (the reference's multi-molecule template +
    # `molfrac f1..fN`, fix_obmd_merged.cpp:2039-2054 onemols/molfrac):
    # `mols` lists ALL templates (when set, `mol` must be mols[0]);
    # `molfrac` gives their selection probabilities (default: uniform).
    mols: Tuple[MolTemplate, ...] = ()
    molfrac: Optional[Tuple[float, ...]] = None

    # Batched-insertion capacity: max candidates evaluated per buffer per
    # pre_exchange (the TPU replacement for the reference's sequential
    # ninsert x maxattempt loop; SURVEY.md §7 stage 5).
    insert_kmax: int = 8

    # deposit-inherited keywords (parsing at fix_obmd_merged.cpp:2055-2159):
    # `gaussian xmid ymid zmid sigma` — candidates drawn normally around a
    # point (ref :930-932) instead of uniformly in the insertion region;
    # draws landing outside the region are rejected.
    gaussian: Optional[Tuple[float, float, float, float]] = None
    # `orient rx ry rz` — fixed molecule rotation AXIS (angle stays
    # uniform, ref :1001-1016).
    orient: Optional[Tuple[float, float, float]] = None
    # `rigid <fix-ID>` — integrate template molecules as rigid bodies
    # (ref :475-500 hands inserted molecules to a rigid fix; here the
    # engine integrates every mol != 0 atom rigidly via obmd_tpu.rigid).
    rigid: bool = False
    # `shake <fix-ID>` — constrain inserted molecules' bonded distances
    # with SHAKE/RATTLE (ref :1163-1168 hands inserted molecules to a
    # SHAKE fix; here SceneConfig.finalize derives the constraint table
    # from the template geometry and obmd_tpu.shake enforces it).
    shake: bool = False
    # fix-deposit z-offset keywords (ref :880 rate, :947-985 global/
    # local): `rate r` shifts candidate z linearly in simulation time;
    # `global lo hi` resets candidate z to lo..hi above the highest alive
    # atom; `local lo hi delta` above the highest atom within lateral
    # (x,y) distance delta of the candidate.
    deposit_global: Optional[Tuple[float, float]] = None
    deposit_local: Optional[Tuple[float, float, float]] = None
    rate: Optional[float] = None
    # `id next|max` — tag policy: "next" counts up from the running
    # maximum (never reuses ids); "max" recomputes the max over alive
    # atoms each stage call, reusing ids freed by deletion (ref :911
    # find_maxid vs :270).
    id_policy: str = "next"
    # `vx lo hi` / `vy lo hi` / `vz lo hi` — inserted-particle velocity
    # components drawn uniformly (fix-deposit semantics; parsing at ref
    # :2118-2130).  NOTE the reference's insertion body hardcodes
    # vnew = 0 (":1076-1078, 'for now inserting with zero velocity'"), so
    # these keywords are dead code there; here they are honored, with the
    # inserted momentum entering the boundary-force tally.  None = at rest
    # (bitwise the reference default).
    vx: Optional[Tuple[float, float]] = None
    vy: Optional[Tuple[float, float]] = None
    vz: Optional[Tuple[float, float]] = None
    # `target tx ty tz` — redirect each inserted velocity toward a target
    # point, preserving its magnitude (ref :1081-1093).
    target: Optional[Tuple[float, float, float]] = None

    @property
    def templates(self) -> Tuple[MolTemplate, ...]:
        """All insertion templates (singleton for the single-`mol` case)."""
        if self.mols:
            return self.mols
        return (self.mol,) if self.mol is not None else ()

    @property
    def mol_natoms_max(self) -> int:
        return max((t.natoms for t in self.templates), default=0)

    def __post_init__(self):
        if (self.usher is None) == (self.near is None):
            raise ValueError("exactly one of `usher` / `near` must be given "
                             "(fix_obmd_merged.cpp:2105,2163)")
        if self.charged and self.mol is None:
            raise ValueError("`charged 1` requires MOLECULE-mode insertion "
                             "(fix_obmd_merged.cpp:2108-2112)")
        if self.mols:
            if self.mol is not self.mols[0]:
                raise ValueError("`mols` given: `mol` must be mols[0]")
            if self.molfrac is not None:
                if len(self.molfrac) != len(self.mols):
                    raise ValueError("molfrac needs one fraction per "
                                     "template (ref :2045-2052)")
                s = float(sum(self.molfrac))
                if not 0.999 <= s <= 1.001:
                    raise ValueError(f"molfrac must sum to 1 (got {s})")
        elif self.molfrac is not None:
            raise ValueError("molfrac without multiple templates")
        if self.rigid and self.mol is None:
            raise ValueError("`rigid` requires MOLECULE-mode insertion "
                             "(fix_obmd_merged.cpp:475-500)")
        if self.shake and self.mol is None:
            raise ValueError("`shake` requires MOLECULE-mode insertion "
                             "(fix_obmd_merged.cpp:1163-1168)")
        if self.shake and self.rigid:
            raise ValueError("`rigid` and `shake` are mutually exclusive "
                             "(a molecule is handed to one fix, not both)")
        for name in ("region1", "region2", "region5", "region6"):
            if getattr(self, name) is None:
                raise ValueError(
                    f"fix obmd: `{name}` is required "
                    "(fix_obmd_merged.cpp init() :421-438)")
        # The reference requires the shear sub-regions too, but its example
        # deck passes zero-extent blocks (input.py:90-91).  A missing
        # region3/4 is accepted as the zero-extent case — valid only while
        # no shear stress is requested (a callable pxy/pxz cannot be
        # checked at build time, so it requires the regions).
        if self.deposit_global is not None and self.deposit_local is not None:
            raise ValueError("global and local are mutually exclusive "
                             "(fix_obmd_merged.cpp:2088-2095)")
        if self.region3 is None or self.region4 is None:
            for name in ("pxy", "pxz"):
                v = getattr(self, name)
                if callable(v) or float(v) != 0.0:
                    raise ValueError(
                        "fix obmd: shear stress needs region3/region4 "
                        "(fix_obmd_merged.cpp:1452-1516)")


@dataclasses.dataclass(frozen=True)
class Capacity:
    """Static shapes for the fixed-capacity state, cell grid, and lists."""

    n_max: int                 # particle slots
    cell_capacity: int = 16    # max atoms per cell (overflow detected)
    max_neighbors: int = 48    # K: Verlet-list row capacity (nlist path)
    movers_max: int = 1024     # per-step incremental cell movers
    insert_region_max: int = 0  # B: atoms near an insertion region
                                # (0 = auto: n_max // 3)

    def __post_init__(self):
        if self.n_max <= 0 or self.cell_capacity <= 0:
            raise ValueError("capacities must be positive")


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Everything needed to jit one MD step: box, masses, pair style, dt,
    optional OBMD stage, and static capacities."""

    box: Box
    masses: Tuple[float, ...]       # per type (index 0 = type 0)
    pair: PairParams
    dt: float
    capacity: Capacity
    obmd: Optional[ObmdParams] = None
    bond: Optional["BondParams"] = None     # bond style (topology in State)
    angle: Optional[AngleHarmonicParams] = None
    dihedral: Optional[DihedralHarmonicParams] = None
    improper: Optional[ImproperHarmonicParams] = None
    # fix rigid analogue: integrate every mol != 0 atom as a rigid body
    # (obmd_tpu.rigid; implied by fix obmd's `rigid` keyword)
    rigid: bool = False
    # fix shake analogue: SHAKE/RATTLE distance constraints over the bond
    # columns (obmd_tpu.shake; implied by fix obmd's `shake` keyword,
    # where finalize() derives the table from the insertion template)
    shake: Optional[ShakeParams] = None
    langevin: Optional[LangevinParams] = None
    skin: float = 0.3               # Verlet-list skin; cells sized cut+skin.
                                    # skin=0 -> rebuild every step.
    force_path: str = "nlist"       # "nlist" (fast: persistent Verlet list)
                                    # or "sweep" (cell-pair reference path)
    rebuild_every: int = 0          # cellpad runner: relayout period (static
                                    # schedule, no lax.cond in the hot loop);
                                    # 0 = auto from skin/dt; half-skin
                                    # violations are counted, not reacted to
                                    # (PadAux.skin_trips must stay 0).
    dtype: str = "float32"
    # Relayout field hints: whether per-atom charge / molecule-id fields can
    # carry non-constant values (atom_style charge|full|adress sets charge;
    # bond|molecular|adress|full set mol).  None = derive from the pair
    # style / OBMD / bonded config.  Constant fields skip their relayout
    # row-moves entirely (engine_cellpad.relayout_flags).
    per_atom_charge: Optional[bool] = None
    per_atom_mol: Optional[bool] = None
    # Branched topology (>2 bonds/atom somewhere in the scene): sizes the
    # pair kernel's bonded-exclusion channels and makes init_state allocate
    # the bond3/bond4 (and impr, with `improper`) columns even when the
    # initial atoms are chain-only (insertion templates may be branched).
    # finalize() turns this on automatically from the OBMD templates; set
    # it explicitly for branched data files.
    branched_topology: bool = False

    @property
    def ntypes(self) -> int:
        return len(self.masses)

    def finalize(self) -> "SceneConfig":
        """Apply reference defaults that depend on other fields
        (buffersize default 0.3*Lx, fix_obmd_merged.cpp:1912; fix obmd
        `rigid` enables the scene-level rigid integrator)."""
        out = self
        if out.obmd is not None and out.obmd.buffer_size == 0.0:
            lx = out.box.lengths[0]
            obmd = dataclasses.replace(out.obmd, buffer_size=0.3 * lx)
            out = dataclasses.replace(out, obmd=obmd)
        if out.obmd is not None and out.obmd.rigid and not out.rigid:
            out = dataclasses.replace(out, rigid=True)
        if (out.obmd is not None and out.obmd.mol is not None
                and not out.branched_topology):
            ts = template_stacks(out.obmd)
            if ts.branched:
                out = dataclasses.replace(out, branched_topology=True)
        if (out.obmd is not None and out.obmd.shake
                and out.shake is None):
            out = dataclasses.replace(out, shake=shake_table_from_templates(
                out.obmd.templates, out.ntypes))
        if out.shake is not None and out.rigid:
            raise ValueError("rigid and shake are mutually exclusive")
        if out.shake is not None and len(out.shake.d0) != out.ntypes:
            raise ValueError(
                f"shake d0 table is {len(out.shake.d0)} types, scene has "
                f"{out.ntypes}")
        return out
