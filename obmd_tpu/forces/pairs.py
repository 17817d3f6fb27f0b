"""Pair styles and the cell-pair force sweep.

TPU-native counterpart of the reference's pair layer:
  * DPD          — DPD-BASIC/pair_dpd.cpp:66-163 (force terms :128-137)
  * LJ cut       — standard 12-6 LJ (pair_lj_cut.cpp family)
  * LJ cut + RF  — pair_lj_cut_rf.cpp:68-225 (reaction-field Coulomb)

Design (SURVEY.md §7): full-neighbor evaluation over a dense cell table —
every pair computed from both sides, forces accumulated on the i-side only,
so there is no scatter-add in the inner loop and no reverse_comm analogue.
Newton consistency of the DPD random force comes from the pair-symmetric
counter-based noise (rng.pair_noise), not from owner-draws-once like the
reference (pair_dpd.cpp:207 + comm reverse; SURVEY.md §3.5 note).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .. import rng
from ..cells import BIG, CellTable, GridSpec, gather_padded
from ..config import (DPDExtParams, DPDParams, DPDTstatParams, LJCutParams,
                      LJCutRFParams, PairParams)
from ..geometry import Box

EPS_R = 1.0e-10  # reference EPSILON for r ~ 0 skip (pair_dpd.cpp:117)


class PairFields(NamedTuple):
    """Outputs of one force sweep."""

    f: jnp.ndarray                 # [N,3] per-atom force
    pe: Optional[jnp.ndarray]      # [N] per-atom potential energy (half-share)
    virial: Optional[jnp.ndarray]  # [6] global virial (xx,yy,zz,xy,xz,yz)
    virial_atom: Optional[jnp.ndarray] = None  # [N,6] per-atom virial shares


def _tables(params: PairParams, dtype):
    """Static coefficient tuples -> jnp arrays (trace-time constants)."""
    return {name: jnp.asarray(np.asarray(getattr(params, name)), dtype=dtype)
            for name in _table_names(params)}


def _table_names(params: PairParams):
    if isinstance(params, DPDParams):
        return ("a0", "gamma", "cut", "sigma")
    if isinstance(params, DPDTstatParams):
        return ("gamma", "cut", "sigma")
    if isinstance(params, DPDExtParams):
        return ("a0", "gamma", "gammaT", "ws", "wsT", "cut", "sigma",
                "sigmaT")
    if isinstance(params, LJCutParams):
        return ("epsilon", "sigma", "cut")
    if isinstance(params, LJCutRFParams):
        return ("epsilon", "sigma", "cut", "eps_rf")
    raise TypeError(type(params))


def sig_scale_of(params: PairParams, step, dtype):
    """Traced per-step noise-amplitude scale for a dpd/tstat temperature
    ramp (pair_dpd_tstat.cpp:52-60 t_target), or None when constant-T —
    None keeps every existing graph bit-identical."""
    if not isinstance(params, DPDTstatParams) or not params.is_ramp:
        return None
    b, e = params.ramp if params.ramp is not None else (0, 1)
    dtype = jnp.dtype(dtype).type
    frac = jnp.clip((step - b).astype(dtype) / dtype(max(e - b, 1)),
                    0.0, 1.0)
    t = dtype(params.temp) + frac * dtype(params.t_stop - params.temp)
    return jnp.sqrt(t / dtype(params.temp))


def is_vector_law(params: PairParams) -> bool:
    """True for pair styles whose force is not parallel to the separation
    (dpd/ext's transverse friction): their law returns a force VECTOR."""
    return isinstance(params, DPDExtParams)


def apply_pair_law(params, pair_fn, rsq, d, dv, ti, tj, tag_i, tag_j, salt,
                   **kwargs):
    """Uniform consumer entry: (fvec [...,3], e) for any pair style."""
    if is_vector_law(params):
        return pair_fn(rsq, d, dv, ti, tj, tag_i, tag_j, salt, **kwargs)
    fpair, e = pair_fn(rsq, d, dv, ti, tj, tag_i, tag_j, salt, **kwargs)
    return fpair[..., None] * d, e


def _lookup(tab: jnp.ndarray, ti: jnp.ndarray, tj: jnp.ndarray) -> jnp.ndarray:
    """Per-pair coefficient; fast-path single-type systems to a scalar."""
    if tab.shape == (1, 1):
        return tab[0, 0]
    return tab[ti, tj]


def _lj_consts(eps, sig):
    """LAMMPS lj1..lj4 (pair_lj_cut.cpp init_one convention)."""
    s6 = sig ** 6
    lj1 = 48.0 * eps * s6 * s6
    lj2 = 24.0 * eps * s6
    lj3 = 4.0 * eps * s6 * s6
    lj4 = 4.0 * eps * s6
    return lj1, lj2, lj3, lj4


def make_pair_law(params: PairParams, dt: float, dtype):
    """Return pair_fn(rsq, d, dv, ti, tj, tag_i, tag_j, salt) -> (fpair, e).

    fpair is defined so that F_i += fpair * d with d = x_i - x_j (the LAMMPS
    convention: fpair already carries the 1/r factors).
    e is the full pair energy (caller halves it for per-atom shares).
    """
    tabs = _tables(params, dtype)
    dtype = jnp.dtype(dtype).type

    if isinstance(params, DPDParams):
        dtinvsqrt = dtype(1.0 / np.sqrt(dt))
        gaussian = params.gaussian_noise

        def pair_fn(rsq, d, dv, ti, tj, tag_i, tag_j, salt):
            cut = _lookup(tabs["cut"], ti, tj)
            a0 = _lookup(tabs["a0"], ti, tj)
            gam = _lookup(tabs["gamma"], ti, tj)
            sig = _lookup(tabs["sigma"], ti, tj)
            r = jnp.sqrt(rsq)
            rinv = jnp.where(r > EPS_R, 1.0 / jnp.maximum(r, EPS_R), 0.0)
            wd = 1.0 - r * (1.0 / cut)
            dot = jnp.sum(d * dv, axis=-1)
            xi = rng.pair_noise(salt, tag_i, tag_j, gaussian=gaussian, dtype=dtype)
            fpair = a0 * wd
            fpair = fpair - gam * wd * wd * dot * rinv
            fpair = fpair + sig * wd * xi * dtinvsqrt
            fpair = fpair * rinv
            in_range = (rsq < cut * cut) & (r > EPS_R)
            e = 0.5 * a0 * cut * wd * wd          # pair_dpd.cpp:152 (shifted)
            return jnp.where(in_range, fpair, 0.0), jnp.where(in_range, e, 0.0)

        return pair_fn

    if isinstance(params, DPDTstatParams):
        # pair_dpd_tstat.cpp:96-136: drag + random only, zero energy.
        # A T ramp (:52-60 recomputes sigma from the per-step target T)
        # enters as sig_scale = sqrt(T(step)/t_start), threaded from the
        # step function (sig tables are baked at t_start).
        dtinvsqrt = dtype(1.0 / np.sqrt(dt))
        gaussian = params.gaussian_noise

        def pair_fn(rsq, d, dv, ti, tj, tag_i, tag_j, salt, sig_scale=None):
            cut = _lookup(tabs["cut"], ti, tj)
            gam = _lookup(tabs["gamma"], ti, tj)
            sig = _lookup(tabs["sigma"], ti, tj)
            if sig_scale is not None:
                sig = sig * sig_scale
            r = jnp.sqrt(rsq)
            rinv = jnp.where(r > EPS_R, 1.0 / jnp.maximum(r, EPS_R), 0.0)
            wd = 1.0 - r * (1.0 / cut)
            dot = jnp.sum(d * dv, axis=-1)
            xi = rng.pair_noise(salt, tag_i, tag_j, gaussian=gaussian,
                                dtype=dtype)
            fpair = -gam * wd * wd * dot * rinv
            fpair = fpair + sig * wd * xi * dtinvsqrt
            fpair = fpair * rinv
            in_range = (rsq < cut * cut) & (r > EPS_R)
            return (jnp.where(in_range, fpair, 0.0),
                    jnp.zeros_like(fpair))

        return pair_fn

    if isinstance(params, DPDExtParams):
        # pair_dpd_ext.cpp:113-185: parallel part like plain DPD with
        # wdPar = wd^ws, plus transverse drag/noise through the projector
        # P = I - rhat rhat^T with wdPerp = wd^wsT.  The transverse noise
        # is a full 3-vector, identical for both orientations of the pair
        # and antisymmetrized by sign(tag_i - tag_j) so Newton's third law
        # holds bitwise under the full-neighbor evaluation (the reference
        # gets this from its half list + explicit f[j] -= ...).
        dtinvsqrt = dtype(1.0 / np.sqrt(dt))
        gaussian = params.gaussian_noise
        tstat_only = params.tstat_only

        def pair_fn(rsq, d, dv, ti, tj, tag_i, tag_j, salt):
            cut = _lookup(tabs["cut"], ti, tj)
            gam = _lookup(tabs["gamma"], ti, tj)
            gamT = _lookup(tabs["gammaT"], ti, tj)
            sig = _lookup(tabs["sigma"], ti, tj)
            sigT = _lookup(tabs["sigmaT"], ti, tj)
            ws = _lookup(tabs["ws"], ti, tj)
            wsT = _lookup(tabs["wsT"], ti, tj)
            r = jnp.sqrt(rsq)
            rinv = jnp.where(r > EPS_R, 1.0 / jnp.maximum(r, EPS_R), 0.0)
            wd = jnp.maximum(1.0 - r * (1.0 / cut), 0.0)
            wd_par = wd ** ws
            wd_perp = wd ** wsT
            dot = jnp.sum(d * dv, axis=-1)

            salt32 = jnp.asarray(salt, jnp.uint32)
            xi = rng.pair_noise(salt32, tag_i, tag_j, gaussian=gaussian,
                                dtype=dtype)
            xiv = jnp.stack(
                [rng.pair_noise(salt32 ^ jnp.uint32(c), tag_i, tag_j,
                                gaussian=gaussian, dtype=dtype)
                 for c in (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)], axis=-1)
            sgn = jnp.where(tag_i > tag_j, dtype(1.0), dtype(-1.0))

            fpar = (0.0 if tstat_only else _lookup(tabs["a0"], ti, tj) * wd)
            fpar = fpar - gam * wd_par * wd_par * dot * rinv
            fpar = fpar + sig * wd_par * xi * dtinvsqrt
            fvec = (fpar * rinv)[..., None] * d

            # P.u = u - rhat (rhat.u)
            rhat = d * rinv[..., None]

            def proj(u):
                return u - rhat * jnp.sum(rhat * u, axis=-1, keepdims=True)

            fvec = fvec - (gamT * wd_perp * wd_perp)[..., None] * proj(dv)
            fvec = fvec + (sigT * wd_perp * sgn * dtinvsqrt)[..., None] \
                * proj(xiv)

            in_range = ((rsq < cut * cut) & (r > EPS_R))[..., None]
            fvec = jnp.where(in_range, fvec, 0.0)
            if tstat_only:
                e = jnp.zeros(rsq.shape, dtype)
            else:
                a0 = _lookup(tabs["a0"], ti, tj)
                e = jnp.where(in_range[..., 0],
                              0.5 * a0 * cut * wd * wd, 0.0)
            return fvec, e

        return pair_fn

    if isinstance(params, LJCutParams):
        shift = params.shift

        def pair_fn(rsq, d, dv, ti, tj, tag_i, tag_j, salt):
            cut = _lookup(tabs["cut"], ti, tj)
            eps = _lookup(tabs["epsilon"], ti, tj)
            sig = _lookup(tabs["sigma"], ti, tj)
            lj1, lj2, lj3, lj4 = _lj_consts(eps, sig)
            in_range = (rsq < cut * cut) & (rsq > EPS_R * EPS_R)
            r2inv = jnp.where(in_range, 1.0 / jnp.maximum(rsq, EPS_R), 0.0)
            r6inv = r2inv * r2inv * r2inv
            fpair = r6inv * (lj1 * r6inv - lj2) * r2inv
            e = r6inv * (lj3 * r6inv - lj4)
            if shift:
                rc2 = 1.0 / (cut * cut)
                rc6 = rc2 * rc2 * rc2
                e = e - rc6 * (lj3 * rc6 - lj4)
            return jnp.where(in_range, fpair, 0.0), jnp.where(in_range, e, 0.0)

        return pair_fn

    if isinstance(params, LJCutRFParams):
        qq = dtype(params.qqrd2e)
        cut_coul = dtype(params.cut_coul)

        def pair_fn(rsq, d, dv, ti, tj, tag_i, tag_j, salt, qi=None, qj=None):
            cut = _lookup(tabs["cut"], ti, tj)
            eps = _lookup(tabs["epsilon"], ti, tj)
            sig = _lookup(tabs["sigma"], ti, tj)
            erf = _lookup(tabs["eps_rf"], ti, tj)
            lj1, lj2, lj3, lj4 = _lj_consts(eps, sig)
            ok = rsq > EPS_R * EPS_R
            r2inv = jnp.where(ok, 1.0 / jnp.maximum(rsq, EPS_R * EPS_R), 0.0)
            r6inv = r2inv * r2inv * r2inv
            in_lj = (rsq < cut * cut) & ok
            flj = jnp.where(in_lj, r6inv * (lj1 * r6inv - lj2) * r2inv, 0.0)
            elj = jnp.where(in_lj, r6inv * (lj3 * r6inv - lj4), 0.0)
            # reaction field (pair_lj_cut_rf.cpp:118-131, :163-171)
            rf1 = erf - 1.0
            rf2 = 1.0 + 2.0 * erf
            in_coul = (rsq < cut_coul * cut_coul) & ok
            qprod = qq * qi * qj
            rinv = jnp.sqrt(r2inv)
            r = jnp.sqrt(rsq)
            fcoul = qprod * (r2inv * rinv - (1.0 / cut_coul ** 3) * (2.0 * rf1 / rf2))
            fcoul = jnp.where(in_coul, fcoul, 0.0)
            ecoul = (qprod * rinv * (1.0 + (rf1 / rf2) * (r / cut_coul) ** 3)
                     - qprod * (1.0 / cut_coul) * (3.0 * erf / rf2))
            ecoul = jnp.where(in_coul, ecoul, 0.0)
            return flj + fcoul, elj + ecoul

        return pair_fn

    raise TypeError(type(params))


def pair_sweep(params: PairParams, box: Box, spec: GridSpec, ctab: CellTable,
               x, v, types, tag, q, salt, *, dt: float,
               sig_scale=None,
               compute_energy: bool = False,
               compute_virial: bool = False,
               compute_virial_atom: bool = False) -> PairFields:
    """Full force sweep over the cell grid.

    Returns per-atom forces (zeros for dead/padded slots), optional per-atom
    pe (each atom gets half of each incident pair's energy — summing gives
    the LAMMPS total evdwl+ecoul), optional global virial 6-vector
    (0.5 * sum_pairs d (x) F, both orientations counted).
    """
    dtype = x.dtype
    n = x.shape[0]
    n_cells = spec.n_cells
    cap = spec.capacity
    pair_fn = make_pair_law(params, dt, dtype)
    charged = isinstance(params, LJCutRFParams)

    idx = ctab.table[:n_cells]                       # [n_cells, cap]
    xi = gather_padded(x, idx, BIG)                  # [n_cells, cap, 3]
    vi = gather_padded(v, idx, 0.0)
    ti = gather_padded(types, idx, 0)
    gi = gather_padded(tag, idx, -1)
    qi = gather_padded(q, idx, 0.0) if charged else None

    nbr = jnp.asarray(spec.stencil_neighbors())      # [27, n_cells] const
    slot = jnp.arange(cap, dtype=jnp.int32)

    f_acc = jnp.zeros((n_cells, cap, 3), dtype)
    pe_acc = jnp.zeros((n_cells, cap), dtype) if compute_energy else None
    w_acc = jnp.zeros((6,), dtype) if compute_virial else None
    wa_acc = jnp.zeros((n_cells, cap, 6), dtype) if compute_virial_atom else None

    for k in range(nbr.shape[0]):
        jcells = nbr[k]                              # [n_cells]
        jdx = ctab.table[jcells]                     # [n_cells, cap] (trash row ok)
        xj = gather_padded(x, jdx, BIG)
        vj = gather_padded(v, jdx, 0.0)
        tj = gather_padded(types, jdx, 0)
        gj = gather_padded(tag, jdx, -1)
        qj = gather_padded(q, jdx, 0.0) if charged else None

        d = xi[:, :, None, :] - xj[:, None, :, :]    # [n_cells, cap, cap, 3]
        d = box.min_image(d)
        dv = vi[:, :, None, :] - vj[:, None, :, :]
        rsq = jnp.sum(d * d, axis=-1)

        valid = (xi[:, :, None, 0] < BIG * 0.5) & (xj[:, None, :, 0] < BIG * 0.5)
        if k == 13:  # the (0,0,0) offset: mask self pairs by slot index
            valid = valid & (slot[None, :, None] != slot[None, None, :])

        kwargs = {}
        if charged:
            kwargs = dict(qi=qi[:, :, None], qj=qj[:, None, :])
        if sig_scale is not None:
            kwargs["sig_scale"] = sig_scale
        fvec, e = apply_pair_law(params, pair_fn, rsq, d, dv,
                                 ti[:, :, None], tj[:, None, :],
                                 gi[:, :, None], gj[:, None, :], salt,
                                 **kwargs)
        fvec = jnp.where(valid[..., None], fvec, 0.0)  # force on i from j
        f_acc = f_acc + jnp.sum(fvec, axis=2)
        if compute_energy:
            pe_acc = pe_acc + 0.5 * jnp.sum(jnp.where(valid, e, 0.0), axis=2)
        if compute_virial:
            w_acc = w_acc + 0.5 * jnp.stack([
                jnp.sum(d[..., 0] * fvec[..., 0]),
                jnp.sum(d[..., 1] * fvec[..., 1]),
                jnp.sum(d[..., 2] * fvec[..., 2]),
                jnp.sum(d[..., 0] * fvec[..., 1]),
                jnp.sum(d[..., 0] * fvec[..., 2]),
                jnp.sum(d[..., 1] * fvec[..., 2]),
            ])
        if compute_virial_atom:
            wa_acc = wa_acc + 0.5 * jnp.stack([
                jnp.sum(d[..., 0] * fvec[..., 0], axis=2),
                jnp.sum(d[..., 1] * fvec[..., 1], axis=2),
                jnp.sum(d[..., 2] * fvec[..., 2], axis=2),
                jnp.sum(d[..., 0] * fvec[..., 1], axis=2),
                jnp.sum(d[..., 0] * fvec[..., 2], axis=2),
                jnp.sum(d[..., 1] * fvec[..., 2], axis=2),
            ], axis=-1)

    # Scatter back to slot order: each live slot appears exactly once.
    f = jnp.zeros((n + 1, 3), dtype)
    f = f.at[idx.reshape(-1)].set(f_acc.reshape(-1, 3), mode="drop")[:n]
    pe = None
    if compute_energy:
        peb = jnp.zeros((n + 1,), dtype)
        pe = peb.at[idx.reshape(-1)].set(pe_acc.reshape(-1), mode="drop")[:n]
    wa = None
    if compute_virial_atom:
        wab = jnp.zeros((n + 1, 6), dtype)
        wa = wab.at[idx.reshape(-1)].set(wa_acc.reshape(-1, 6), mode="drop")[:n]
    return PairFields(f=f, pe=pe, virial=w_acc, virial_atom=wa)


def trial_energy_force(params: PairParams, box: Box, spec: GridSpec,
                       ctab: CellTable, x, types, q,
                       cand_x, cand_type, cand_q=None):
    """Energy and force on K *trial* particles against all existing atoms —
    the batched replacement for the reference's USHER/near energy scans
    (fix_obmd_merged.cpp:1774-1857 `energy()`, which walks all nlocal atoms
    with pair->single; here we walk the 27 surrounding cells only).

    cand_x: [K,3]; cand_type: [K].  Returns (E [K], F [K,3]).
    Uses the conservative part of the pair law only, matching pair->single
    (pair_dpd.cpp:401 returns the conservative term; lj/cut/rf single at
    pair_lj_cut_rf.cpp:492/533 returns LJ+RF).
    """
    dtype = x.dtype
    n = x.shape[0]
    n_cells = spec.n_cells
    cap = spec.capacity
    dims = spec.dims
    charged = isinstance(params, LJCutRFParams)
    pair_fn = make_pair_law(params, 1.0, dtype)

    lo = jnp.asarray(spec.lo, dtype=dtype)
    cs = jnp.asarray(spec.cell_size, dtype=dtype)
    ndims = jnp.asarray(dims, dtype=jnp.int32)
    cc = jnp.clip(jnp.floor((cand_x - lo) / cs).astype(jnp.int32), 0, ndims - 1)  # [K,3]

    offs = jnp.asarray([(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                        for dz in (-1, 0, 1)], dtype=jnp.int32)  # [27,3]
    nb = cc[:, None, :] + offs[None, :, :]           # [K,27,3]
    per = jnp.asarray(spec.periodic)
    wrapped = jnp.mod(nb, ndims)
    nb_ok = jnp.all(jnp.where(per, True, (nb >= 0) & (nb < ndims)), axis=-1)
    nb = jnp.where(per, wrapped, nb)
    lin = (nb[..., 0] * dims[1] + nb[..., 1]) * dims[2] + nb[..., 2]
    lin = jnp.where(nb_ok, lin, n_cells)             # invalid -> trash row

    jdx = ctab.table[lin]                            # [K, 27, cap]
    k_n = jdx.shape[0]
    jdx = jdx.reshape(k_n, 27 * cap)
    xj = gather_padded(x, jdx, BIG)                  # [K, 27cap, 3]
    tj = gather_padded(types, jdx, 0)
    qj = gather_padded(q, jdx, 0.0) if charged else None

    d = cand_x[:, None, :] - xj                      # [K, 27cap, 3]
    d = box.min_image(d)
    rsq = jnp.sum(d * d, axis=-1)
    valid = xj[..., 0] < BIG * 0.5

    dv = jnp.zeros_like(d)
    zero_tag = jnp.zeros((), jnp.int32)
    kwargs = {}
    if charged:
        cq = cand_q if cand_q is not None else jnp.zeros((k_n,), dtype)
        kwargs = dict(qi=cq[:, None], qj=qj)
    # Conservative-only: strip drag/noise by passing dv=0 and salt=0 with a
    # dedicated conservative law for the DPD family (pair->single returns
    # only the conservative term, pair_dpd.cpp:401 / pair_dpd_ext.cpp:477;
    # dpd/tstat has no conservative force at all).
    if isinstance(params, DPDTstatParams) or (
            isinstance(params, DPDExtParams) and params.tstat_only):
        fpair = jnp.zeros(rsq.shape, dtype)
        e = jnp.zeros(rsq.shape, dtype)
    elif isinstance(params, (DPDParams, DPDExtParams)):
        tabs = _tables(params, dtype)

        cut = _lookup(tabs["cut"], cand_type[:, None], tj)
        a0 = _lookup(tabs["a0"], cand_type[:, None], tj)
        r = jnp.sqrt(rsq)
        rinv = jnp.where(r > EPS_R, 1.0 / jnp.maximum(r, EPS_R), 0.0)
        wd = 1.0 - r / cut
        in_range = (rsq < cut * cut) & (r > EPS_R) & valid
        fpair = jnp.where(in_range, a0 * wd * rinv, 0.0)
        e = jnp.where(in_range, 0.5 * a0 * cut * wd * wd, 0.0)
    else:
        fpair, e = pair_fn(rsq, d, dv, cand_type[:, None], tj,
                           zero_tag, zero_tag, jnp.zeros((), jnp.uint32), **kwargs)
        fpair = jnp.where(valid, fpair, 0.0)
        e = jnp.where(valid, e, 0.0)

    E = jnp.sum(e, axis=-1)                          # [K]
    F = jnp.sum(fpair[..., None] * d, axis=1)        # [K,3]
    return E, F
