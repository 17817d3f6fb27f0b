"""Bonded forces and the Langevin thermostat fix.

FENE bonds (reference: bond_style fene, bench/in.chain — the chain headline
benchmark) evaluated symmetrically from per-atom partner SLOT indices: each
atom pulls on itself from both of its bonds, so there is no scatter-add.
Slot references are remapped by every relayout (cellpad.layout_build /
relayout_incremental), which makes resolution exact for arbitrarily large
tags — a tag-keyed map capped at the capacity silently dropped bonds once
OBMD-inserted molecule tags outgrew it (round-1 Weak #3).

Langevin thermostat (reference: fix_langevin.cpp):
  f += -(m/damp) v + sqrt(24 kB T m / (dt damp)) * uniform(-0.5, 0.5)
with counter-based per-(atom, axis, step) deviates.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import rng
from ..cells import BIG, gather_padded
from ..config import BondFENEParams, LangevinParams, SceneConfig
from ..geometry import Box

PURPOSE_LANGEVIN = 3
TWO_1_3 = 2.0 ** (1.0 / 3.0)


def fene_forces(bond: BondFENEParams, box: Box, x, bond1, bond2, alive,
                compute_energy: bool = False, more_partners=()):
    """Force on every atom from its (up to four) FENE bonds.

    bond1/bond2 are partner SLOT indices (-1 = none).

    Matches bond_fene.cpp: fbond = -k/(1 - rsq/r0^2) (+ WCA inside
    2^(1/6) sigma); F_i = fbond * (x_i - x_j).  Over-stretched bonds
    (r > r0) are clamped to the reference's "bad FENE bond" guard value
    (rlogarg = 0.1) rather than producing NaNs."""
    dtype = x.dtype
    n = x.shape[0]
    k = dtype.type(bond.k)
    r0sq = dtype.type(bond.r0 * bond.r0)
    eps = dtype.type(bond.epsilon)
    sig2 = dtype.type(bond.sigma * bond.sigma)

    x4 = jnp.concatenate([x, jnp.zeros((n, 1), dtype)], axis=1)

    f = jnp.zeros((n, 3), dtype)
    e = jnp.zeros((n,), dtype) if compute_energy else None
    for partner in (bond1, bond2) + tuple(more_partners):
        j = jnp.clip(partner, 0, n - 1)
        has = alive & (partner >= 0) & alive[j]
        xj = gather_padded(x4, jnp.where(has, j, n), BIG)[:, :3]
        d = box.min_image(x - xj)
        rsq = jnp.sum(d * d, axis=-1)
        ok = has
        rlogarg = jnp.maximum(1.0 - rsq / r0sq, 0.1)   # LAMMPS guard
        fbond = -k / rlogarg
        # WCA part of the FENE potential
        sr2 = jnp.where(ok, sig2 / jnp.maximum(rsq, 1e-12), 0.0)
        sr6 = sr2 * sr2 * sr2
        wca = rsq < TWO_1_3 * sig2
        fbond = fbond + jnp.where(wca, 48.0 * eps * sr6 * (sr6 - 0.5)
                                  / jnp.maximum(rsq, 1e-12), 0.0)
        fbond = jnp.where(ok, fbond, 0.0)
        f = f + fbond[:, None] * d
        if compute_energy:
            eb = -0.5 * k * r0sq * jnp.log(rlogarg)
            eb = eb + jnp.where(wca, 4.0 * eps * sr6 * (sr6 - 1.0) + eps, 0.0)
            # half share per endpoint (each bond visited from both ends)
            e = e + jnp.where(ok, 0.5 * eb, 0.0)
    return (f, e) if compute_energy else (f, None)


def harmonic_bond_forces(bond, box: Box, x, bond1, bond2, alive,
                         compute_energy: bool = False, more_partners=()):
    """Force on every atom from its (up to four) harmonic bonds.

    Matches bond_harmonic.cpp: E = K (r - r0)^2, fbond = -2 K (r - r0) / r,
    F_i = fbond * (x_i - x_j).  Evaluated symmetrically from partner SLOT
    columns like fene_forces — no scatter-add."""
    dtype = x.dtype
    n = x.shape[0]
    k = dtype.type(bond.k)
    r0 = dtype.type(bond.r0)

    x4 = jnp.concatenate([x, jnp.zeros((n, 1), dtype)], axis=1)
    f = jnp.zeros((n, 3), dtype)
    e = jnp.zeros((n,), dtype) if compute_energy else None
    for partner in (bond1, bond2) + tuple(more_partners):
        j = jnp.clip(partner, 0, n - 1)
        has = alive & (partner >= 0) & alive[j]
        xj = gather_padded(x4, jnp.where(has, j, n), BIG)[:, :3]
        d = box.min_image(x - xj)
        rsq = jnp.sum(d * d, axis=-1)
        r = jnp.sqrt(jnp.maximum(rsq, 1e-12))
        dr = r - r0
        fbond = jnp.where(has, -2.0 * k * dr / r, 0.0)
        f = f + fbond[:, None] * d
        if compute_energy:
            # half share per endpoint (each bond visited from both ends)
            e = e + jnp.where(has, 0.5 * k * dr * dr, 0.0)
    return (f, e) if compute_energy else (f, None)


def bond_pair_fvec(bond, rsq, d):
    """Bond force ON atom i for displacement d = x_i - x_j, any leading
    shape (the in-sweep evaluation used by the slab path, where the
    partner is identified by TAG among gathered neighbors)."""
    from ..config import BondFENEParams, BondHarmonicParams
    dtype = d.dtype
    if isinstance(bond, BondHarmonicParams):
        k = dtype.type(bond.k)
        r0 = dtype.type(bond.r0)
        r = jnp.sqrt(jnp.maximum(rsq, 1e-12))
        fbond = -2.0 * k * (r - r0) / r
        return fbond[..., None] * d
    if isinstance(bond, BondFENEParams):
        k = dtype.type(bond.k)
        r0sq = dtype.type(bond.r0 * bond.r0)
        eps = dtype.type(bond.epsilon)
        sig2 = dtype.type(bond.sigma * bond.sigma)
        rlogarg = jnp.maximum(1.0 - rsq / r0sq, 0.1)   # LAMMPS guard
        fbond = -k / rlogarg
        sr2 = sig2 / jnp.maximum(rsq, 1e-12)
        sr6 = sr2 * sr2 * sr2
        wca = rsq < TWO_1_3 * sig2
        fbond = fbond + jnp.where(
            wca, 48.0 * eps * sr6 * (sr6 - 0.5) / jnp.maximum(rsq, 1e-12),
            0.0)
        return fbond[..., None] * d
    raise TypeError(f"unsupported bond style {type(bond)}")


def bond_forces(bond, box: Box, x, bond1, bond2, alive,
                compute_energy: bool = False, more_partners=()):
    """Dispatch on the bond style (BondFENEParams / BondHarmonicParams)."""
    from ..config import BondFENEParams, BondHarmonicParams
    if isinstance(bond, BondFENEParams):
        return fene_forces(bond, box, x, bond1, bond2, alive, compute_energy,
                           more_partners=more_partners)
    if isinstance(bond, BondHarmonicParams):
        return harmonic_bond_forces(bond, box, x, bond1, bond2, alive,
                                    compute_energy,
                                    more_partners=more_partners)
    raise TypeError(f"unsupported bond style {type(bond)}")


def _angle_end_forces(d1, d2, kc, t0, ok):
    """(f1, f3, energy) of one angle with displacement d1 = end1 - center,
    d2 = end2 - center, center coefficients (kc, t0) —
    angle_harmonic.cpp::compute's a11/a12/a22 construction."""
    rsq1 = jnp.sum(d1 * d1, axis=-1)
    rsq2 = jnp.sum(d2 * d2, axis=-1)
    r1 = jnp.sqrt(jnp.maximum(rsq1, 1e-12))
    r2 = jnp.sqrt(jnp.maximum(rsq2, 1e-12))
    c = jnp.sum(d1 * d2, axis=-1) / (r1 * r2)
    c = jnp.clip(c, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-8))
    dtheta = jnp.arccos(c) - t0
    a = jnp.where(ok, -2.0 * kc * dtheta / s, 0.0)
    a11 = a * c / jnp.maximum(rsq1, 1e-12)
    a12 = -a / (r1 * r2)
    a22 = a * c / jnp.maximum(rsq2, 1e-12)
    f1 = a11[:, None] * d1 + a12[:, None] * d2
    f3 = a22[:, None] * d2 + a12[:, None] * d1
    en = jnp.where(ok, kc * dtheta * dtheta, 0.0)
    return f1, f3, en


def _angle_forces_general(box: Box, x4, partners, k_t, t0_t, type_, alive,
                          compute_energy):
    """Angle pass for branched topologies (3-4 partner columns): a covered
    center bends EVERY pair of its partners (all-partner-pairs convention).
    Same no-scatter-add structure as the chain path — each atom computes
    its own force once per (center, pair) role it can hold."""
    import itertools
    dtype = x4.dtype
    n = x4.shape[0]
    x = x4[:, :3]
    K = len(partners)

    def gxyz(j, has):
        return gather_padded(x4, jnp.where(has, j, n), BIG)[:, :3]

    kc_self = k_t[jnp.clip(type_, 0, k_t.shape[0] - 1)]
    t0_self = t0_t[jnp.clip(type_, 0, t0_t.shape[0] - 1)]

    f = jnp.zeros((n, 3), dtype)
    e = jnp.zeros((n,), dtype) if compute_energy else None

    # ---- center role: one angle per pair of my partner columns ----
    for a, b in itertools.combinations(range(K), 2):
        pa, pb = partners[a], partners[b]
        ja = jnp.clip(pa, 0, n - 1)
        jb = jnp.clip(pb, 0, n - 1)
        ok = (alive & (pa >= 0) & (pb >= 0) & alive[ja] & alive[jb]
              & (kc_self > 0))
        d1 = box.min_image(gxyz(ja, ok) - x)
        d2 = box.min_image(gxyz(jb, ok) - x)
        f1, f3, en = _angle_end_forces(d1, d2, kc_self, t0_self, ok)
        f = f - (f1 + f3)
        if compute_energy:
            e = e + en          # whole angle energy at the center

    # ---- end role: I am an end of every angle centered at a partner p
    # between me and each of p's OTHER partners ----
    me = jnp.arange(n, dtype=partners[0].dtype)
    for i in range(K):
        p = partners[i]
        ps = jnp.clip(p, 0, n - 1)
        kc_p = k_t[jnp.clip(type_[ps], 0, k_t.shape[0] - 1)]
        t0_p = t0_t[jnp.clip(type_[ps], 0, t0_t.shape[0] - 1)]
        has_p = alive & (p >= 0) & alive[ps] & (kc_p > 0)
        xp = gxyz(ps, has_p)
        d_self = box.min_image(x - xp)
        for j in range(K):
            oth = partners[j][ps]
            os_ = jnp.clip(oth, 0, n - 1)
            ok = has_p & (oth >= 0) & (oth != me) & alive[os_]
            d_oth = box.min_image(gxyz(os_, ok) - xp)
            f1, _, _ = _angle_end_forces(d_self, d_oth, kc_p, t0_p, ok)
            f = f + f1
    return (f, e) if compute_energy else (f, None)


def angle_forces(angle, box: Box, x, bond1, bond2, type_, alive,
                 compute_energy: bool = False, more_partners=()):
    """Harmonic angle force with center-atom-based storage.

    With >2 partner columns (branched topology) every pair of a covered
    center's partners bends one angle (the all-partner-pairs convention
    validated by config.derive_center_angle_table); the chain case keeps
    its original two-column graph bit-for-bit.

    An alive atom with two bond partners is the center of one angle between
    them when its type's K > 0 (config.AngleHarmonicParams).  Every atom
    computes its own force: once in the center role (angle_harmonic.cpp's
    f2 = -(f1 + f3)) and once per bond in the end role (f1/f3), resolving
    the third atom through the partner's OWN bond columns — one extra
    gather, no scatter-add.

    Math per angle_harmonic.cpp::compute: d1 = x_i - x_j, d2 = x_k - x_j,
    c = cos(theta), a = -2 K (theta - theta0)/sin(theta),
    f1 = (a c / r1^2) d1 - (a / (r1 r2)) d2, symmetric for f3."""
    dtype = x.dtype
    n = x.shape[0]
    k_t = jnp.asarray(angle.k, dtype)
    t0_t = jnp.asarray(np.deg2rad(np.asarray(angle.theta0)), dtype)

    x4 = jnp.concatenate([x, jnp.zeros((n, 1), dtype)], axis=1)

    def gxyz(j, has):
        return gather_padded(x4, jnp.where(has, j, n), BIG)[:, :3]

    end_forces = _angle_end_forces
    if more_partners:
        return _angle_forces_general(
            box, x4, (bond1, bond2) + tuple(more_partners), k_t, t0_t,
            type_, alive, compute_energy)

    j1 = jnp.clip(bond1, 0, n - 1)
    j2 = jnp.clip(bond2, 0, n - 1)
    kc_self = k_t[jnp.clip(type_, 0, k_t.shape[0] - 1)]
    t0_self = t0_t[jnp.clip(type_, 0, t0_t.shape[0] - 1)]
    center_ok = (alive & (bond1 >= 0) & (bond2 >= 0)
                 & alive[j1] & alive[j2] & (kc_self > 0))

    # ---- center role: f2 = -(f1 + f3) of my own angle ----
    d1 = box.min_image(gxyz(j1, center_ok) - x)
    d2 = box.min_image(gxyz(j2, center_ok) - x)
    f1, f3, en = end_forces(d1, d2, kc_self, t0_self, center_ok)
    f = -(f1 + f3)
    e = en if compute_energy else None   # whole angle energy at the center

    # ---- end role: for each partner p that is an angle center ----
    self_idx = jnp.arange(n, dtype=bond1.dtype)
    for partner in (bond1, bond2):
        p = jnp.clip(partner, 0, n - 1)
        pb1 = bond1[p]
        pb2 = bond2[p]
        kc_p = k_t[jnp.clip(type_[p], 0, k_t.shape[0] - 1)]
        t0_p = t0_t[jnp.clip(type_[p], 0, t0_t.shape[0] - 1)]
        other = jnp.where(pb1 == self_idx, pb2, pb1)
        oth = jnp.clip(other, 0, n - 1)
        ok = (alive & (partner >= 0) & alive[p] & (pb1 >= 0) & (pb2 >= 0)
              & (other >= 0) & alive[oth] & (kc_p > 0))
        xp = gxyz(p, ok)
        d_self = box.min_image(x - xp)               # d1: me - center
        d_oth = box.min_image(gxyz(oth, ok) - xp)    # d2: other end - center
        f1, _, _ = end_forces(d_self, d_oth, kc_p, t0_p, ok)
        f = f + f1
    return (f, e) if compute_energy else (f, None)


def dihedral_forces(dih, box: Box, x, bond1, bond2, alive,
                    compute_energy: bool = False):
    """Harmonic dihedral force with center-bond storage: every bonded pair
    (j, k) where BOTH atoms carry two bond partners spans the chain
    dihedral i-j-k-l (i/l = the other partners).  Each atom accumulates
    its OWN gradient for every dihedral it participates in — once per
    role (end x1 via a 2-hop partner walk, center x2 per own bond), so no
    scatter-add and each dihedral's four gradients are computed by their
    four owners (dihedral_harmonic.cpp semantics, E = K[1 + d cos(n phi)]
    with phi from the atan2 construction).

    Forces are exact autodiff gradients of the energy; degenerate
    geometries (collinear bonds) are sanitized with the double-where
    pattern before differentiation."""
    import jax
    dtype = x.dtype
    n = x.shape[0]
    K = float(dih.k)
    dsign = float(dih.d)
    nper = int(dih.n)

    x4 = jnp.concatenate([x, jnp.zeros((n, 1), dtype)], axis=1)

    def gxyz(j, has):
        return gather_padded(x4, jnp.where(has, j, n), BIG)[:, :3]

    def e_dihedral(x1, x2, x3, x4_):
        b1 = box.min_image(x2 - x1)
        b2 = box.min_image(x3 - x2)
        b3 = box.min_image(x4_ - x3)
        n1 = jnp.cross(b1, b2)
        n2 = jnp.cross(b2, b3)
        b2n = jnp.sqrt(jnp.maximum(jnp.sum(b2 * b2, axis=-1), 1e-12))
        # phi = atan2((n1 x n2) . b2hat, n1 . n2)  (standard construction)
        sin_t = jnp.sum(jnp.cross(n1, n2) * b2, axis=-1) / b2n
        cos_t = jnp.sum(n1 * n2, axis=-1)
        phi = jnp.arctan2(sin_t, cos_t)
        return K * (1.0 + dsign * jnp.cos(nper * phi))

    def other(p, me_idx):
        ps = jnp.clip(p, 0, n - 1)
        pb1 = bond1[ps]
        pb2 = bond2[ps]
        oth = jnp.where(pb1 == me_idx, pb2, pb1)
        return oth, (p >= 0) & (pb1 >= 0) & (pb2 >= 0)

    me = jnp.arange(n, dtype=bond1.dtype)
    f = jnp.zeros((n, 3), dtype)
    e = jnp.zeros((n,), dtype) if compute_energy else None

    # non-degenerate sanitization offsets (double-where: grads of masked
    # rows must be finite even though they are discarded)
    s1 = jnp.asarray([1.0, 0.0, 0.0], dtype)
    s2 = jnp.asarray([1.0, 1.0, 0.0], dtype)
    s3 = jnp.asarray([0.0, 1.0, 1.0], dtype)

    def role_force(ok, xs_self, xa, xb, xc, role):
        """-(d/dx_self) sum E with x_self at `role` (0 = x1, 1 = x2)."""
        ok3 = ok[:, None]
        a = jnp.where(ok3, xa, xs_self + s1)
        b = jnp.where(ok3, xb, xs_self + s2)
        c = jnp.where(ok3, xc, xs_self + s3)

        def etot(xs):
            if role == 0:
                ev = e_dihedral(xs, a, b, c)
            else:
                ev = e_dihedral(a, xs, b, c)
            return jnp.sum(jnp.where(ok, ev, 0.0))

        g = jax.grad(etot)(xs_self)
        return -jnp.where(ok3, g, 0.0)

    for partner in (bond1, bond2):
        pj = jnp.clip(partner, 0, n - 1)
        has_p = alive & (partner >= 0) & alive[pj]

        # ---- center role: I am x2 of the dihedral over bond (me, p) ----
        # i = my other partner, k = p, l = p's other partner
        i_idx = jnp.where(bond1 == partner, bond2, bond1)
        l_idx, p_has2 = other(partner, me)
        ok_c = (has_p & (i_idx >= 0) & p_has2 & (l_idx >= 0)
                & alive[jnp.clip(i_idx, 0, n - 1)]
                & alive[jnp.clip(l_idx, 0, n - 1)])
        xi = gxyz(i_idx, ok_c)
        xk = gxyz(pj, ok_c)
        xl = gxyz(l_idx, ok_c)
        f = f + role_force(ok_c, x, xi, xk, xl, role=1)
        if compute_energy:
            # each dihedral has exactly two center roles: half share each
            ok3 = ok_c[:, None]
            ev = e_dihedral(jnp.where(ok3, xi, x + s1), x,
                            jnp.where(ok3, xk, x + s2),
                            jnp.where(ok3, xl, x + s3))
            e = e + 0.5 * jnp.where(ok_c, ev, 0.0)

        # ---- end role: I am x1 via the 2-hop walk me -> j=p -> k -> l ----
        j_idx = pj
        k_idx, j_has2 = other(partner, me)
        ks = jnp.clip(k_idx, 0, n - 1)
        kb1 = bond1[ks]
        kb2 = bond2[ks]
        l2_idx = jnp.where(kb1 == j_idx, kb2, kb1)
        ok_e = (has_p & j_has2 & (k_idx >= 0)
                & alive[ks] & (kb1 >= 0) & (kb2 >= 0) & (l2_idx >= 0)
                & alive[jnp.clip(l2_idx, 0, n - 1)])
        xj = gxyz(j_idx, ok_e)
        xk2 = gxyz(k_idx, ok_e)
        xl2 = gxyz(l2_idx, ok_e)
        f = f + role_force(ok_e, x, xj, xk2, xl2, role=0)

    return (f, e) if compute_energy else (f, None)


def _improper_quad_forces(box: Box, x1, x2, x3, x4_, kc, chi0, ok):
    """(f1, f2, f3, f4, energy) of the harmonic improper over the quadruple
    (x1, x2, x3, x4) — the exact a11..a23 construction of
    improper_harmonic.cpp::compute (E = K (chi - chi0)^2, chi from the
    dihedral-like angle of (x1-x2, x3-x2, x4-x3); SMALL/clamp guards
    reproduced).  Rows with ok=False produce zeros."""
    SMALL = 0.001
    dtype = x1.dtype
    vb1 = box.min_image(x1 - x2)
    vb2 = box.min_image(x3 - x2)
    vb3 = box.min_image(x4_ - x3)
    ss1 = 1.0 / jnp.maximum(jnp.sum(vb1 * vb1, axis=-1), 1e-12)
    ss2 = 1.0 / jnp.maximum(jnp.sum(vb2 * vb2, axis=-1), 1e-12)
    ss3 = 1.0 / jnp.maximum(jnp.sum(vb3 * vb3, axis=-1), 1e-12)
    r1 = jnp.sqrt(ss1)
    r2 = jnp.sqrt(ss2)
    r3 = jnp.sqrt(ss3)
    c0 = jnp.sum(vb1 * vb3, axis=-1) * r1 * r3
    c1 = jnp.sum(vb1 * vb2, axis=-1) * r1 * r2
    c2 = -jnp.sum(vb3 * vb2, axis=-1) * r3 * r2
    s1 = 1.0 / jnp.maximum(1.0 - c1 * c1, SMALL)
    s2 = 1.0 / jnp.maximum(1.0 - c2 * c2, SMALL)
    s12 = jnp.sqrt(s1 * s2)
    c = jnp.clip((c1 * c2 + c0) * s12, -1.0, 1.0)
    s = jnp.maximum(jnp.sqrt(1.0 - c * c), SMALL)
    domega = jnp.arccos(c) - chi0
    a = kc * domega
    en = jnp.where(ok, a * domega, 0.0).astype(dtype)
    a = jnp.where(ok, -2.0 * a / s, 0.0)
    c = c * a
    s12 = s12 * a
    a11 = c * ss1 * s1
    a22 = -ss2 * (2.0 * c0 * s12 - c * (s1 + s2))
    a33 = c * ss3 * s2
    a12 = -r1 * r2 * (c1 * c * s1 + c2 * s12)
    a13 = -r1 * r3 * s12
    a23 = r2 * r3 * (c2 * c * s2 + c1 * s12)
    sv2 = a22[:, None] * vb2 + a23[:, None] * vb3 + a12[:, None] * vb1
    f1 = a12[:, None] * vb2 + a13[:, None] * vb3 + a11[:, None] * vb1
    f2 = -sv2 - f1
    f4 = a23[:, None] * vb2 + a33[:, None] * vb3 + a13[:, None] * vb1
    f3 = sv2 - f4
    return f1, f2, f3, f4, en


def improper_forces(imp, box: Box, x, partners, impr, type_, alive,
                    compute_energy: bool = False):
    """Harmonic improper force with per-CENTER storage: State.impr[i2] holds
    the partner SLOTS (i1, i3, i4) of the improper centered on i2, and the
    coefficients are keyed by i2's atom type (config.ImproperHarmonicParams).

    No-scatter-add structure: the center computes its own f2 from its slot
    triplet; each end reaches the improper through its bond to the center
    (the out-of-plane convention guarantees the center is a bond partner)
    and picks its f1/f3/f4 by matching itself against the center's triplet.
    """
    dtype = x.dtype
    n = x.shape[0]
    k_t = jnp.asarray(imp.k, dtype)
    chi_t = jnp.asarray(np.deg2rad(np.asarray(imp.chi0)), dtype)

    x4pad = jnp.concatenate([x, jnp.zeros((n, 1), dtype)], axis=1)

    def gxyz(j, has):
        return gather_padded(x4pad, jnp.where(has, j, n), BIG)[:, :3]

    def quad_ok(tri, center_alive, kc):
        i1, i3, i4 = tri[:, 0], tri[:, 1], tri[:, 2]
        return (center_alive & (kc > 0) & (i1 >= 0) & (i3 >= 0) & (i4 >= 0)
                & alive[jnp.clip(i1, 0, n - 1)]
                & alive[jnp.clip(i3, 0, n - 1)]
                & alive[jnp.clip(i4, 0, n - 1)])

    # ---- center role (I am i2) ----
    kc_self = k_t[jnp.clip(type_, 0, k_t.shape[0] - 1)]
    chi_self = chi_t[jnp.clip(type_, 0, chi_t.shape[0] - 1)]
    ok_c = quad_ok(impr, alive, kc_self)
    x1 = gxyz(jnp.clip(impr[:, 0], 0, n - 1), ok_c)
    x3 = gxyz(jnp.clip(impr[:, 1], 0, n - 1), ok_c)
    x4_ = gxyz(jnp.clip(impr[:, 2], 0, n - 1), ok_c)
    _, f2, _, _, en = _improper_quad_forces(box, x1, x, x3, x4_,
                                            kc_self, chi_self, ok_c)
    f = f2
    e = en if compute_energy else None  # whole energy at the center

    # ---- end roles (I am i1/i3/i4 of a partner's improper) ----
    me = jnp.arange(n, dtype=impr.dtype)
    for p in partners:
        ps = jnp.clip(p, 0, n - 1)
        tri = impr[ps]
        kc_p = k_t[jnp.clip(type_[ps], 0, k_t.shape[0] - 1)]
        chi_p = chi_t[jnp.clip(type_[ps], 0, chi_t.shape[0] - 1)]
        ok = (alive & (p >= 0) & alive[ps]) & quad_ok(tri, alive[ps], kc_p)
        sel1 = tri[:, 0] == me
        sel3 = tri[:, 1] == me
        sel4 = tri[:, 2] == me
        ok = ok & (sel1 | sel3 | sel4)
        xp = gxyz(ps, ok)
        x1 = jnp.where(sel1[:, None], x, gxyz(jnp.clip(tri[:, 0], 0, n - 1),
                                              ok))
        x3 = jnp.where(sel3[:, None], x, gxyz(jnp.clip(tri[:, 1], 0, n - 1),
                                              ok))
        x4_ = jnp.where(sel4[:, None], x, gxyz(jnp.clip(tri[:, 2], 0, n - 1),
                                               ok))
        f1, _, f3, f4, _ = _improper_quad_forces(box, x1, xp, x3, x4_,
                                                 kc_p, chi_p, ok)
        fmine = (jnp.where(sel1[:, None], f1, 0.0)
                 + jnp.where(sel3[:, None], f3, 0.0)
                 + jnp.where(sel4[:, None], f4, 0.0))
        f = f + jnp.where(ok[:, None], fmine, 0.0)
    return (f, e) if compute_energy else (f, None)


def langevin_force(lp: LangevinParams, cfg: SceneConfig, state):
    """fix langevin drag + random kicks (fix_langevin.cpp gfactor1/2)."""
    from ..state import per_atom_mass
    dtype = state.x.dtype
    m = per_atom_mass(cfg, state)
    damp = dtype.type(lp.damp)
    gamma = m / damp
    sigma = jnp.sqrt(24.0 * lp.temp * m / (cfg.dt * lp.damp))
    salt = rng.step_salt(lp.seed, state.step, PURPOSE_LANGEVIN)
    tagu = state.tag.astype(jnp.uint32)
    us = []
    for axis in range(3):
        bits = rng.hash3(tagu, jnp.uint32(axis + 1), salt)
        us.append(rng.uniform01(bits, dtype) - 0.5)
    u = jnp.stack(us, axis=-1)
    f = -gamma[:, None] * state.v + sigma[:, None] * u
    return jnp.where(state.alive[:, None], f, 0.0)
