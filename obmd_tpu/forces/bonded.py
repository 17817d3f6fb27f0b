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
                compute_energy: bool = False):
    """Force on every atom from its (up to two) FENE bonds.

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
    for partner in (bond1, bond2):
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
