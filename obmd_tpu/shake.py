"""SHAKE/RATTLE holonomic distance constraints.

Counterpart of the reference's `fix obmd ... shake <fix-ID>` hand-off
(fix_obmd_merged.cpp:1163-1168 FixShake::set_molecule) and the SHAKE fix
itself (RIGID/fix_shake.cpp).  TPU-first redesign: instead of the
reference's per-cluster closed-form solves (shake2/shake3/shake3angle) over
dynamically-built cluster lists, the constraint set lives on the per-atom
bond columns (State.bond1/bond2) and is satisfied by a fixed, trace-time-
unrolled number of Jacobi SHAKE sweeps evaluated symmetrically from both
endpoints — every atom computes its own correction, so there is no
scatter-add and XLA fuses the whole solve into the step.  Velocity
constraints are RATTLE projections applied after each kick.

Constraint targets are a per-atom-type-pair distance table d0[ti, tj]
(> 0 = constrained), built from the insertion template's own bonded-pair
geometry (shake_table_from_templates) — the analogue of `fix shake ...
b <btypes> a <atypes>` pulling distances from bond/angle coefficients.
A water-like template encodes its angle constraint as the closing H-H
bond of the triangle, exactly like fix shake's `a` constraint becomes a
third distance (fix_shake.cpp shake3angle).

Jacobi linearization per sweep, for constraint (i, j) with target d0:
    g = (d0^2 - |r|^2) / (2 (1/m_i + 1/m_j) <r_ref, r>)
    x_i += g/m_i * r_ref          x_j -= g/m_j * r_ref
which satisfies the constraint exactly to first order (classic SHAKE,
Ryckaert 1977) and converges geometrically for the small coupled clusters
the reference's shake surface allows (2-4 atoms).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .cells import BIG, gather_padded
from .config import SceneConfig, ShakeParams
from .geometry import Box


def _d0_table(shake: ShakeParams, dtype):
    return jnp.asarray(np.asarray(shake.d0), dtype)


def _pair_view(box: Box, x, j, has):
    """Min-image displacement x_i - x_j with dead rows parked at BIG."""
    n = x.shape[0]
    x4 = jnp.concatenate([x, jnp.zeros((n, 1), x.dtype)], axis=1)
    xj = gather_padded(x4, jnp.where(has, j, n), BIG)[:, :3]
    return box.min_image(x - xj)


def shake_positions(cfg: SceneConfig, x_ref, x, v, type_, bond1, bond2,
                    alive, invm, more_partners=()):
    """Constrain post-drift positions; returns (x, v) with the constraint
    displacement also applied to v (dx/dt), the velocity-Verlet SHAKE
    splitting.  x_ref = pre-drift positions (the constraint gradient is
    taken along the old bond, Ryckaert's original scheme — unconditionally
    stable for MD-sized drifts)."""
    shake = cfg.shake
    box = cfg.box
    dtype = x.dtype
    n = x.shape[0]
    d0t = _d0_table(shake, dtype)
    nt = d0t.shape[0]
    dt = dtype.type(cfg.dt)
    eps = dtype.type(1e-12)

    cols = []
    for partner in (bond1, bond2) + tuple(more_partners):
        j = jnp.clip(partner, 0, n - 1)
        tj = jnp.clip(type_[j], 0, nt - 1)
        ti = jnp.clip(type_, 0, nt - 1)
        d0 = d0t[ti, tj]
        has = alive & (partner >= 0) & alive[j] & (d0 > 0)
        rref = _pair_view(box, x_ref, j, has)
        rref = jnp.where(has[:, None], rref, 0.0)
        winv = jnp.where(has, invm + invm[j], 1.0)
        cols.append((j, has, d0, rref, winv))

    # Accumulate the correction at its OWN magnitude (~1e-3) instead of
    # rounding it through x (~box size) each sweep: v inherits dx/dt, and
    # position-magnitude rounding would leak ~ulp(x)/dt of momentum per
    # step; with a separate accumulator the m_i dx_i + m_j dx_j = 0
    # cancellation survives f32.
    dx_acc = jnp.zeros((n, 3), dtype)
    for _ in range(shake.iters):       # trace-time unroll: fuses on TPU
        x_cur = x + dx_acc
        dx = jnp.zeros((n, 3), dtype)
        for j, has, d0, rref, winv in cols:
            r = _pair_view(box, x_cur, j, has)
            rsq = jnp.sum(r * r, axis=-1)
            diff = d0 * d0 - rsq
            denom = 2.0 * winv * jnp.sum(rref * r, axis=-1)
            # keep the sign, floor the magnitude (fix_shake.cpp's
            # "determinant" guard; a near-orthogonal rref/r pair means the
            # cluster tumbled farther than a timestep should allow)
            denom = jnp.where(jnp.abs(denom) < eps,
                              jnp.where(denom < 0, -eps, eps), denom)
            g = jnp.where(has, diff / denom, 0.0)
            dx = dx + (g * invm)[:, None] * rref
        dx_acc = dx_acc + dx
    v_out = v + dx_acc / dt
    return box.wrap(x + dx_acc), v_out


def rattle_velocities(cfg: SceneConfig, x, v, type_, bond1, bond2, alive,
                      invm, more_partners=()):
    """Project constrained pairs' relative velocity out of the bond
    direction (RATTLE's velocity stage): after convergence
    <v_i - v_j, r_ij> = 0 for every constraint."""
    shake = cfg.shake
    box = cfg.box
    dtype = x.dtype
    n = x.shape[0]
    d0t = _d0_table(shake, dtype)
    nt = d0t.shape[0]
    eps = dtype.type(1e-12)

    cols = []
    for partner in (bond1, bond2) + tuple(more_partners):
        j = jnp.clip(partner, 0, n - 1)
        tj = jnp.clip(type_[j], 0, nt - 1)
        ti = jnp.clip(type_, 0, nt - 1)
        d0 = d0t[ti, tj]
        has = alive & (partner >= 0) & alive[j] & (d0 > 0)
        r = _pair_view(box, x, j, has)
        r = jnp.where(has[:, None], r, 0.0)
        rsq = jnp.maximum(jnp.sum(r * r, axis=-1), eps)
        winv = jnp.where(has, invm + invm[j], 1.0)
        cols.append((j, has, r, rsq, winv))

    # separate accumulator for the same momentum-cancellation reason as
    # shake_positions
    dv_acc = jnp.zeros((n, 3), dtype)
    for _ in range(shake.vel_iters):
        v_cur = v + dv_acc
        dv = jnp.zeros((n, 3), dtype)
        for j, has, r, rsq, winv in cols:
            vrel = v_cur - v_cur[j]
            mu = jnp.where(has, jnp.sum(vrel * r, axis=-1) / (winv * rsq),
                           0.0)
            dv = dv - (mu * invm)[:, None] * r
        dv_acc = dv_acc + dv
    return v + dv_acc


def constraint_error(cfg: SceneConfig, state) -> jnp.ndarray:
    """Max |r - d0| over live constraints (diagnostic / test gate)."""
    shake = cfg.shake
    box = cfg.box
    x = state.x
    dtype = x.dtype
    n = x.shape[0]
    d0t = _d0_table(shake, dtype)
    nt = d0t.shape[0]
    err = jnp.zeros((), dtype)
    for partner in state.bond_partners:
        j = jnp.clip(partner, 0, n - 1)
        ti = jnp.clip(state.type, 0, nt - 1)
        tj = jnp.clip(state.type[j], 0, nt - 1)
        d0 = d0t[ti, tj]
        has = state.alive & (partner >= 0) & state.alive[j] & (d0 > 0)
        r = _pair_view(box, x, j, has)
        d = jnp.sqrt(jnp.maximum(jnp.sum(r * r, axis=-1), 1e-12))
        err = jnp.maximum(err, jnp.max(jnp.where(has, jnp.abs(d - d0), 0.0)))
    return err
