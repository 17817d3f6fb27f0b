"""Rigid-body integration of template molecules — the reference's fix obmd
`rigid` keyword (fix_obmd_merged.cpp:475-500, 1163-1168: inserted molecules
are registered with a rigid fix and integrated as rigid bodies).

TPU-native scheme with NO persistent per-body state: each half-step
recomputes every body's mass / COM / momentum / angular momentum / inertia
by directed message passing over the bond graph (the adress.py
construction), exact for chain/tree topologies after `natoms - 1` rounds.
The payload travels in the RECEIVER's position frame — each graph edge
shifts the moment sums by the min-imaged partner displacement, so bodies
that straddle a periodic face aggregate correctly.

Velocity-Verlet split (fix_rigid.cpp's role in initial/final_integrate):

  initial: after the plain half-kick, drift the COM and rotate the body by
           the EXACT Rodrigues rotation R(omega dt) — bond lengths stay at
           template geometry to f32 roundoff (a linearized x += dt v drift
           would stretch them by (omega dt)^2/2 per step);
  final:   after the plain half-kick, project member velocities back onto
           the rigid field v = V + omega x r.

Angular velocity solves I omega = L with a tiny diagonal regularizer: for
a LINEAR molecule I is singular along the axis, but L is automatically
perpendicular to the axis (r || axis => m r x v _|_ axis), so the
regularized solve is exact where it matters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import SceneConfig
from .state import State, per_atom_mass


def _shift(msg, s):
    """Re-express a moment payload in a frame displaced by s (receiver =
    sender position + s): delta' = delta + s.

    Channels: [0] W=sum m, [1:4] S=sum m*delta, [4:7] P=sum m*v,
    [7:10] J=sum m delta x v, [10] Q2=sum m |delta|^2,
    [11:17] T=sum m delta delta^T (xx, yy, zz, xy, xz, yz)."""
    W = msg[:, 0:1]
    S = msg[:, 1:4]
    P = msg[:, 4:7]
    J = msg[:, 7:10]
    Q2 = msg[:, 10:11]
    T = msg[:, 11:17]
    S2 = S + W * s
    J2 = J + jnp.cross(s, P)
    Q22 = Q2 + 2.0 * jnp.sum(s * S, axis=1, keepdims=True) \
        + W * jnp.sum(s * s, axis=1, keepdims=True)
    sx, sy, sz = s[:, 0:1], s[:, 1:2], s[:, 2:3]
    Sx, Sy, Sz = S[:, 0:1], S[:, 1:2], S[:, 2:3]
    T2 = jnp.concatenate([
        T[:, 0:1] + 2.0 * sx * Sx + W * sx * sx,
        T[:, 1:2] + 2.0 * sy * Sy + W * sy * sy,
        T[:, 2:3] + 2.0 * sz * Sz + W * sz * sz,
        T[:, 3:4] + sx * Sy + sy * Sx + W * sx * sy,
        T[:, 4:5] + sx * Sz + sz * Sx + W * sx * sz,
        T[:, 5:6] + sy * Sz + sz * Sy + W * sy * sz,
    ], axis=1)
    return jnp.concatenate([W, S2, P, J2, Q22, T2], axis=1)


def body_moments(box, x, v, mass, bond1, bond2, member, rounds: int,
                 more_partners=()):
    """Per-atom body moments in each atom's own frame, from raw arrays
    (bond1/bond2 [+ more_partners for branched topologies] are partner ROW
    indices, -1 = none — the slab path resolves its tag-keyed columns to
    local rows first).  Returns
    (M [N,1], rbar [N,3] = COM - x_me, V [N,3], L [N,3] about the COM,
    I [N,6] about the COM)."""
    n = x.shape[0]
    m = jnp.where(member, mass, 0.0)
    mv = m[:, None] * v
    zeros3 = jnp.zeros_like(x)
    A = jnp.concatenate([m[:, None], zeros3, mv, zeros3,
                         jnp.zeros((n, 7), x.dtype)], axis=1)   # [N,17]

    cols = (bond1, bond2) + tuple(more_partners)
    K = len(cols)
    ps_all = tuple(jnp.where(member, c, -1) for c in cols)
    me = jnp.arange(n, dtype=jnp.int32)

    def incoming(msgs, p):
        ps = jnp.clip(p, 0, n - 1)
        from_p = jnp.zeros_like(A)
        for k in range(K):
            toward_me = (cols[k][ps] == me)[:, None]
            from_p = jnp.where(toward_me, msgs[k][ps], from_p)
        s = box.min_image(jnp.where((p >= 0)[:, None], x[ps] - x, 0.0))
        out = _shift(from_p, s)
        return jnp.where((p >= 0)[:, None], out, 0.0)

    msgs = [jnp.zeros_like(A) for _ in range(K)]
    for _ in range(rounds):
        ins = [incoming(msgs, p) for p in ps_all]
        msgs = [A + sum(ins[j] for j in range(K) if j != k)
                for k in range(K)]
    tot = A + sum(incoming(msgs, p) for p in ps_all)
    return _moments_from_total(tot)


def _moments_from_total(tot):

    M = jnp.maximum(tot[:, 0:1], 1e-30)
    rbar = tot[:, 1:4] / M
    V = tot[:, 4:7] / M
    J = tot[:, 7:10]
    Q2 = tot[:, 10:11]
    T = tot[:, 11:17]
    L = J - jnp.cross(rbar, M * V)
    # I_com = (Q2 E - T) - M (|rbar|^2 E - rbar rbar^T)
    rb2 = jnp.sum(rbar * rbar, axis=1, keepdims=True)
    d = Q2 - M * rb2
    Ixx = d + (-T[:, 0:1] + M * rbar[:, 0:1] ** 2)
    Iyy = d + (-T[:, 1:2] + M * rbar[:, 1:2] ** 2)
    Izz = d + (-T[:, 2:3] + M * rbar[:, 2:3] ** 2)
    Ixy = -T[:, 3:4] + M * rbar[:, 0:1] * rbar[:, 1:2]
    Ixz = -T[:, 4:5] + M * rbar[:, 0:1] * rbar[:, 2:3]
    Iyz = -T[:, 5:6] + M * rbar[:, 1:2] * rbar[:, 2:3]
    I6 = jnp.concatenate([Ixx, Iyy, Izz, Ixy, Ixz, Iyz], axis=1)
    return M, rbar, V, L, I6


def _body_sums(cfg: SceneConfig, state: State, v, member, rounds: int):
    """State-level wrapper over body_moments (partner SLOT columns)."""
    return body_moments(cfg.box, state.x, v, per_atom_mass(cfg, state),
                        state.bond1, state.bond2, member, rounds,
                        more_partners=state.bond_partners[2:])


def rigid_kinematics(box, x, v, mass, bond1, bond2, member, rounds, dt,
                     more_partners=()):
    """One rigid drift's kinematics from raw arrays: returns
    (x_rigid, v_rigid) for member rows (garbage elsewhere — mask with
    `member`).  Shared by the single-chip drift and the slab path."""
    M, rbar, V, L, I6 = body_moments(box, x, v, mass, bond1, bond2,
                                     member, rounds,
                                     more_partners=more_partners)
    omega = _solve_omega(I6, L)
    r_new = _rotate(-rbar, omega, dt)            # my offset from the COM
    x_rigid = x + rbar + dt * V + r_new          # X' + R r
    I6_new = _rotate_inertia(I6, omega, dt)
    omega_new = _solve_omega(I6_new, L)          # L conserved through R
    v_rigid = V + jnp.cross(omega_new, r_new)
    return x_rigid, v_rigid


def _solve_omega(I6, L):
    """omega from I omega = L, symmetric 3x3 cofactor solve with a diagonal
    regularizer (linear molecules: I singular along the axis, L _|_ axis)."""
    eps = 1e-6 * jnp.maximum(I6[:, 0] + I6[:, 1] + I6[:, 2], 1e-6)
    a = I6[:, 0] + eps
    b = I6[:, 1] + eps
    c = I6[:, 2] + eps
    d, e, f = I6[:, 3], I6[:, 4], I6[:, 5]   # xy, xz, yz
    # adjugate of [[a,d,e],[d,b,f],[e,f,c]]
    A00 = b * c - f * f
    A01 = e * f - d * c
    A02 = d * f - b * e
    A11 = a * c - e * e
    A12 = d * e - a * f
    A22 = a * b - d * d
    det = a * A00 + d * A01 + e * A02
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    lx, ly, lz = L[:, 0], L[:, 1], L[:, 2]
    wx = (A00 * lx + A01 * ly + A02 * lz) / det
    wy = (A01 * lx + A11 * ly + A12 * lz) / det
    wz = (A02 * lx + A12 * ly + A22 * lz) / det
    return jnp.stack([wx, wy, wz], axis=1)


def _rotate(r, omega, dt):
    """Exact Rodrigues rotation of r by angle |omega| dt about omega."""
    th = jnp.linalg.norm(omega, axis=1, keepdims=True) * dt
    small = th < 1e-8
    k = omega * dt / jnp.maximum(th, 1e-30)
    cos = jnp.cos(th)
    sin = jnp.sin(th)
    rot = (r * cos + jnp.cross(k, r) * sin
           + k * jnp.sum(k * r, axis=1, keepdims=True) * (1.0 - cos))
    return jnp.where(small, r, rot)


def _rounds(cfg: SceneConfig) -> int:
    n = cfg.obmd.mol_natoms_max if cfg.obmd is not None else 0
    return max(1, (n - 1) if n else 2)


def _member(cfg: SceneConfig, state: State):
    return state.alive & (state.mol != 0)


def _rotate_inertia(I6, omega, dt):
    """I' = R I R^T for the Rodrigues rotation R(omega dt), per row."""
    th = jnp.linalg.norm(omega, axis=1, keepdims=True) * dt
    k = omega * dt / jnp.maximum(th, 1e-30)
    small = (th < 1e-8)[:, 0]
    cos = jnp.cos(th)[:, 0]
    sin = jnp.sin(th)[:, 0]
    kx, ky, kz = k[:, 0], k[:, 1], k[:, 2]
    one_c = 1.0 - cos
    # rotation matrix entries (Rodrigues)
    R = jnp.stack([
        jnp.stack([cos + kx * kx * one_c, kx * ky * one_c - kz * sin,
                   kx * kz * one_c + ky * sin], axis=-1),
        jnp.stack([ky * kx * one_c + kz * sin, cos + ky * ky * one_c,
                   ky * kz * one_c - kx * sin], axis=-1),
        jnp.stack([kz * kx * one_c - ky * sin, kz * ky * one_c + kx * sin,
                   cos + kz * kz * one_c], axis=-1)], axis=-2)   # [N,3,3]
    Imat = jnp.stack([
        jnp.stack([I6[:, 0], I6[:, 3], I6[:, 4]], axis=-1),
        jnp.stack([I6[:, 3], I6[:, 1], I6[:, 5]], axis=-1),
        jnp.stack([I6[:, 4], I6[:, 5], I6[:, 2]], axis=-1)], axis=-2)
    # [N,3,3] batch products on the VPU (precision-safe: tiny matrices)
    RI = jnp.einsum("nab,nbc->nac", R, Imat,
                    precision=jax.lax.Precision.HIGHEST)
    I2 = jnp.einsum("nab,ncb->nac", RI, R,
                    precision=jax.lax.Precision.HIGHEST)
    out = jnp.stack([I2[:, 0, 0], I2[:, 1, 1], I2[:, 2, 2],
                     I2[:, 0, 1], I2[:, 0, 2], I2[:, 1, 2]], axis=-1)
    return jnp.where(small[:, None], I6, out)


def rigid_drift(cfg: SceneConfig, state: State, v):
    """The initial_integrate drift with rigid members moved as bodies.
    `v` is the half-kicked velocity.  Returns (x_new, v_new).

    The body's angular momentum L is CARRIED through the rotation: the
    post-rotation velocity field uses omega' = (R I R^T)^-1 L — not the
    pre-rotation omega — so torque-free tops precess exactly like Euler's
    equations as dt -> 0.  (Re-deriving L from velocities built with the
    old omega froze omega instead and leaked L: a constant-rotation-axis
    bug caught by the fix rigid/small golden comparison,
    validation/run_rigid_golden.py.)"""
    dt = state.x.dtype.type(cfg.dt)
    member = _member(cfg, state)
    x_rigid, v_rigid = rigid_kinematics(
        cfg.box, state.x, v, per_atom_mass(cfg, state), state.bond1,
        state.bond2, member, _rounds(cfg), dt,
        more_partners=state.bond_partners[2:])
    a3 = state.alive[:, None]
    mem3 = member[:, None]
    x = jnp.where(mem3, x_rigid, jnp.where(a3, state.x + dt * v, state.x))
    vout = jnp.where(mem3, v_rigid, v)
    return cfg.box.wrap(x), vout


def rigid_project(cfg: SceneConfig, state: State, v):
    """The final_integrate velocity projection: members get the rigid
    field v = V + omega x (x - X)."""
    member = _member(cfg, state)
    M, rbar, V, L, I6 = _body_sums(cfg, state, v, member, _rounds(cfg))
    omega = _solve_omega(I6, L)
    v_rigid = V + jnp.cross(omega, -rbar)
    return jnp.where(member[:, None], v_rigid, v)
