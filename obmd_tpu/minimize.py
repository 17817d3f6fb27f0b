"""Energy minimization — the reference's Min driver slice (min.cpp /
min_fire.cpp: `minimize etol ftol maxiter maxeval` + `min_style fire`).

FIRE (fast inertial relaxation engine) over the existing force paths:
velocity-Verlet steps with velocity-force mixing, adaptive timestep, and
a dead-stop on uphill power — the standard MD minimizer and the natural
fit for a jitted fixed-shape loop (CG's line searches are host-sequential
by construction).  Runs as one `lax.while_loop`; convergence on the
force-infinity-norm `ftol` or relative energy change `etol`
(min.cpp stopping criteria), whichever triggers first.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .config import SceneConfig
from .state import State, per_atom_mass

# FIRE parameters (min_fire.cpp defaults)
DELAYSTEP = 5
DT_GROW = 1.1
DT_SHRINK = 0.5
ALPHA0 = 0.1
ALPHA_SHRINK = 0.99
TMAX = 10.0   # dt ceiling = TMAX * dt0


@dataclasses.dataclass
class MinResult:
    state: State
    iters: int
    fmax: float
    energy: float
    converged: bool


def _force_energy_fn(cfg: SceneConfig):
    """(state, x) -> (f, pe_total) on the scene's force machinery."""
    from .cells import build_cells
    from .integrate import _extra_forces, make_grid_spec
    from .forces.pairs import pair_sweep
    spec = make_grid_spec(cfg)
    # conservative-only pair params: zero velocities kill the drag and a
    # zero-temperature copy kills the random force (sigma = sqrt(2 T g))
    pair = cfg.pair
    if hasattr(pair, "temp"):
        pair = dataclasses.replace(pair, temp=0.0)
    cfg_c = dataclasses.replace(cfg, pair=pair, langevin=None)

    def fe(state: State):
        ctab = build_cells(spec, state.x, state.alive)
        pf = pair_sweep(cfg_c.pair, cfg.box, spec, ctab, state.x,
                        jnp.zeros_like(state.v), state.type, state.tag,
                        state.q, jnp.uint32(0), dt=cfg.dt,
                        compute_energy=True)
        f = _extra_forces(cfg_c, state, pf.f)
        f = jnp.where(state.alive[:, None], f, 0.0)
        pe = jnp.sum(jnp.where(state.alive, pf.pe, 0.0))
        return f, pe

    return fe


def minimize(cfg: SceneConfig, state: State, *, ftol: float = 1e-6,
             etol: float = 0.0, maxiter: int = 1000) -> MinResult:
    """FIRE minimization of the conservative energy (pair conservative +
    bond/angle terms via _extra_forces; DPD drag/noise and boundary-force
    fixes do not enter a potential and are excluded by zeroed velocities
    and the conservative-only sweep)."""
    cfg = cfg.finalize()
    if cfg.obmd is not None:
        raise ValueError("minimize: open-boundary stages do not define a "
                         "potential; minimize the closed scene")
    fe = _force_energy_fn(cfg)
    m = per_atom_mass(cfg, state)[:, None]
    dt0 = jnp.asarray(cfg.dt, state.x.dtype)

    def fmax_of(f):
        return jnp.max(jnp.abs(f))

    def cond(carry):
        st, v, f, pe, pe_prev, dt, alpha, n_pos, it = carry
        fmax = fmax_of(f)
        ediff = jnp.abs(pe - pe_prev)
        enorm = jnp.abs(pe) + jnp.abs(pe_prev) + 1e-30
        not_conv = fmax > ftol
        if etol > 0.0:
            not_conv = not_conv & (ediff > etol * 0.5 * enorm)
        return not_conv & (it < maxiter)

    def body(carry):
        st, v, f, pe_prev2, pe_prev, dt, alpha, n_pos, it = carry
        a3 = st.alive[:, None]
        # velocity-Verlet with FIRE mixing (min_fire.cpp iterate())
        v = jnp.where(a3, v + dt * f / m, 0.0)
        P = jnp.sum(v * f)
        fnorm = jnp.sqrt(jnp.sum(f * f)) + 1e-30
        vnorm = jnp.sqrt(jnp.sum(v * v))
        v_mix = (1.0 - alpha) * v + alpha * (f / fnorm) * vnorm
        uphill = P <= 0.0
        v = jnp.where(uphill, jnp.zeros_like(v), v_mix)
        grow = (~uphill) & (n_pos > DELAYSTEP)
        dt = jnp.where(grow, jnp.minimum(dt * DT_GROW, TMAX * dt0),
                       jnp.where(uphill, dt * DT_SHRINK, dt))
        alpha = jnp.where(grow, alpha * ALPHA_SHRINK,
                          jnp.where(uphill, ALPHA0, alpha))
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        x = cfg.box.wrap(jnp.where(a3, st.x + dt * v, st.x))
        st = st.replace(x=x)
        f, pe = fe(st)
        return (st, v, f, pe_prev, pe, dt, alpha, n_pos, it + 1)

    f0, pe0 = fe(state)
    init = (state, jnp.zeros_like(state.v), f0, pe0 + 1.0, pe0, dt0,
            jnp.asarray(ALPHA0, state.x.dtype), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32))
    out = jax.jit(lambda c: jax.lax.while_loop(cond, body, c))(init)
    st, v, f, _pe_prev, pe, dt, alpha, n_pos, it = out
    fmax = float(jnp.max(jnp.abs(f)))
    return MinResult(state=st.replace(f=f, v=jnp.zeros_like(st.v)),
                     iters=int(it), fmax=fmax, energy=float(pe),
                     converged=bool(fmax <= ftol or int(it) < maxiter))
