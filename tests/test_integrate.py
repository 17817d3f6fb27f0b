import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obmd_tpu import scenes
from obmd_tpu.integrate import make_step, setup, run_loop
from obmd_tpu.state import momentum, temperature, kinetic_energy


def test_nve_energy_conservation_lj():
    """Pure conservative dynamics (gamma=0, T=0 -> no thermostat): total
    energy must be conserved to f32 tolerance."""
    from obmd_tpu.config import Capacity, DPDParams, SceneConfig
    from obmd_tpu.geometry import Box
    from obmd_tpu.observe import make_thermo_fn
    from obmd_tpu.state import init_state

    n = 500
    box = Box((0.0, 0.0, 0.0), (5.5, 5.5, 5.5), (True, True, True))
    # conservative-only DPD (gamma=0, T=0): soft potential, great for NVE
    pair = DPDParams.create(temp=0.0, cutoff=1.0, seed=1, a0=25.0, gamma=0.0)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.01,
                      capacity=Capacity(n_max=n, cell_capacity=32))
    r = np.random.default_rng(0)
    x = r.uniform(0, 5.5, (n, 3))
    v = r.normal(0, 1.0, (n, 3))
    v -= v.mean(axis=0)
    state = init_state(cfg, x, v=v)
    state = setup(cfg, state)
    thermo = make_thermo_fn(cfg)
    t0 = thermo(state)
    e0 = float(t0.pe + t0.ke)
    step = jax.jit(make_step(cfg))
    for _ in range(200):
        state = step(state)
    t1 = thermo(state)
    e1 = float(t1.pe + t1.ke)
    assert abs(e1 - e0) / (abs(e0) + 1e-9) < 2e-3
    # momentum exactly conserved (pairwise antisymmetric forces)
    p1 = np.asarray(momentum(cfg, state))
    assert np.abs(p1).max() < 1e-2


def test_dpd_thermostat_temperature():
    """Milestone A (SURVEY.md §7): closed-box DPD run must equilibrate to
    the thermostat temperature (Groot-Warren: small dt bias expected;
    dt=0.04, expect T within ~3% of target)."""
    sc = scenes.closed_dpd_scene(n=2000, box_l=8.736, seed=1, temp=1.0)
    state = setup(sc.cfg, sc.state)
    step = jax.jit(make_step(sc.cfg), donate_argnums=0)
    for _ in range(300):
        state = step(state)
    temps = []
    for _ in range(300):
        state = step(state)
        temps.append(float(temperature(sc.cfg, state)))
    t_mean = np.mean(temps)
    assert 0.95 < t_mean < 1.08, t_mean


def test_momentum_zero_without_noise_asymmetry():
    """DPD with noise: net momentum stays ~0 over many steps because the
    pair noise is symmetric (Newton's third law holds exactly)."""
    sc = scenes.closed_dpd_scene(n=1000, box_l=7.0, seed=2, temp=1.0)
    state = setup(sc.cfg, sc.state)
    step = jax.jit(make_step(sc.cfg), donate_argnums=0)
    for _ in range(100):
        state = step(state)
    p = np.asarray(momentum(sc.cfg, state))
    assert np.abs(p).max() < 5e-2


def test_step_count_and_wrap():
    sc = scenes.closed_dpd_scene(n=500, box_l=6.0, seed=3)
    state = setup(sc.cfg, sc.state)
    step = jax.jit(make_step(sc.cfg))
    state = step(state)
    assert int(state.step) == 1
    x = np.asarray(state.x)[np.asarray(state.alive)]
    assert (x >= 0).all() and (x <= 6.0).all()
    assert int(state.cell_overflow) == 0
