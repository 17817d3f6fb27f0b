import dataclasses

import jax
import numpy as np

from obmd_tpu import scenes
from obmd_tpu.integrate import make_step, setup
from obmd_tpu.observe import make_profile_fn, make_thermo_fn
from obmd_tpu.state import kinetic_energy, temperature


def test_thermo_consistency():
    sc = scenes.closed_dpd_scene(n=600, box_l=6.0, seed=9)
    state = setup(sc.cfg, sc.state)
    th = make_thermo_fn(sc.cfg)(state)
    assert int(th.natoms) == 600
    np.testing.assert_allclose(float(th.temp),
                               float(temperature(sc.cfg, state)), rtol=1e-5)
    np.testing.assert_allclose(float(th.ke),
                               float(kinetic_energy(sc.cfg, state)),
                               rtol=1e-5)
    # Groot-Warren EOS for DPD: P ~ rho T + 0.101 a rho^2; here rho=2.78,
    # a=25 -> P ~ 2.8 + 19.5 ~ 22; loose sanity window
    assert 10.0 < float(th.pressure) < 40.0


def test_profiles_sum_rules():
    sc = scenes.obmd_dpd_scene(scale=0.15, seed=2, n_max=2600,
                               insert_kmax=4, force_path="nlist")
    state = setup(sc.cfg, sc.state)
    prof = make_profile_fn(sc.cfg, nbins=20)(state)
    # counts sum to natoms; density integrates to N/V
    assert int(np.asarray(prof.count).sum()) == int(state.natoms)
    vol_bin = sc.cfg.box.volume / 20
    np.testing.assert_allclose(np.asarray(prof.density).sum() * vol_bin,
                               float(state.natoms), rtol=1e-4)


def test_virial_pressure_matches_eos_after_equil():
    """Closed DPD box equilibrated: virial pressure ~ Groot-Warren EOS
    P = rho T + alpha a rho^2 with alpha ~ 0.101 (J Chem Phys 107, 4423)."""
    sc = scenes.closed_dpd_scene(n=3000, box_l=10.0, seed=3, temp=1.0)
    state = setup(sc.cfg, sc.state)
    step = jax.jit(make_step(sc.cfg), donate_argnums=0)
    for _ in range(400):
        state = step(state)
    th = make_thermo_fn(sc.cfg)(state)
    rho = 3.0
    p_eos = rho * 1.0 + 0.101 * 25.0 * rho**2
    assert abs(float(th.pressure) - p_eos) / p_eos < 0.15


def test_obmd_metrics_stream():
    from obmd_tpu.observe import make_obmd_metrics_fn
    sc = scenes.obmd_dpd_scene(scale=0.15, seed=2, n_max=2600, insert_kmax=4)
    state = setup(sc.cfg, sc.state)
    m = make_obmd_metrics_fn(sc.cfg)(state)
    assert int(m.nbuf_left) > 0 and int(m.nbuf_right) > 0
    assert int(m.nbuf_left) + int(m.nbuf_right) <= int(state.natoms)
    # setpoint x-components have the +pxx*A / -pxx*A signs (ref :607-630)
    assert float(m.momentum_force_left[0]) > 0
    assert float(m.momentum_force_right[0]) < 0
