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


def test_deck_ave_chunk_profiles(tmp_path):
    """compute chunk/atom bin/1d + fix ave/chunk (the OBMD profile
    workflow): density/number integrates to N/V, file format parses."""
    import numpy as np
    from obmd_tpu.io.lammps_data import DataFile, write_data
    from obmd_tpu.io.script import run_script

    r = np.random.RandomState(5)
    n = 400
    x = r.uniform([0.05, 0, 0], [7.95, 4, 4], (n, 3))
    df = DataFile(natoms=n, ntypes=1, box_lo=np.zeros(3),
                  box_hi=np.array([8.0, 4, 4]), masses=np.ones(1), x=x,
                  types=np.zeros(n, int), tags=np.arange(1, n + 1),
                  v=r.normal(0, 1, (n, 3)))
    p = tmp_path / "s.data"
    write_data(str(p), df)
    prof = tmp_path / "prof.out"
    deck = tmp_path / "in.p"
    deck.write_text(f"""
units lj
boundary p p p
atom_style atomic
read_data {p}
pair_style dpd 1.0 1.0 7
pair_coeff 1 1 25.0 4.5
compute cc all chunk/atom bin/1d x lower 0.05 units reduced
fix 1 all nve
fix 3 all ave/chunk 2 5 10 cc density/number vx temp file {prof}
timestep 0.01
thermo 10
run 20
""")
    run_script(str(deck), log_fn=lambda *a: None)
    txt = prof.read_text().splitlines()
    rows = [l.split() for l in txt if l.startswith("  ")]
    assert len(rows) == 40     # 20 bins x 2 output frames
    dens = np.asarray([float(r_[3]) for r_ in rows[-20:]])
    assert abs(dens.mean() - n / (8 * 4 * 4)) < 0.35
    temps = np.asarray([float(r_[5]) for r_ in rows[-20:]])
    assert 0.5 < temps.mean() < 2.5
