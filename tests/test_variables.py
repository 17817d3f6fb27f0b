"""Equal-style-variable analogues: callable boundary-law parameters traced
into the jitted step (ref fix_obmd_merged.cpp:563-572 re-evaluation)."""
import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu.integrate import make_grid_spec
from obmd_tpu.obmd import stage
from obmd_tpu.state import init_state
from tests.test_obmd_stage import _cfg

import dataclasses


def test_callable_pxx_wave():
    """pxx as a callable of sim time — the Couette/sound-wave config path
    (BASELINE.json configs 2-3)."""
    def pxx_fn(t):
        return 4.0 + 2.0 * jnp.sin(20.0 * t)

    cfg = _cfg(pxx=pxx_fn, nbuf=0.0)
    st = init_state(cfg, np.asarray([[5.0, 1.0, 1.0]]))
    spec = make_grid_spec(cfg)
    pre = jax.jit(lambda s: stage.pre_exchange(cfg, spec, s))
    st1 = pre(st)
    # factor uses t+dt for the wave but pxx itself is evaluated at t
    area = 16.0
    expect1 = (4.0 + 2.0 * np.sin(20.0 * 0.0)) * area
    np.testing.assert_allclose(float(st1.obmd.momentum_force_left[0]),
                               expect1, rtol=1e-5)
    # advance a few steps: the value must track sim_time
    st2 = pre(pre(st1))
    t = float(st1.sim_time) + float(st1.sim_time)  # 2 more calls, dt each
    expect3 = (4.0 + 2.0 * np.sin(20.0 * 3 * 0.01)) * area
    # evaluated at the *pre-advance* time of the 3rd call = 2*dt
    expect3 = (4.0 + 2.0 * np.sin(20.0 * 2 * 0.01)) * area
    np.testing.assert_allclose(float(st2.obmd.momentum_force_left[0]),
                               expect3, rtol=1e-4)


def test_callable_alpha_tau():
    calls = dict(n=0)

    def alpha_fn(t):
        return 0.5 + 0.0 * t

    cfg = _cfg(nbuf=4.0)
    cfg = dataclasses.replace(
        cfg, obmd=dataclasses.replace(cfg.obmd, alpha=alpha_fn))
    st = init_state(cfg, np.asarray([[5.0, 2.0, 2.0]]))
    spec = make_grid_spec(cfg)
    st2 = jax.jit(lambda s: stage.pre_exchange(cfg, spec, s))(st)
    # alpha=0.5, nbuf=4 -> 2 insertions per buffer as in the static test
    assert int(st2.obmd.ninserted) == 4


def test_atom_style_variable_dump(tmp_path):
    """variable ... atom <expr> evaluated per atom and consumed as a
    `dump custom` v_name column (variable.cpp atom style)."""
    import numpy as np
    from obmd_tpu.io.lammps_data import DataFile, write_data
    from obmd_tpu.io.script import run_script

    r = np.random.RandomState(1)
    n = 40
    x = r.uniform(0.2, 3.8, (n, 3))
    df = DataFile(natoms=n, ntypes=1, box_lo=np.zeros(3),
                  box_hi=np.full(3, 4.0), masses=np.ones(1), x=x,
                  types=np.zeros(n, int), tags=np.arange(1, n + 1))
    data = tmp_path / "s.data"
    write_data(str(data), df)
    out = tmp_path / "d.custom"
    deck = tmp_path / "in.v"
    deck.write_text(f"""
units lj
boundary p p p
atom_style atomic
read_data {data}
pair_style dpd 1.0 1.0 7
pair_coeff 1 1 10.0 4.5
variable ke2 atom vx*vx+vy*vy+vz*vz
variable off equal 3.0
variable zshift atom z+v_off
fix 1 all nve
timestep 0.005
dump 1 all custom 2 {out} id x v_ke2 v_zshift
thermo 2
thermo_style custom step temp v_off
run 2
""")
    lines = []
    it = run_script(str(deck), log_fn=lines.append)
    txt = out.read_text()
    assert "v_ke2" in txt and "v_zshift" in txt
    # parse the last frame and check v_zshift == z + 3.0 for one atom
    rows = [l.split() for l in txt.strip().splitlines()[-n:]]
    import numpy as np
    alive = np.asarray(it.state.alive)
    zs = {int(t): float(z) for t, z in
          zip(np.asarray(it.state.tag)[alive],
              np.asarray(it.state.x)[alive][:, 2])}
    for row in rows[:5]:
        tid, xx, ke2, zshift = int(row[0]), *map(float, row[1:])
        assert abs(zshift - (zs[tid] + 3.0)) < 1e-4
    # thermo v_off column resolved
    assert any(l.split()[-1] == "3.0" for l in lines if l.strip())
