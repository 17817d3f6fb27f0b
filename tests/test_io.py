import os

import numpy as np
import pytest

from obmd_tpu.io import lammps_data
from obmd_tpu.io.checkpoint import load_checkpoint, save_checkpoint


def test_read_reference_style_data(tmp_path):
    p = tmp_path / "test.data"
    p.write_text("""DPD water

\t6 atoms
\t2 atom types

\t0.0 \t 10.0 xlo xhi
\t0.0 \t 4.0 ylo yhi
\t0.0 \t 4.0 zlo zhi

Masses

\t1 \t 1
\t2 \t 2.5

Atoms

    1     1 6.075 2.299 3.045
    2     1 0.319 3.254 3.249
    3     2 1.500 2.952 3.983
    4     1 2.062 1.286 1.762
    5     2 9.571 3.786 2.377
    6     1 5.781 0.411 0.964

Velocities

    1 0.1 0.2 0.3
    2 -0.1 0.0 0.0
    3 0.0 0.0 0.0
    4 0.5 0.5 0.5
    5 0.0 -1.0 0.0
    6 0.0 0.0 1.0
""")
    df = lammps_data.read_data(str(p))
    assert df.natoms == 6 and df.ntypes == 2
    np.testing.assert_allclose(df.box_hi, [10, 4, 4])
    np.testing.assert_allclose(df.masses, [1.0, 2.5])
    assert df.types.tolist() == [0, 0, 1, 0, 1, 0]
    np.testing.assert_allclose(df.x[0], [6.075, 2.299, 3.045])
    np.testing.assert_allclose(df.v[4], [0, -1, 0])


def test_data_roundtrip(tmp_path):
    r = np.random.default_rng(0)
    df = lammps_data.DataFile(
        natoms=5, ntypes=1, box_lo=np.zeros(3), box_hi=np.ones(3) * 8,
        masses=np.asarray([1.0]), x=r.uniform(0, 8, (5, 3)),
        types=np.zeros(5, np.int32), tags=np.arange(1, 6, dtype=np.int32),
        v=r.normal(0, 1, (5, 3)))
    p = str(tmp_path / "rt.data")
    lammps_data.write_data(p, df)
    back = lammps_data.read_data(p)
    np.testing.assert_allclose(back.x, df.x, rtol=1e-12)
    np.testing.assert_allclose(back.v, df.v, rtol=1e-12)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from obmd_tpu import scenes
    from obmd_tpu.integrate import make_step, rebuild_neighbors, setup

    sc = scenes.closed_dpd_scene(n=300, box_l=5.0, seed=5)
    state = setup(sc.cfg, sc.state)
    step = jax.jit(make_step(sc.cfg))
    for _ in range(10):
        state = step(state)

    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, sc.cfg, state)
    cfg2, state2 = load_checkpoint(p)
    assert cfg2.dt == sc.cfg.dt
    np.testing.assert_array_equal(np.asarray(state2.x), np.asarray(state.x))
    np.testing.assert_array_equal(np.asarray(state2.tag), np.asarray(state.tag))
    assert int(state2.step) == int(state.step)
    assert float(state2.sim_time) == float(state.sim_time)

    # resumed run must be bitwise identical to continued run (deterministic
    # counter-based RNG — the restart gap the reference has, SURVEY.md §5)
    state_c = step(state)
    state_r = step(rebuild_neighbors(cfg2, state2))
    np.testing.assert_array_equal(np.asarray(state_c.x), np.asarray(state_r.x))
    np.testing.assert_array_equal(np.asarray(state_c.v), np.asarray(state_r.v))


def test_dump_writers(tmp_path):
    from obmd_tpu import scenes
    from obmd_tpu.io.dump import write_custom_frame, write_xyz_frame

    sc = scenes.closed_dpd_scene(n=50, box_l=4.0, seed=1)
    xyz = str(tmp_path / "t.xyz")
    write_xyz_frame(xyz, sc.cfg, sc.state, append=False)
    lines = open(xyz).read().splitlines()
    assert lines[0] == "50"
    assert len(lines) == 52

    cus = str(tmp_path / "t.dump")
    write_custom_frame(cus, sc.cfg, sc.state, append=False)
    content = open(cus).read()
    assert "ITEM: TIMESTEP" in content and "ITEM: ATOMS" in content


def test_native_io_roundtrip(tmp_path):
    """Native C++ parser must agree with the python parser, and native dump
    writers must produce parseable frames."""
    from obmd_tpu.io import native
    if not native.available():
        pytest.skip("native library not built")
    ref = "/root/reference/examples/OBMD_DPD/dpd_8map_obmd.data"
    if not os.path.exists(ref):
        pytest.skip("reference data file unavailable")
    a = lammps_data.read_data(ref, prefer_native=True)
    b = lammps_data._read_data_py(ref)
    np.testing.assert_allclose(a.x, b.x)
    np.testing.assert_array_equal(a.tags, b.tags)
    np.testing.assert_allclose(a.masses, b.masses)

    from obmd_tpu import scenes
    from obmd_tpu.io.dump import write_custom_frame
    sc = scenes.closed_dpd_scene(n=40, box_l=4.0, seed=2)
    p = str(tmp_path / "n.dump")
    write_custom_frame(p, sc.cfg, sc.state,
                       cols=("id", "type", "x", "y", "z", "vx", "vy", "vz",
                             "fx", "fy", "fz"), append=False)
    content = open(p).read()
    assert "ITEM: ATOMS id type x y z vx vy vz fx fy fz" in content
    assert content.count("\n") == 9 + 40


def test_molecule_template_reader(tmp_path):
    p = tmp_path / "water.mol"
    p.write_text("""# SPC/E-ish template

3 atoms
2 bonds
1 angles

Coords

1 0.00000 0.00000 0.00000
2 0.81649 0.57736 0.00000
3 -0.81649 0.57736 0.00000

Types

1 1
2 2
3 2

Charges

1 -0.8476
2 0.4238
3 0.4238

Bonds

1 1 1 2
2 1 1 3

Angles

1 1 2 1 3
""")
    from obmd_tpu.io.molecule import read_molecule
    m = read_molecule(str(p))
    assert m.natoms == 3
    assert m.types.tolist() == [0, 1, 1]
    np.testing.assert_allclose(m.q.sum(), 0.0, atol=1e-6)
    np.testing.assert_allclose(m.center, m.x.mean(axis=0))
    assert m.bonds.shape == (2, 3)
    assert m.angles.shape == (1, 4)
    # dx sums to zero by construction
    np.testing.assert_allclose(m.dx.sum(axis=0), [0, 0, 0], atol=1e-12)


def test_obmd_checkpoint_resume_seamless(tmp_path):
    """Checkpoint mid-OBMD-run and resume: per-tag physics must continue
    identically (the reference's fix obmd loses sim_time/RNG/counters on
    restart, SURVEY.md §5 — here the full state round-trips)."""
    import jax
    from tests.test_cellpad import _small_cfg, _state
    from obmd_tpu.integrate import make_step, rebuild_neighbors, setup

    cfg = _small_cfg(n=540, obmd=True)
    st = setup(cfg, _state(cfg, n=500, seed=8))
    step = jax.jit(make_step(cfg))
    for _ in range(3):
        st = step(st)

    p = str(tmp_path / "obmd.npz")
    save_checkpoint(p, cfg, st)
    _, st2 = load_checkpoint(p, cfg=cfg)
    st2 = rebuild_neighbors(cfg, st2)

    a = step(st)
    b = step(st2)
    assert float(a.sim_time) == float(b.sim_time)
    assert int(a.obmd.ninserted) == int(b.obmd.ninserted)
    aa, ab = np.asarray(a.alive), np.asarray(b.alive)
    ma = {int(t): np.asarray(a.x)[i] for i, t in enumerate(np.asarray(a.tag)) if aa[i]}
    mb = {int(t): np.asarray(b.x)[i] for i, t in enumerate(np.asarray(b.tag)) if ab[i]}
    assert set(ma) == set(mb)
    assert max(np.abs(ma[t] - mb[t]).max() for t in ma) < 1e-5


def test_native_parser_molecular_topology(tmp_path):
    """The native C++ parser reads Bonds/Angles/Dihedrals and molecular
    atom styles identically to the python parser."""
    import numpy as np
    from obmd_tpu.io import lammps_data
    from obmd_tpu.io.native import available, read_data_native

    if not available():
        import pytest
        pytest.skip("native library not built")
    p = tmp_path / "m.data"
    p.write_text("""mol topo (obmd_tpu test)

4 atoms
1 atom types
3 bonds
1 bond types
2 angles
1 angle types
1 dihedrals
1 dihedral types

0.0 10.0 xlo xhi
0.0 10.0 ylo yhi
0.0 10.0 zlo zhi

Masses

1 1.5

Atoms

1 1 1 1.0 2.0 3.0
2 1 1 2.0 2.5 3.0
3 1 1 3.0 2.0 3.5
4 1 1 4.0 2.2 3.1

Bonds

1 1 1 2
2 1 2 3
3 1 3 4

Angles

1 1 1 2 3
2 1 2 3 4

Dihedrals

1 1 1 2 3 4
""")
    a = lammps_data._read_data_py(str(p), "molecular")
    b = read_data_native(str(p), "molecular")
    assert b is not None
    np.testing.assert_allclose(a.x, b.x)
    np.testing.assert_array_equal(a.bonds, b.bonds)
    np.testing.assert_array_equal(a.angles, b.angles)
    np.testing.assert_array_equal(a.dihedrals, b.dihedrals)
    assert (np.asarray(a.mol) == b.mol).all()
    assert b.masses[0] == 1.5


def test_read_data_format_mismatch_is_loud(tmp_path):
    """An atomic-format Atoms section read under atom_style molecular must
    raise (read_data.cpp 'Incorrect atom format'), not silently shift
    every coordinate (r4 regression: the misparse filed garbage cells)."""
    import numpy as np
    import pytest
    from obmd_tpu.io import lammps_data, native

    df = lammps_data.DataFile(
        natoms=4, ntypes=1, box_lo=np.zeros(3), box_hi=np.full(3, 5.0),
        masses=np.ones(1), x=np.random.RandomState(0).uniform(0, 5, (4, 3)),
        types=np.zeros(4, int), tags=np.arange(1, 5))
    p = str(tmp_path / "a.data")
    lammps_data.write_data(p, df)              # atomic format
    with pytest.raises((ValueError, IOError), match="atom_style|columns"):
        lammps_data.read_data(p, atom_style="molecular",
                              prefer_native=False)
    if native.available():
        with pytest.raises((ValueError, IOError), match="atom_style|columns"):
            native.read_data_native(p, atom_style="molecular")
    # the matching style still round-trips
    back = lammps_data.read_data(p, atom_style="atomic")
    np.testing.assert_allclose(back.x, df.x, rtol=1e-12)
