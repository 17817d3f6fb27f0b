"""Binary DCD trajectory writer (io/dump_dcd.py — the EXTRA-DUMP
dump_dcd.cpp analogue): header/frame framing, in-place frame-counter
patching, tag-ordered coordinates, constant-count enforcement, and the
deck surface `dump ID all dcd N file.dcd`."""
import struct

import numpy as np
import pytest

from obmd_tpu.config import Capacity, DPDParams, SceneConfig
from obmd_tpu.geometry import Box
from obmd_tpu.io.dump_dcd import read_dcd, write_dcd_frame
from obmd_tpu.state import init_state


def _cfg(n=40):
    box = Box((0.0, 0.0, 0.0), (6.0, 4.0, 4.0), (True, True, True))
    return SceneConfig(
        box=box, masses=(1.0,), dt=0.005,
        pair=DPDParams.create(temp=1.0, cutoff=1.0, seed=1, a0=10.0,
                              gamma=3.0),
        capacity=Capacity(n_max=n, cell_capacity=16),
        skin=0.3, force_path="nlist").finalize()


def test_dcd_round_trip(tmp_path):
    cfg = _cfg()
    r = np.random.default_rng(4)
    x0 = r.uniform(0.2, 3.8, (40, 3))
    st = init_state(cfg, x0)
    path = str(tmp_path / "t.dcd")
    write_dcd_frame(path, cfg, st)
    st2 = st.replace(x=st.x + 0.125, step=st.step + 10)
    write_dcd_frame(path, cfg, st2)

    icntrl, cells, frames = read_dcd(path)
    assert icntrl[0] == 2                     # nframes patched in place
    assert icntrl[3] == 10                    # last step patched
    assert frames.shape == (2, 40, 3)
    np.testing.assert_allclose(cells[0], (6.0, 4.0, 4.0))
    # frames are in ascending-tag order == insertion order here
    np.testing.assert_allclose(frames[0], x0, atol=1e-6)
    np.testing.assert_allclose(frames[1] - frames[0], 0.125, atol=1e-6)


def test_dcd_fortran_record_framing(tmp_path):
    """Every record must carry matching int32 byte counts fore and aft
    (the Fortran-unformatted convention VMD/catdcd rely on)."""
    cfg = _cfg()
    st = init_state(cfg, np.random.default_rng(1).uniform(1, 3, (40, 3)))
    path = str(tmp_path / "t.dcd")
    write_dcd_frame(path, cfg, st)
    raw = open(path, "rb").read()
    off = 0
    nrec = 0
    while off < len(raw):
        (ln,) = struct.unpack_from("<i", raw, off)
        (ln2,) = struct.unpack_from("<i", raw, off + 4 + ln)
        assert ln == ln2, (nrec, ln, ln2)
        off += 8 + ln
        nrec += 1
    assert nrec == 3 + 4                      # header x3 + cell + X,Y,Z


def test_dcd_constant_count_enforced(tmp_path):
    cfg = _cfg()
    st = init_state(cfg, np.random.default_rng(2).uniform(1, 3, (40, 3)))
    path = str(tmp_path / "t.dcd")
    write_dcd_frame(path, cfg, st)
    st2 = st.replace(alive=st.alive.at[0].set(False))
    with pytest.raises(ValueError, match="constant"):
        write_dcd_frame(path, cfg, st2)


def test_dcd_deck_surface(tmp_path):
    """`dump ID all dcd N file.dcd` through the deck front end."""
    from obmd_tpu.io.lammps_data import DataFile, write_data
    from obmd_tpu.io.script import run_script
    r = np.random.default_rng(3)
    n = 60
    df = DataFile(natoms=n, ntypes=1, box_lo=np.zeros(3),
                  box_hi=np.full(3, 6.0), masses=np.ones(1),
                  x=r.uniform(0.2, 5.8, (n, 3)), types=np.zeros(n, int),
                  tags=np.arange(1, n + 1), v=r.normal(0, 1, (n, 3)))
    data = tmp_path / "s.data"
    write_data(str(data), df)
    deck = tmp_path / "in.deck"
    out = tmp_path / "traj.dcd"
    deck.write_text(f"""
units lj
boundary p p p
atom_style atomic
read_data {data}
pair_style dpd 1.0 1.0 7
pair_coeff 1 1 25.0 4.5
fix 1 all nve
timestep 0.01
dump 1 all dcd 5 {out}
run 10
""")
    run_script(str(deck))
    icntrl, cells, frames = read_dcd(str(out))
    assert frames.shape[0] == 2 and frames.shape[1] == n
    assert icntrl[3] == 10
