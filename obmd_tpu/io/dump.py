"""Trajectory dump writers (counterpart of dump.cpp + EXTRA-DUMP styles for
the formats the OBMD workflows actually consume: xyz and LAMMPS `custom`
text dumps)."""
from __future__ import annotations

import numpy as np

from ..config import SceneConfig
from ..state import State


def write_xyz_frame(path: str, cfg: SceneConfig, state: State,
                    append: bool = True):
    try:
        from . import native
        if native.write_xyz_native(path, state, append):
            return
    except Exception:
        pass
    alive = np.asarray(state.alive)
    x = np.asarray(state.x)[alive]
    t = np.asarray(state.type)[alive]
    mode = "a" if append else "w"
    with open(path, mode) as fh:
        fh.write(f"{len(x)}\n")
        fh.write(f"step {int(state.step)}\n")
        for k in range(len(x)):
            fh.write(f"{t[k] + 1} {x[k, 0]:.6f} {x[k, 1]:.6f} {x[k, 2]:.6f}\n")


def write_custom_frame(path: str, cfg: SceneConfig, state: State,
                       cols=("id", "type", "x", "y", "z", "vx", "vy", "vz"),
                       append: bool = True, extra=None):
    """`dump custom` style frame: ITEM: headers + per-atom columns.
    The default column set routes through the native writer when built.
    `extra`: {name: per-ALIVE-atom np array} for v_<name> atom-style
    variable columns (variable.cpp atom style)."""
    if cols == ("id", "type", "x", "y", "z", "vx", "vy", "vz",
                "fx", "fy", "fz"):
        try:
            from . import native
            if native.write_dump_custom_native(path, cfg, state, append):
                return
        except Exception:
            pass
    alive = np.asarray(state.alive)
    x = np.asarray(state.x)[alive]
    v = np.asarray(state.v)[alive]
    f = np.asarray(state.f)[alive]
    t = np.asarray(state.type)[alive] + 1
    tag = np.asarray(state.tag)[alive]
    q = np.asarray(state.q)[alive]
    mol = np.asarray(state.mol)[alive]
    lam = np.asarray(state.lambdaF)[alive]
    cms = np.asarray(state.cms_mol)[alive]
    vcms = np.asarray(state.vcms_mol)[alive]
    rep = np.asarray(state.rep_atom)[alive]
    data = {"id": tag, "type": t, "x": x[:, 0], "y": x[:, 1], "z": x[:, 2],
            "vx": v[:, 0], "vy": v[:, 1], "vz": v[:, 2],
            "fx": f[:, 0], "fy": f[:, 1], "fz": f[:, 2], "q": q,
            # AdResS columns (atom_vec_adress.cpp per-atom fields)
            "mol": mol, "lambdaF": lam, "rep_atom": rep,
            "cms_x": cms[:, 0], "cms_y": cms[:, 1], "cms_z": cms[:, 2],
            "vcms_x": vcms[:, 0], "vcms_y": vcms[:, 1],
            "vcms_z": vcms[:, 2]}
    if extra:
        data.update(extra)
    lo, hi = cfg.box.lo, cfg.box.hi
    mode = "a" if append else "w"
    with open(path, mode) as fh:
        fh.write("ITEM: TIMESTEP\n%d\n" % int(state.step))
        fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % len(x))
        bflags = " ".join("pp" if p else "ff" for p in cfg.box.periodic)
        fh.write(f"ITEM: BOX BOUNDS {bflags}\n")
        for d in range(3):
            fh.write(f"{lo[d]} {hi[d]}\n")
        fh.write("ITEM: ATOMS " + " ".join(cols) + "\n")
        for k in range(len(x)):
            fh.write(" ".join(str(data[c][k]) for c in cols) + "\n")
