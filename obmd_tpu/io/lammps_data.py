"""LAMMPS data-file reader/writer (counterpart of read_data.cpp /
write_data.cpp for the sections the OBMD workloads use).

Supports the header (natoms, ntypes, box bounds), Masses, Atoms (styles
`atomic`: id type x y z; `charge`: id type q x y z; `full`:
id mol type q x y z; `molecular`: id mol type x y z), and Velocities.
Example file: /root/reference/examples/OBMD_DPD/dpd_8map_obmd.data.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..geometry import Box

_SECTIONS = ("Masses", "Atoms", "Velocities", "Bonds", "Angles", "Dihedrals",
             "Impropers", "Pair Coeffs", "PairIJ Coeffs", "Bond Coeffs")


@dataclasses.dataclass
class DataFile:
    natoms: int
    ntypes: int
    box_lo: np.ndarray          # [3]
    box_hi: np.ndarray          # [3]
    masses: np.ndarray          # [ntypes] (index 0 = type 1 in the file)
    x: np.ndarray               # [n,3]
    types: np.ndarray           # [n] 0-based
    tags: np.ndarray            # [n] original ids
    v: Optional[np.ndarray] = None
    q: Optional[np.ndarray] = None
    mol: Optional[np.ndarray] = None
    bonds: Optional[np.ndarray] = None  # [nb, 2] atom-tag pairs
    angles: Optional[np.ndarray] = None  # [na, 4] (type, a1, a2, a3) tags
    dihedrals: Optional[np.ndarray] = None  # [nd, 5] (type, a1..a4) tags
    impropers: Optional[np.ndarray] = None  # [ni, 5] (type, i1..i4) tags,
    #   i2 = center (improper_harmonic.cpp quadruple order)

    def box(self, periodic=(False, True, True)) -> Box:
        return Box(tuple(float(v) for v in self.box_lo),
                   tuple(float(v) for v in self.box_hi),
                   tuple(periodic))


def _tokens(line: str):
    # strip comments
    if "#" in line:
        line = line[:line.index("#")]
    return line.split()


def read_data(path: str, atom_style: str = "atomic",
              prefer_native: bool = True) -> DataFile:
    if atom_style == "bond":
        prefer_native = False   # native style codes cover the others
    if prefer_native:
        try:
            from . import native
            df = native.read_data_native(path, atom_style)
            if df is not None:
                return df
        except Exception:
            pass  # fall back to the pure-python parser
    return _read_data_py(path, atom_style)


def _read_data_py(path: str, atom_style: str = "atomic") -> DataFile:
    with open(path) as fh:
        lines = fh.readlines()

    natoms = ntypes = 0
    lo = np.zeros(3)
    hi = np.zeros(3)
    i = 1  # skip title line
    n = len(lines)
    # header
    while i < n:
        t = _tokens(lines[i])
        if not t:
            i += 1
            continue
        if t[0] in [s.split()[0] for s in _SECTIONS] and lines[i].strip() in _SECTIONS:
            break
        joined = " ".join(t)
        if joined.endswith("atoms"):
            natoms = int(t[0])
        elif joined.endswith("atom types"):
            ntypes = int(t[0])
        elif joined.endswith("xlo xhi"):
            lo[0], hi[0] = float(t[0]), float(t[1])
        elif joined.endswith("ylo yhi"):
            lo[1], hi[1] = float(t[0]), float(t[1])
        elif joined.endswith("zlo zhi"):
            lo[2], hi[2] = float(t[0]), float(t[1])
        elif any(joined.endswith(s) for s in
                 ("bonds", "angles", "dihedrals", "impropers", "bond types",
                  "angle types", "dihedral types", "improper types")):
            pass
        elif lines[i].strip() in _SECTIONS:
            break
        i += 1

    masses = np.ones(max(ntypes, 1))
    x = np.zeros((natoms, 3))
    v = None
    q = None
    mol = None
    bonds = None
    angles = None
    dihedrals = None
    impropers = None
    types = np.zeros(natoms, np.int32)
    tags = np.zeros(natoms, np.int32)

    while i < n:
        header = lines[i].strip().split("#")[0].strip()
        i += 1
        if not header:
            continue
        if header == "Masses":
            i = _skip_blank(lines, i)
            for _ in range(ntypes):
                t = _tokens(lines[i])
                masses[int(t[0]) - 1] = float(t[1])
                i += 1
        elif header.startswith("Atoms"):
            i = _skip_blank(lines, i)
            need = {"atomic": 5, "charge": 6, "bond": 6, "molecular": 6,
                    "adress": 6, "full": 7}.get(atom_style, 5)
            for k in range(natoms):
                t = _tokens(lines[i])
                if len(t) < need:
                    # read_data.cpp errors the same way ("Incorrect atom
                    # format in data file") — reading on would silently
                    # shift every coordinate
                    raise ValueError(
                        f"Atoms line {k + 1} has {len(t)} columns; "
                        f"atom_style '{atom_style}' expects {need} — the "
                        "data file format does not match the atom_style")
                tags[k] = int(t[0])
                if atom_style == "atomic":
                    types[k] = int(t[1]) - 1
                    x[k] = [float(t[2]), float(t[3]), float(t[4])]
                elif atom_style == "charge":
                    if q is None:
                        q = np.zeros(natoms)
                    types[k] = int(t[1]) - 1
                    q[k] = float(t[2])
                    x[k] = [float(t[3]), float(t[4]), float(t[5])]
                elif atom_style in ("bond", "molecular", "adress"):
                    if mol is None:
                        mol = np.zeros(natoms, np.int32)
                    mol[k] = int(t[1])
                    types[k] = int(t[2]) - 1
                    x[k] = [float(t[3]), float(t[4]), float(t[5])]
                elif atom_style == "full":
                    if mol is None:
                        mol = np.zeros(natoms, np.int32)
                    if q is None:
                        q = np.zeros(natoms)
                    mol[k] = int(t[1])
                    types[k] = int(t[2]) - 1
                    q[k] = float(t[3])
                    x[k] = [float(t[4]), float(t[5]), float(t[6])]
                else:
                    raise ValueError(f"unsupported atom_style {atom_style}")
                i += 1
        elif header == "Bonds":
            i = _skip_blank(lines, i)
            blist = []
            while i < n and _tokens(lines[i]):
                t = _tokens(lines[i])
                blist.append((int(t[2]), int(t[3])))
                i += 1
            bonds = np.asarray(blist, dtype=np.int64)
        elif header == "Angles":
            i = _skip_blank(lines, i)
            alist = []
            while i < n and _tokens(lines[i]):
                t = _tokens(lines[i])
                alist.append((int(t[1]), int(t[2]), int(t[3]), int(t[4])))
                i += 1
            angles = np.asarray(alist, dtype=np.int64)
        elif header == "Dihedrals":
            i = _skip_blank(lines, i)
            dlist = []
            while i < n and _tokens(lines[i]):
                t = _tokens(lines[i])
                dlist.append(tuple(int(v) for v in t[1:6]))
                i += 1
            dihedrals = np.asarray(dlist, dtype=np.int64)
        elif header == "Impropers":
            i = _skip_blank(lines, i)
            ilist = []
            while i < n and _tokens(lines[i]):
                t = _tokens(lines[i])
                ilist.append(tuple(int(v) for v in t[1:6]))
                i += 1
            impropers = np.asarray(ilist, dtype=np.int64)
        elif header == "Velocities":
            i = _skip_blank(lines, i)
            v = np.zeros((natoms, 3))
            id2row = {int(t): k for k, t in enumerate(tags)}
            for _ in range(natoms):
                t = _tokens(lines[i])
                v[id2row[int(t[0])]] = [float(t[1]), float(t[2]), float(t[3])]
                i += 1
        else:
            # skip unknown section until next blank-delimited header
            i = _skip_blank(lines, i)
            while i < n and _tokens(lines[i]):
                i += 1

    return DataFile(natoms=natoms, ntypes=ntypes, box_lo=lo, box_hi=hi,
                    masses=masses, x=x, types=types, tags=tags, v=v, q=q,
                    mol=mol, bonds=bonds, angles=angles,
                    dihedrals=dihedrals, impropers=impropers)


def _skip_blank(lines, i):
    while i < len(lines) and not _tokens(lines[i]):
        i += 1
    return i


def write_data(path: str, df: DataFile, atom_style: str = "atomic"):
    with open(path, "w") as fh:
        fh.write("LAMMPS data file (obmd_tpu)\n\n")
        fh.write(f"{df.natoms} atoms\n{df.ntypes} atom types\n")
        if df.bonds is not None and len(df.bonds):
            fh.write(f"{len(df.bonds)} bonds\n1 bond types\n")
        if df.angles is not None and len(df.angles):
            nat = int(max(int(r[0]) for r in df.angles))
            fh.write(f"{len(df.angles)} angles\n{nat} angle types\n")
        if df.dihedrals is not None and len(df.dihedrals):
            ndt = int(max(int(r[0]) for r in df.dihedrals))
            fh.write(f"{len(df.dihedrals)} dihedrals\n{ndt} dihedral types\n")
        if df.impropers is not None and len(df.impropers):
            nit = int(max(int(r[0]) for r in df.impropers))
            fh.write(f"{len(df.impropers)} impropers\n{nit} improper types\n")
        fh.write("\n")
        fh.write(f"{df.box_lo[0]} {df.box_hi[0]} xlo xhi\n")
        fh.write(f"{df.box_lo[1]} {df.box_hi[1]} ylo yhi\n")
        fh.write(f"{df.box_lo[2]} {df.box_hi[2]} zlo zhi\n\n")
        fh.write("Masses\n\n")
        for t in range(df.ntypes):
            fh.write(f"{t + 1} {df.masses[t]}\n")
        fh.write("\nAtoms\n\n")
        for k in range(df.natoms):
            pos = f"{df.x[k, 0]} {df.x[k, 1]} {df.x[k, 2]}"
            if atom_style == "atomic":
                fh.write(f"{df.tags[k]} {df.types[k] + 1} {pos}\n")
            elif atom_style == "charge":
                fh.write(f"{df.tags[k]} {df.types[k] + 1} {df.q[k]} {pos}\n")
            elif atom_style == "full":
                fh.write(f"{df.tags[k]} {df.mol[k]} {df.types[k] + 1} "
                         f"{df.q[k]} {pos}\n")
            elif atom_style in ("molecular", "bond", "adress"):
                mol_k = df.mol[k] if df.mol is not None else 0
                fh.write(f"{df.tags[k]} {mol_k} {df.types[k] + 1} {pos}\n")
            else:
                raise ValueError(atom_style)
        if df.v is not None:
            fh.write("\nVelocities\n\n")
            for k in range(df.natoms):
                fh.write(f"{df.tags[k]} {df.v[k, 0]} {df.v[k, 1]} {df.v[k, 2]}\n")
        if df.bonds is not None and len(df.bonds):
            fh.write("\nBonds\n\n")
            for i, (b1, b2) in enumerate(df.bonds):
                fh.write(f"{i + 1} 1 {int(b1)} {int(b2)}\n")
        if df.angles is not None and len(df.angles):
            fh.write("\nAngles\n\n")
            for i, r in enumerate(df.angles):
                fh.write(f"{i + 1} {int(r[0])} {int(r[1])} {int(r[2])} {int(r[3])}\n")
        if df.dihedrals is not None and len(df.dihedrals):
            fh.write("\nDihedrals\n\n")
            for i, r in enumerate(df.dihedrals):
                fh.write(f"{i + 1} {int(r[0])} {int(r[1])} {int(r[2])} {int(r[3])} {int(r[4])}\n")
        if df.impropers is not None and len(df.impropers):
            fh.write("\nImpropers\n\n")
            for i, r in enumerate(df.impropers):
                fh.write(f"{i + 1} {int(r[0])} {int(r[1])} {int(r[2])} {int(r[3])} {int(r[4])}\n")
