"""LAMMPS molecule-template file reader (counterpart of molecule.cpp for
the sections molecule-mode OBMD insertion consumes: Coords, Types, Charges,
Masses, Bonds/Angles counts, and the fork's rep_atom flag,
molecule.cpp:1934).

Round-1 scope: parsing + template geometry (center, displacements) so
molecule-mode insertion (fix_obmd_merged.cpp `mol` keyword, :2039-2054) can
build on it; the dynamics of bonded interactions land with the molecule
engine in a later round.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class MoleculeTemplate:
    natoms: int
    x: np.ndarray             # [n,3] coords relative to file origin
    types: np.ndarray         # [n] 0-based
    q: Optional[np.ndarray] = None
    masses: Optional[np.ndarray] = None   # per-atom masses (optional section)
    bonds: Optional[np.ndarray] = None    # [nb, 3] (type, a1, a2) 1-based ids
    angles: Optional[np.ndarray] = None   # [na, 4]
    dihedrals: Optional[np.ndarray] = None  # [nd, 5] (type, a1..a4)
    impropers: Optional[np.ndarray] = None  # [ni, 5] (type, i1..i4), i2 =
    #   center (improper_harmonic.cpp quadruple order)
    rep_atom: Optional[int] = None        # fork's representative atom (1-based)

    @property
    def center(self) -> np.ndarray:
        """Geometric center (Molecule::compute_center analogue, used as the
        insertion anchor, fix_obmd_merged.cpp:216)."""
        return self.x.mean(axis=0)

    @property
    def dx(self) -> np.ndarray:
        """Displacements from the center (onemols[imol]->dx)."""
        return self.x - self.center


def _clean(line: str) -> str:
    return line.split("#")[0].strip()


def read_molecule(path: str) -> MoleculeTemplate:
    lines = open(path).read().splitlines()
    natoms = 0
    nbonds = nangles = ndihedrals = nimpropers = 0
    i = 1  # skip title
    n = len(lines)
    # header
    while i < n:
        s = _clean(lines[i])
        if not s:
            i += 1
            continue
        t = s.split()
        if s.endswith("atoms"):
            natoms = int(t[0])
        elif s.endswith("bonds"):
            nbonds = int(t[0])
        elif s.endswith("angles"):
            nangles = int(t[0])
        elif s.endswith("dihedrals"):
            ndihedrals = int(t[0])
        elif s.endswith("impropers"):
            nimpropers = int(t[0])
        elif t[0] in ("Coords", "Types", "Charges", "Masses", "Bonds",
                      "Angles", "Dihedrals", "Impropers", "Special"):
            break
        i += 1

    x = np.zeros((natoms, 3))
    types = np.zeros(natoms, np.int32)
    q = None
    masses = None
    bonds = None
    angles = None
    dihedrals = None
    impropers = None

    def read_rows(count, width):
        nonlocal i
        rows = []
        while i < n and not _clean(lines[i]):
            i += 1
        for _ in range(count):
            t = _clean(lines[i]).split()
            rows.append([float(v) for v in t[:width]])
            i += 1
        return np.asarray(rows)

    while i < n:
        header = _clean(lines[i])
        i += 1
        if not header:
            continue
        if header == "Coords":
            r = read_rows(natoms, 4)
            x[(r[:, 0] - 1).astype(int)] = r[:, 1:4]
        elif header == "Types":
            r = read_rows(natoms, 2)
            types[(r[:, 0] - 1).astype(int)] = r[:, 1].astype(int) - 1
        elif header == "Charges":
            r = read_rows(natoms, 2)
            q = np.zeros(natoms)
            q[(r[:, 0] - 1).astype(int)] = r[:, 1]
        elif header == "Masses":
            r = read_rows(natoms, 2)
            masses = np.zeros(natoms)
            masses[(r[:, 0] - 1).astype(int)] = r[:, 1]
        elif header == "Bonds":
            r = read_rows(nbonds, 4)
            bonds = r[:, 1:4].astype(np.int32)
        elif header == "Angles":
            r = read_rows(nangles, 5)
            angles = r[:, 1:5].astype(np.int32)
        elif header == "Dihedrals":
            r = read_rows(ndihedrals, 6)
            dihedrals = r[:, 1:6].astype(np.int32)
        elif header == "Impropers":
            r = read_rows(nimpropers, 6)
            impropers = r[:, 1:6].astype(np.int32)
        else:
            while i < n and _clean(lines[i]):
                i += 1

    return MoleculeTemplate(natoms=natoms, x=x, types=types, q=q,
                            masses=masses, bonds=bonds, angles=angles,
                            dihedrals=dihedrals, impropers=impropers)
