"""Golden bonded-force comparison vs the reference LAMMPS binary.

Builds a 30x 4-atom-chain system (harmonic bonds + angles + dihedrals,
zero pair interaction), evaluates forces in BOTH engines at step 0, and
reports the max per-atom force difference.  This is the bonded-force
analogue of the force-style YAML fixtures (SURVEY.md section 4).

Usage: python validation/run_bonded_golden.py [/path/to/lmp]
"""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "bonded_golden")
K_BOND, R0 = 60.0, 0.8
K_ANG, TH0 = 25.0, 110.0
K_DIH, D_DIH, N_DIH = 3.0, 1, 2
L = 14.0


def build_system(seed=7, nchain=30):
    r = np.random.default_rng(seed)
    xs, bonds, angles, dihedrals, mols = [], [], [], [], []
    for c in range(nchain):
        # build a non-degenerate 4-chain with ~r0 bonds and random bends
        p = [r.uniform(1.5, L - 1.5, 3)]
        d = r.normal(size=3)
        for k in range(3):
            d = d / np.linalg.norm(d)
            p.append(p[-1] + R0 * d)
            d = d + 0.7 * r.normal(size=3)
        xs.extend(p)
        b = 4 * c
        bonds += [(b + 1, b + 2), (b + 2, b + 3), (b + 3, b + 4)]
        angles += [(b + 1, b + 2, b + 3), (b + 2, b + 3, b + 4)]
        dihedrals += [(b + 1, b + 2, b + 3, b + 4)]
        mols += [c + 1] * 4
    return (np.asarray(xs), bonds, angles, dihedrals, mols)


def write_data(path, x, bonds, angles, dihedrals, mols):
    n = len(x)
    with open(path, "w") as fh:
        fh.write("bonded golden (obmd_tpu)\n\n")
        fh.write(f"{n} atoms\n1 atom types\n")
        fh.write(f"{len(bonds)} bonds\n1 bond types\n")
        fh.write(f"{len(angles)} angles\n1 angle types\n")
        fh.write(f"{len(dihedrals)} dihedrals\n1 dihedral types\n\n")
        for ax in "xyz":
            fh.write(f"0.0 {L} {ax}lo {ax}hi\n")
        fh.write("\nMasses\n\n1 1.0\n\nAtoms\n\n")
        for i, (p, m) in enumerate(zip(x, mols)):
            fh.write(f"{i + 1} {m} 1 {p[0]:.9f} {p[1]:.9f} {p[2]:.9f}\n")
        fh.write("\nBonds\n\n")
        for i, (a, b) in enumerate(bonds):
            fh.write(f"{i + 1} 1 {a} {b}\n")
        fh.write("\nAngles\n\n")
        for i, (a, b, c) in enumerate(angles):
            fh.write(f"{i + 1} 1 {a} {b} {c}\n")
        fh.write("\nDihedrals\n\n")
        for i, (a, b, c, d) in enumerate(dihedrals):
            fh.write(f"{i + 1} 1 {a} {b} {c} {d}\n")


def run_reference(lmp, data):
    deck = os.path.join(OUT, "in.bonded")
    with open(deck, "w") as fh:
        fh.write(f"""units lj
dimension 3
boundary p p p
atom_style molecular
read_data {data}
pair_style zero 1.0
pair_coeff * *
bond_style harmonic
bond_coeff 1 {K_BOND} {R0}
angle_style harmonic
angle_coeff 1 {K_ANG} {TH0}
dihedral_style harmonic
dihedral_coeff 1 {K_DIH} {D_DIH} {N_DIH}
special_bonds lj/coul 0.0 1.0 1.0
dump 1 all custom 1 {OUT}/dump.ref id fx fy fz
dump_modify 1 format float %.14g
run 0
""")
    subprocess.run([lmp, "-in", deck, "-log", os.path.join(OUT, "log.ref")],
                   check=True, cwd=OUT, capture_output=True)
    rows = {}
    with open(os.path.join(OUT, "dump.ref")) as fh:
        lines = fh.read().splitlines()
    start = lines.index("ITEM: ATOMS id fx fy fz") + 1
    for line in lines[start:]:
        t = line.split()
        if len(t) != 4:
            break
        rows[int(t[0])] = [float(v) for v in t[1:4]]
    return rows


def run_ours(x, bonds):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from obmd_tpu.config import (AngleHarmonicParams, BondHarmonicParams,
                                 Capacity, DihedralHarmonicParams,
                                 DPDParams, SceneConfig)
    from obmd_tpu.geometry import Box
    from obmd_tpu.integrate import setup
    from obmd_tpu.state import init_state

    cfg = SceneConfig(
        box=Box((0, 0, 0), (L, L, L), (True, True, True)),
        masses=(1.0,), dt=0.002,
        pair=DPDParams.create(temp=0.0, cutoff=1.0, seed=1, a0=0.0,
                              gamma=0.0),
        bond=BondHarmonicParams(k=K_BOND, r0=R0),
        angle=AngleHarmonicParams(k=(K_ANG,), theta0=(TH0,)),
        dihedral=DihedralHarmonicParams(k=K_DIH, d=D_DIH, n=N_DIH),
        capacity=Capacity(n_max=len(x), cell_capacity=48),
        skin=0.3, force_path="nlist")
    st = setup(cfg, init_state(cfg, x, bonds=np.asarray(bonds)))
    f = np.asarray(st.f)
    tags = np.asarray(st.tag)
    alive = np.asarray(st.alive)
    return {int(t): f[i] for i, t in enumerate(tags) if alive[i]}


def main():
    lmp = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmpbuild/lmp"
    os.makedirs(OUT, exist_ok=True)
    x, bonds, angles, dihedrals, mols = build_system()
    data = os.path.join(OUT, "chains.data")
    write_data(data, x, bonds, angles, dihedrals, mols)
    ref = run_reference(lmp, data)
    ours = run_ours(x, bonds)
    assert set(ref) == set(ours)
    diffs = []
    scale = max(np.linalg.norm(v) for v in ref.values()) or 1.0
    for t in ref:
        diffs.append(np.max(np.abs(np.asarray(ref[t]) - ours[t])))
    diffs = np.asarray(diffs)
    print(f"atoms {len(ref)}  max|f| {scale:.4g}")
    print(f"max abs force diff {diffs.max():.3e} "
          f"(relative {diffs.max() / scale:.3e})")
    # the engine runs f32: the gate is f32 roundoff through a handful of
    # bonded-term ops (the f64 cross-check agrees with the reference to
    # dump precision; see REPORT.md)
    ok = diffs.max() / scale < 5e-5
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
