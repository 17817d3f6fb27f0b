"""Golden improper-force comparison vs the reference LAMMPS binary.

Builds 24 trivalent "star" centers (one harmonic improper each, zero pair
interaction, zero-K bonds so ONLY the improper term produces force),
evaluates forces in BOTH engines at step 0, and reports the max per-atom
force difference.  Validates forces/bonded.improper_forces (the exact
a11..a23 construction of improper_harmonic.cpp::compute) AND the
per-center slot-triplet storage (State.impr).

Usage: python validation/run_improper_golden.py [/path/to/lmp]
"""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "improper_golden")
K_IMP, CHI0 = 12.5, 25.0
L = 14.0


def build_system(seed=11, nstar=24):
    r = np.random.default_rng(seed)
    xs, bonds, impropers, mols, types = [], [], [], [], []
    for c in range(nstar):
        center = r.uniform(1.5, L - 1.5, 3)
        b = 4 * c
        xs.append(center)
        types.append(2)
        for k in range(3):
            d = r.normal(size=3)
            d /= np.linalg.norm(d)
            xs.append(center + r.uniform(0.7, 1.0) * d)
            types.append(1)
            bonds.append((b + 1, b + 2 + k))
        # improper_harmonic.cpp quadruple order: i2 = the center
        impropers.append((b + 2, b + 1, b + 3, b + 4))
        mols += [c + 1] * 4
    return np.asarray(xs), types, bonds, impropers, mols


def write_data(path, x, types, bonds, impropers, mols):
    n = len(x)
    with open(path, "w") as fh:
        fh.write("improper golden (obmd_tpu)\n\n")
        fh.write(f"{n} atoms\n2 atom types\n")
        fh.write(f"{len(bonds)} bonds\n1 bond types\n")
        fh.write(f"{len(impropers)} impropers\n1 improper types\n\n")
        for ax in "xyz":
            fh.write(f"0.0 {L} {ax}lo {ax}hi\n")
        fh.write("\nMasses\n\n1 1.0\n2 1.0\n\nAtoms\n\n")
        for i, (p, m, t) in enumerate(zip(x, mols, types)):
            fh.write(f"{i + 1} {m} {t} {p[0]:.9f} {p[1]:.9f} {p[2]:.9f}\n")
        fh.write("\nBonds\n\n")
        for i, (a, b) in enumerate(bonds):
            fh.write(f"{i + 1} 1 {a} {b}\n")
        fh.write("\nImpropers\n\n")
        for i, (a, b, c, d) in enumerate(impropers):
            fh.write(f"{i + 1} 1 {a} {b} {c} {d}\n")


def run_reference(lmp, data):
    deck = os.path.join(OUT, "in.improper")
    with open(deck, "w") as fh:
        fh.write(f"""units lj
dimension 3
boundary p p p
atom_style molecular
read_data {data}
pair_style zero 1.0
pair_coeff * *
bond_style harmonic
bond_coeff 1 0.0 0.9
improper_style harmonic
improper_coeff 1 {K_IMP} {CHI0}
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


def run_ours(x, types, bonds, impropers, dtype="float32"):
    import jax
    jax.config.update("jax_platforms", "cpu")
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    from obmd_tpu.config import (BondHarmonicParams, Capacity, DPDParams,
                                 ImproperHarmonicParams, SceneConfig)
    from obmd_tpu.geometry import Box
    from obmd_tpu.integrate import setup
    from obmd_tpu.state import init_state

    cfg = SceneConfig(
        box=Box((0, 0, 0), (L, L, L), (True, True, True)),
        masses=(1.0, 1.0), dt=0.002,
        pair=DPDParams.create(temp=0.0, cutoff=1.0, seed=1, a0=0.0,
                              gamma=0.0, ntypes=2),
        bond=BondHarmonicParams(k=0.0, r0=0.9),
        improper=ImproperHarmonicParams(k=(0.0, K_IMP), chi0=(0.0, CHI0)),
        capacity=Capacity(n_max=len(x), cell_capacity=48),
        skin=0.3, force_path="nlist", branched_topology=True, dtype=dtype)
    st = setup(cfg, init_state(cfg, x,
                               types=[t - 1 for t in types],
                               bonds=np.asarray(bonds),
                               impropers=np.asarray(impropers)))
    f = np.asarray(st.f)
    tags = np.asarray(st.tag)
    alive = np.asarray(st.alive)
    return {int(t): f[i] for i, t in enumerate(tags) if alive[i]}


def main():
    lmp = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmpbuild/lmp"
    os.makedirs(OUT, exist_ok=True)
    x, types, bonds, impropers, mols = build_system()
    data = os.path.join(OUT, "stars.data")
    write_data(data, x, types, bonds, impropers, mols)
    ref = run_reference(lmp, data)
    # quadruples are (i1, i2=center, i3, i4) in both engines.
    # The gate runs f64 (formula exactness: the random stars include
    # near-degenerate geometries whose acos-derivative amplifies f32
    # roundoff far beyond the usual 5e-5 gate); the f32 engine path is
    # sanity-checked at the amplified tolerance.
    scale = max(np.linalg.norm(v) for v in ref.values()) or 1.0
    print(f"atoms {len(ref)}  max|f| {scale:.4g}")
    results = []
    for dtype, gate in (("float64", 1e-6), ("float32", 2e-4)):
        ours = run_ours(x, types, bonds, impropers, dtype=dtype)
        assert set(ref) == set(ours)
        diffs = np.asarray([np.max(np.abs(np.asarray(ref[t]) - ours[t]))
                            for t in ref])
        rel = diffs.max() / scale
        print(f"{dtype}: max abs force diff {diffs.max():.3e} "
              f"(relative {rel:.3e}, gate {gate:g})")
        results.append(rel < gate)
    ok = all(results)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
