"""Golden rigid-body dynamics vs the reference's `fix rigid/small molecule`
(RIGID package): free bent trimers with initial spins under deterministic
T = 0 DPD drag, 40 steps in both engines, COM trajectories and body
geometry compared.  Both integrators are O(dt^2) velocity-Verlet schemes
(fix_rigid_small.cpp quaternion integration vs obmd_tpu/rigid.py's
recompute-and-rotate), so trajectories agree to integrator truncation.

Usage: python validation/run_rigid_golden.py [/path/to/lmp]
"""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "rigid_golden")
L = 12.0
NSTEPS = 40
DT = 0.004
DX = np.asarray([[-0.5, -0.15, 0.0], [0.0, 0.25, 0.0], [0.5, -0.15, 0.0]])


def build_system(seed=5, nmol=8):
    r = np.random.default_rng(seed)
    xs, vs, mols = [], [], []
    for m in range(nmol):
        c = r.uniform(2.0, L - 2.0, 3)
        # random rotation of the template
        q = r.normal(size=4)
        q /= np.linalg.norm(q)
        w, xq, yq, zq = q
        R = np.asarray([
            [1 - 2 * (yq * yq + zq * zq), 2 * (xq * yq - w * zq),
             2 * (xq * zq + w * yq)],
            [2 * (xq * yq + w * zq), 1 - 2 * (xq * xq + zq * zq),
             2 * (yq * zq - w * xq)],
            [2 * (xq * zq - w * yq), 2 * (yq * zq + w * xq),
             1 - 2 * (xq * xq + yq * yq)]])
        pts = c + DX @ R.T
        omega = r.normal(0, 1.5, 3)
        vcom = r.normal(0, 0.3, 3)
        v = vcom + np.cross(omega, pts - c)
        xs.append(pts)
        vs.append(v)
        mols += [m + 1] * 3
    return np.concatenate(xs), np.concatenate(vs), mols


def run_reference(lmp, x, v, mols):
    data = os.path.join(OUT, "trimers.data")
    n = len(x)
    with open(data, "w") as fh:
        fh.write("rigid golden (obmd_tpu)\n\n")
        fh.write(f"{n} atoms\n1 atom types\n")
        fh.write(f"{2 * (n // 3)} bonds\n1 bond types\n\n")
        for ax in "xyz":
            fh.write(f"0.0 {L} {ax}lo {ax}hi\n")
        fh.write("\nMasses\n\n1 1.0\n\nAtoms\n\n")
        for i, (p, m) in enumerate(zip(x, mols)):
            fh.write(f"{i + 1} {m} 1 {p[0]:.10f} {p[1]:.10f} {p[2]:.10f}\n")
        fh.write("\nVelocities\n\n")
        for i, w in enumerate(v):
            fh.write(f"{i + 1} {w[0]:.10f} {w[1]:.10f} {w[2]:.10f}\n")
        fh.write("\nBonds\n\n")
        k = 1
        for m in range(n // 3):
            b = 3 * m
            fh.write(f"{k} 1 {b + 1} {b + 2}\n")
            k += 1
            fh.write(f"{k} 1 {b + 2} {b + 3}\n")
            k += 1
    deck = os.path.join(OUT, "in.rigid")
    with open(deck, "w") as fh:
        fh.write(f"""units lj
dimension 3
boundary p p p
atom_style molecular
read_data {data}
pair_style dpd 0.0 1.0 12345
pair_coeff 1 1 8.0 2.0
comm_modify vel yes
neighbor 0.3 bin
fix 1 all rigid/small molecule
timestep {DT}
dump 1 all custom {NSTEPS} {OUT}/dump.ref id x y z
dump_modify 1 format float %.14g sort id
run {NSTEPS}
""")
    subprocess.run([lmp, "-in", deck, "-log", os.path.join(OUT, "log.ref")],
                   check=True, cwd=OUT, capture_output=True)
    rows = {}
    with open(os.path.join(OUT, "dump.ref")) as fh:
        lines = fh.read().splitlines()
    start = len(lines) - 1 - lines[::-1].index("ITEM: ATOMS id x y z")
    for line in lines[start + 1:]:
        t = line.split()
        if len(t) != 4:
            break
        rows[int(t[0])] = np.asarray([float(u) for u in t[1:4]])
    return rows


def run_ours(x, v, mols):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from obmd_tpu.config import Capacity, DPDParams, SceneConfig
    from obmd_tpu.geometry import Box
    from obmd_tpu.integrate import make_run, setup
    from obmd_tpu.state import init_state

    n = len(x)
    bonds = []
    for m in range(n // 3):
        b = 3 * m
        bonds += [(b + 1, b + 2), (b + 2, b + 3)]
    cfg = SceneConfig(
        box=Box((0, 0, 0), (L, L, L), (True, True, True)),
        masses=(1.0,), dt=DT,
        pair=DPDParams.create(temp=0.0, cutoff=1.0, seed=12345, a0=8.0,
                              gamma=2.0),
        capacity=Capacity(n_max=n, cell_capacity=24),
        rigid=True, skin=0.3, force_path="nlist")
    st = setup(cfg, init_state(cfg, x, v=v, mol=np.asarray(mols),
                               bonds=np.asarray(bonds)))
    st = make_run(cfg, NSTEPS)(st)
    xs = np.asarray(st.x)
    tags = np.asarray(st.tag)
    alive = np.asarray(st.alive)
    return {int(t): xs[i] for i, t in enumerate(tags) if alive[i]}


def main():
    lmp = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmpbuild/lmp"
    os.makedirs(OUT, exist_ok=True)
    x, v, mols = build_system()
    ref = run_reference(lmp, x, v, mols)
    ours = run_ours(x, v, mols)
    assert set(ref) == set(ours)

    def unwrap(d):
        return d - L * np.round(d / L)

    pos_diffs = [np.abs(unwrap(ref[t] - ours[t])).max() for t in ref]
    # body geometry: arm lengths after NSTEPS in ours must equal template
    arm = np.linalg.norm(DX[0] - DX[1])
    geo = []
    for m in range(len(x) // 3):
        a, b, c = (ours[3 * m + 1], ours[3 * m + 2], ours[3 * m + 3])
        geo.append(abs(np.linalg.norm(unwrap(a - b)) - arm))
        geo.append(abs(np.linalg.norm(unwrap(c - b)) - arm))
    print(f"max |x_ref - x_ours| after {NSTEPS} steps: "
          f"{max(pos_diffs):.3e}")
    print(f"max arm-length deviation (ours): {max(geo):.3e}")
    ok = max(pos_diffs) < 5e-3 and max(geo) < 1e-4
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
