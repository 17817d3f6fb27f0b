"""Golden force comparison of `pair lj/cut/rf` — the fork's OWN custom
pair style (pair_lj_cut_rf.cpp: LJ + reaction-field Coulomb) — against
this engine's LJCutRFParams implementation on a random charged system.

Usage: python validation/run_ljrf_golden.py [/path/to/lmp]
"""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "ljrf_golden")
L = 9.0
EPS, SIG = 0.8, 1.0
CUT_LJ, CUT_COUL = 2.2, 2.2
EPS_RF = 80.0


def build_system(seed=11, n=220):
    r = np.random.default_rng(seed)
    # minimum-separation sequential insertion to keep LJ forces finite
    xs = []
    while len(xs) < n:
        p = r.uniform(0, L, 3)
        ok = True
        for q in xs:
            d = p - q
            d -= L * np.round(d / L)
            if (d @ d) < 0.72 ** 2:
                ok = False
                break
        if ok:
            xs.append(p)
    q = r.uniform(-1.0, 1.0, n)
    q -= q.mean()
    return np.asarray(xs), q


def run_reference(lmp, x, q):
    data = os.path.join(OUT, "charged.data")
    n = len(x)
    with open(data, "w") as fh:
        fh.write("charged golden (obmd_tpu)\n\n")
        fh.write(f"{n} atoms\n1 atom types\n\n")
        for ax in "xyz":
            fh.write(f"0.0 {L} {ax}lo {ax}hi\n")
        fh.write("\nMasses\n\n1 1.0\n\nAtoms\n\n")
        for i, (p, qi) in enumerate(zip(x, q)):
            fh.write(f"{i + 1} 1 {qi:.10f} "
                     f"{p[0]:.10f} {p[1]:.10f} {p[2]:.10f}\n")
    deck = os.path.join(OUT, "in.ljrf")
    with open(deck, "w") as fh:
        fh.write(f"""units lj
dimension 3
boundary p p p
atom_style charge
read_data {data}
pair_style lj/cut/rf {CUT_LJ} {CUT_COUL}
pair_coeff 1 1 {EPS} {SIG} {EPS_RF}
dump 1 all custom 1 {OUT}/dump.ref id fx fy fz
dump_modify 1 format float %.14g
thermo_style custom step pe
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


def run_ours(x, q):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from obmd_tpu.config import Capacity, LJCutRFParams, SceneConfig
    from obmd_tpu.geometry import Box
    from obmd_tpu.integrate import setup
    from obmd_tpu.state import init_state

    pair = LJCutRFParams.create(cut_lj=CUT_LJ, cut_coul=CUT_COUL,
                                epsilon=EPS, sigma=SIG, eps_rf=EPS_RF)
    cfg = SceneConfig(
        box=Box((0, 0, 0), (L, L, L), (True, True, True)),
        masses=(1.0,), dt=0.002, pair=pair,
        capacity=Capacity(n_max=len(x), cell_capacity=48),
        skin=0.3, force_path="nlist")
    st = setup(cfg, init_state(cfg, x, q=q))
    f = np.asarray(st.f)
    tags = np.asarray(st.tag)
    alive = np.asarray(st.alive)
    return {int(t): f[i] for i, t in enumerate(tags) if alive[i]}


def main():
    lmp = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmpbuild/lmp"
    os.makedirs(OUT, exist_ok=True)
    x, q = build_system()
    ref = run_reference(lmp, x, q)
    ours = run_ours(x, q)
    assert set(ref) == set(ours)
    scale = max(np.linalg.norm(v) for v in ref.values())
    diffs = np.asarray([np.max(np.abs(np.asarray(ref[t]) - ours[t]))
                        for t in ref])
    print(f"atoms {len(ref)}  max|f| {scale:.4g}")
    print(f"max abs force diff {diffs.max():.3e} "
          f"(relative {diffs.max() / scale:.3e})")
    ok = diffs.max() / scale < 5e-5      # f32 engine vs f64 reference
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
