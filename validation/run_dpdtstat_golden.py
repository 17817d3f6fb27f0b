"""Golden force comparison of `pair dpd/tstat` (thermostat-only DPD) at
T = 0: the random force vanishes and the parallel drag is a deterministic
function of positions/velocities — validating this engine's DPDTstatParams
force law against DPD-BASIC/pair_dpd_tstat.cpp directly.

Usage: python validation/run_dpdtstat_golden.py [/path/to/lmp]
"""
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "dpdtstat_golden")
L = 9.0
GAMMA = 3.5
RC = 1.2


def build_system(seed=17, n=300):
    r = np.random.default_rng(seed)
    return r.uniform(0, L, (n, 3)), r.normal(0, 0.7, (n, 3))


def run_reference(lmp, x, v):
    data = os.path.join(OUT, "fluid.data")
    n = len(x)
    with open(data, "w") as fh:
        fh.write("dpd/tstat golden (obmd_tpu)\n\n")
        fh.write(f"{n} atoms\n1 atom types\n\n")
        for ax in "xyz":
            fh.write(f"0.0 {L} {ax}lo {ax}hi\n")
        fh.write("\nMasses\n\n1 1.0\n\nAtoms\n\n")
        for i, p in enumerate(x):
            fh.write(f"{i + 1} 1 {p[0]:.10f} {p[1]:.10f} {p[2]:.10f}\n")
        fh.write("\nVelocities\n\n")
        for i, w in enumerate(v):
            fh.write(f"{i + 1} {w[0]:.10f} {w[1]:.10f} {w[2]:.10f}\n")
    deck = os.path.join(OUT, "in.tstat")
    with open(deck, "w") as fh:
        fh.write(f"""units lj
dimension 3
boundary p p p
atom_style atomic
comm_modify vel yes
read_data {data}
pair_style dpd/tstat 0.0 0.0 {RC} 999
pair_coeff 1 1 {GAMMA}
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
        rows[int(t[0])] = [float(u) for u in t[1:4]]
    return rows


def run_ours(x, v):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from obmd_tpu.config import Capacity, DPDTstatParams, SceneConfig
    from obmd_tpu.geometry import Box
    from obmd_tpu.integrate import setup
    from obmd_tpu.state import init_state

    pair = DPDTstatParams.create(t_start=0.0, cutoff=RC, seed=999,
                                 gamma=GAMMA)
    cfg = SceneConfig(
        box=Box((0, 0, 0), (L, L, L), (True, True, True)),
        masses=(1.0,), dt=0.01, pair=pair,
        capacity=Capacity(n_max=len(x), cell_capacity=48),
        skin=0.3, force_path="nlist")
    st = setup(cfg, init_state(cfg, x, v=v))
    f = np.asarray(st.f)
    tags = np.asarray(st.tag)
    alive = np.asarray(st.alive)
    return {int(t): f[i] for i, t in enumerate(tags) if alive[i]}


def main():
    lmp = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmpbuild/lmp"
    os.makedirs(OUT, exist_ok=True)
    x, v = build_system()
    ref = run_reference(lmp, x, v)
    ours = run_ours(x, v)
    assert set(ref) == set(ours)
    scale = max(np.linalg.norm(w) for w in ref.values())
    diffs = np.asarray([np.max(np.abs(np.asarray(ref[t]) - ours[t]))
                        for t in ref])
    print(f"atoms {len(ref)}  max|f| {scale:.4g}")
    print(f"max abs force diff {diffs.max():.3e} "
          f"(relative {diffs.max() / scale:.3e})")
    ok = diffs.max() / scale < 5e-5
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
