"""Milestone B driver: run the exact OBMD_DPD example configuration (same
data file, same parameters as validation/run_ref/in.obmd) on the TPU engine
and accumulate density / velocity / temperature / pressure profiles for
comparison against the reference LAMMPS binary."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from obmd_tpu import scenes  # noqa: E402
from obmd_tpu.config import Capacity, DPDParams, ObmdParams, SceneConfig, UsherParams  # noqa: E402
from obmd_tpu.geometry import Box, RegionBlock  # noqa: E402
from obmd_tpu.integrate import make_run, setup  # noqa: E402
from obmd_tpu.io import lammps_data  # noqa: E402
from obmd_tpu.observe import make_profile_fn, make_thermo_fn  # noqa: E402
from obmd_tpu.state import init_state  # noqa: E402


def main(total_steps=60000, warm_steps=10000, sample_every=50, nbins=50,
         mode="usher", out="/root/repo/validation/profile_ours.npz",
         force_path="cellpad"):
    df = lammps_data.read_data(
        "/root/reference/examples/OBMD_DPD/dpd_8map_obmd.data")
    xhi = float(df.box_hi[0])
    yhi = float(df.box_hi[1])
    zhi = float(df.box_hi[2])
    buf = 0.15 * xhi
    box = Box((0.0, 0.0, 0.0), (xhi, yhi, zhi), (False, True, True))
    r1 = RegionBlock((0.0, 0.0, 0.0), (buf, yhi, zhi))
    r2 = RegionBlock((xhi - buf, 0.0, 0.0), (xhi, yhi, zhi))
    deg = RegionBlock((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    pair = DPDParams.create(temp=1.0, cutoff=1.0, seed=8893, a0=209.6,
                            gamma=4.5, ntypes=1)
    obmd = ObmdParams(
        ntype=0, nfreq=1, seed=777, pxx=188.0, alpha=0.7, tau=0.005,
        nbuf=1327.0, region1=r1, region2=r2, region3=deg, region4=deg,
        region5=r1, region6=r2, buffer_size=buf, g_fac=0.25, maxattempt=1,
        usher=(UsherParams(etarget=31.03, ds0=1.0, dtheta0=0.02, uovlp=1e4,
                           dsovlp=1.5, eps=1.0, nattempt=40)
               if mode == "usher" else None),
        near=(0.35 if mode == "near" else None),
        insert_kmax=16)
    cfg = SceneConfig(box=box, masses=(1.0,), pair=pair, dt=0.001464,
                      capacity=Capacity(n_max=int(df.natoms * 1.3), max_neighbors=72,
                                        cell_capacity=24),
                      obmd=obmd, force_path=force_path).finalize()
    state = init_state(cfg, df.x, v=df.v, types=df.types, tags=df.tags)
    state = setup(cfg, state)

    run_chunk = make_run(cfg, sample_every)
    profile = make_profile_fn(cfg, nbins=nbins)
    thermo = make_thermo_fn(cfg)

    t0 = time.time()
    acc = None
    nsamp = 0
    nchunks = total_steps // sample_every
    warm_chunks = warm_steps // sample_every
    for c in range(nchunks):
        state = run_chunk(state)
        if c >= warm_chunks:
            p = profile(state)
            p = jax.tree_util.tree_map(np.asarray, p)
            if acc is None:
                acc = {k: np.array(getattr(p, k), np.float64)
                       for k in p._fields}
            else:
                for k in p._fields:
                    acc[k] += np.asarray(getattr(p, k))
            nsamp += 1
        if c % 40 == 0:
            th = thermo(state)
            print(f"step {int(th.step)} T={float(th.temp):.4f} "
                  f"N={int(th.natoms)} P={float(th.pressure):.2f} "
                  f"ins={int(state.obmd.ninserted)} "
                  f"del={int(state.obmd.ndeleted)} "
                  f"fail={int(state.obmd.insert_fail)}", flush=True)
    for k in acc:
        acc[k] /= nsamp
    wall = time.time() - t0
    n = int(state.natoms)
    print(f"done: {total_steps} steps in {wall:.0f}s "
          f"({total_steps / wall * n / 1e6:.2f} Mps/s), natoms={n}")
    np.savez(out, nsamp=nsamp, **acc)
    print("saved profile_ours.npz")


if __name__ == "__main__":
    import sys as _sys
    mode = _sys.argv[1] if len(_sys.argv) > 1 else "usher"
    out = (_sys.argv[2] if len(_sys.argv) > 2
           else "/root/repo/validation/profile_ours.npz")
    steps = int(_sys.argv[3]) if len(_sys.argv) > 3 else 60000
    main(total_steps=steps, mode=mode, out=out)
