"""Milestone B driver: run the exact OBMD_DPD example configuration (same
data file, same parameters as validation/run_ref/in.obmd) on the TPU engine
and accumulate density / velocity / temperature / pressure profiles for
comparison against the reference LAMMPS binary.

Saves the FULL per-chunk profile time series (series_* arrays) so any
averaging window can be applied offline — distinguishing a slow drift from
convergence to a (possibly wrong) steady state."""
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
         force_path="cellpad", rebuild_every=0, cap=24):
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
                                        cell_capacity=cap),
                      obmd=obmd, force_path=force_path,
                      rebuild_every=rebuild_every).finalize()
    state = init_state(cfg, df.x, v=df.v, types=df.types, tags=df.tags)
    state = setup(cfg, state)

    run_chunk = make_run(cfg, sample_every)
    profile = make_profile_fn(cfg, nbins=nbins)
    thermo = make_thermo_fn(cfg)

    t0 = time.time()
    series = []          # list of dicts of np arrays, one per sampled chunk
    pxs = []             # total x momentum per sampled chunk (drift watch)
    nchunks = total_steps // sample_every
    warm_chunks = warm_steps // sample_every
    for c in range(nchunks):
        state = run_chunk(state)
        if c >= warm_chunks:
            p = profile(state)
            series.append({k: np.asarray(getattr(p, k), np.float64)
                           for k in p._fields})
            pxs.append(float(np.sum(np.asarray(state.v)[:, 0]
                                    * np.asarray(state.alive))))
        if c % 40 == 0:
            th = thermo(state)
            print(f"step {int(th.step)} T={float(th.temp):.4f} "
                  f"N={int(th.natoms)} P={float(th.pressure):.2f} "
                  f"ins={int(state.obmd.ninserted)} "
                  f"del={int(state.obmd.ndeleted)} "
                  f"fail={int(state.obmd.insert_fail)}", flush=True)
    acc = {k: np.mean([s[k] for s in series], axis=0) for k in series[0]}
    ser = {f"series_{k}": np.stack([s[k] for s in series]) for k in series[0]}
    wall = time.time() - t0
    n = int(state.natoms)
    # layout / stage telemetry — raises on skin_trips / overflow (the run
    # would not be trustworthy; VERDICT round-2 weak #3 enforcement)
    from obmd_tpu.observe import check_invariants
    tel = check_invariants(cfg, state)
    print("telemetry:", tel)
    print(f"done: {total_steps} steps in {wall:.0f}s "
          f"({total_steps / wall * n / 1e6:.2f} Mps/s), natoms={n}")
    np.savez(out, nsamp=len(series), **acc, **ser,
             series_px=np.asarray(pxs),
             **{f"tel_{k}": v for k, v in tel.items()})
    print(f"saved {out}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="usher")
    ap.add_argument("out", nargs="?",
                    default="/root/repo/validation/profile_ours.npz")
    ap.add_argument("steps", nargs="?", type=int, default=60000)
    ap.add_argument("--force-path", default="cellpad")
    ap.add_argument("--rebuild-every", type=int, default=0)
    # --cap 15: the SHIPPING kernel configuration (filing 15 / storage 16
    # big-tile + PadAux caches — what bench.py actually measures); the
    # default 24 is the loop-kernel configuration of the earlier gates
    ap.add_argument("--cap", type=int, default=24)
    a = ap.parse_args()
    main(total_steps=a.steps, mode=a.mode, out=a.out,
         force_path=a.force_path, rebuild_every=a.rebuild_every,
         cap=a.cap)
