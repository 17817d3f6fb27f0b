"""BASELINE.json config 3: Couette shear through open boundaries — tangential
momentum flux pxy imposed on the left buffer and -pxy on the right
(fix obmd shear stage, fix_obmd_merged.cpp:616-630 + reg_force_perp) must
drive a linear vy(x) profile across the ROI."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import dataclasses  # noqa: E402

from obmd_tpu import scenes  # noqa: E402
from obmd_tpu.integrate import equilibrate, make_run, setup  # noqa: E402
from obmd_tpu.observe import make_profile_fn  # noqa: E402


def main(pxy=2.0, total=40000, warm=15000, every=50):
    cfg = scenes.obmd_dpd_config(scale=1.0)
    ob = cfg.obmd
    # shear sub-regions = the buffers themselves (Heaviside mass weights)
    ob = dataclasses.replace(ob, region3=ob.region1, region4=ob.region2,
                             pxy=float(pxy))
    cfg = dataclasses.replace(cfg, obmd=ob)
    sc = scenes.obmd_dpd_scene(scale=1.0, seed=11)
    state = setup(cfg, sc.state)
    state = equilibrate(cfg, state, 600)

    run = make_run(cfg, every)
    prof = make_profile_fn(cfg, nbins=40)
    acc = None
    nsamp = 0
    t0 = time.time()
    for c in range(total // every):
        state = run(state)
        if c * every >= warm:
            p = prof(state)
            vx = np.asarray(p.vx)  # x-velocity (should remain ~0)
            if acc is None:
                acc = {"vy": np.zeros(40), "vx": np.zeros(40),
                       "x": np.asarray(p.x_centers, np.float64)}
            # vy profile: recompute from state (profile fn tracks vx only)
            alive = np.asarray(state.alive)
            xs = np.asarray(state.x)[alive]
            vs = np.asarray(state.v)[alive]
            bins = np.clip((xs[:, 0] / (cfg.box.hi[0] / 40)).astype(int),
                           0, 39)
            cnt = np.bincount(bins, minlength=40) + 1e-9
            acc["vy"] += np.bincount(bins, weights=vs[:, 1],
                                     minlength=40) / cnt
            acc["vx"] += vx
            nsamp += 1
    vy = acc["vy"] / nsamp
    vx = acc["vx"] / nsamp
    x = acc["x"]
    print(f"wall {time.time()-t0:.0f}s, samples {nsamp}, "
          f"natoms {int(state.natoms)}")
    # linear fit over the ROI (bins 8..32)
    sl = slice(8, 32)
    coef = np.polyfit(x[sl], vy[sl], 1)
    corr = np.corrcoef(x[sl], vy[sl])[0, 1]
    print("vy profile:", np.array2string(vy[::4], precision=4))
    print(f"Couette fit: dvy/dx = {coef[0]:.5f}, r = {corr:.4f}")
    print(f"vy(left ROI) = {vy[8]:.4f}, vy(right ROI) = {vy[31]:.4f}")
    np.savez("/root/repo/validation/couette.npz", x=x, vy=vy, vx=vx,
             slope=coef[0], r=corr)


if __name__ == "__main__":
    main()
