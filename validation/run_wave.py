"""BASELINE config 2: sinusoidal pressure wave driven from the left buffer
(factor = pxx + dpxx*sin(2 pi freq t), fix_obmd_merged.cpp:613) — the
x-velocity at the box center must oscillate at the drive frequency."""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import dataclasses
from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, make_run, setup


def main(dpxx=60.0, freq=2.0, total=24000, every=20):
    cfg = scenes.obmd_dpd_config(scale=1.0)
    ob = dataclasses.replace(cfg.obmd, dpxx=float(dpxx), freq=float(freq))
    cfg = dataclasses.replace(cfg, obmd=ob)
    sc = scenes.obmd_dpd_scene(scale=1.0, seed=4)
    state = setup(cfg, sc.state)
    state = equilibrate(cfg, state, 800)
    run = make_run(cfg, every)
    dt = cfg.dt
    ts, vxs = [], []
    mid_lo, mid_hi = 12.0, 22.0
    for c in range(total // every):
        state = run(state)
        alive = np.asarray(state.alive)
        xs = np.asarray(state.x)[alive]
        vs = np.asarray(state.v)[alive]
        m = (xs[:, 0] > mid_lo) & (xs[:, 0] < mid_hi)
        ts.append(float(state.sim_time))
        vxs.append(vs[m, 0].mean())
    t = np.asarray(ts)
    vx = np.asarray(vxs)
    vx = vx - vx.mean()
    # correlate against the drive quadratures
    s = np.sin(2 * np.pi * freq * t)
    c_ = np.cos(2 * np.pi * freq * t)
    a = 2 * np.mean(vx * s)
    b = 2 * np.mean(vx * c_)
    amp = np.hypot(a, b)
    noise = vx.std()
    print(f"drive freq {freq}: response amplitude {amp:.4f}, "
          f"signal std {noise:.4f}, SNR {amp/ (noise+1e-12):.2f}")
    # off-frequency control
    s2 = np.sin(2 * np.pi * (freq * 2.7) * t)
    c2 = np.cos(2 * np.pi * (freq * 2.7) * t)
    amp_off = np.hypot(2 * np.mean(vx * s2), 2 * np.mean(vx * c2))
    print(f"off-frequency control amplitude {amp_off:.4f}")
    np.savez("/root/repo/validation/wave.npz", t=t, vx=vx, amp=amp,
             amp_off=amp_off)
    assert amp > 3 * amp_off, "no clear response at the drive frequency"
    print("WAVE OK")


if __name__ == "__main__":
    main()
