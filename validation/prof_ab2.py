"""Kernel-only A/B at the production layout (cap 16), all variants timed in
ONE process (tunnel variance across processes swamps the deltas otherwise).
Variants are passed as explicit make_pair_kernel(variant=...) build args —
the env-knob mechanism this driver used before round 5 compiled every
variant with identical flags (the kernel body reads them at trace time,
which happened after the knobs were restored)."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cellpad import layout_build
from obmd_tpu.forces import pallas_dpd


def main():
    scale = float(os.environ.get("BENCH_SCALE", "8"))
    cap = int(os.environ.get("BENCH_CAP", "16"))
    sc = scenes.obmd_dpd_scene(scale=scale, seed=7)
    state = setup(sc.cfg, sc.state)
    state = equilibrate(sc.cfg, state, 1500)
    np.asarray(state.x)
    cfg = dataclasses.replace(
        sc.cfg, capacity=dataclasses.replace(
            sc.cfg.capacity, cell_capacity=cap)).finalize()
    geom = ec.make_geometry(cfg)
    state = jax.jit(lambda s: layout_build(geom, cfg.box, s))(state)

    variants = [
        ("baseline", {}),
        ("hash=full", {"hash": "full"}),
        ("noise=off", {"noise": "off"}),
        ("mi=off", {"mi": "off"}),
        ("full+mi-off", {"hash": "full", "mi": "off"}),
    ]

    def build_scan(ab):
        kern = pallas_dpd.make_pair_kernel(
            geom, params=cfg.pair, dt=cfg.dt,
            exclude_bonded=cfg.bond is not None,
            n_excl=4 if cfg.branched_topology else 2, variant=ab)

        @jax.jit
        def scan(s):
            def body(st, _):
                f = ec._forces(cfg, geom, kern, st)
                return st.replace(v=st.v + 1e-30 * f), None
            s, _ = jax.lax.scan(body, s, None, length=100)
            return s
        return scan

    scans = [(name, build_scan(ab)) for name, ab in variants]
    # compile all first
    for _, scan in scans:
        np.asarray(scan(state).v)
    for rep in range(3):
        out = []
        for name, scan in scans:
            t0 = time.perf_counter()
            np.asarray(scan(state).v)
            out.append("%s %.3f" % (name, (time.perf_counter() - t0) / 100 * 1e3))
        print(" | ".join(out))


if __name__ == "__main__":
    main()
