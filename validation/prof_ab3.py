"""Bare pallas_call timing (no field pack, no boundary force): one process,
variants passed as explicit make_pair_kernel(variant=...) build args.
Separates in-kernel cost from wrapper cost."""
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
from obmd_tpu.forces.pallas_dpd import make_pair_kernel
from obmd_tpu import rng


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
    nb, capg, lanes = geom.n_blocks, geom.cap, geom.lanes

    # prebuilt kernel inputs (computed once, outside the timed region)
    a3 = state.alive[:, None]
    xm = jnp.where(a3, state.x, ec.BIG).astype(jnp.float32)
    fld = jnp.concatenate([xm, state.v.astype(jnp.float32)], axis=1)
    fld = fld.reshape(nb, capg, lanes, 6).transpose(0, 3, 1, 2)
    tag = state.tag.reshape(nb, capg, lanes)
    rank = jnp.arange(capg, dtype=jnp.int32)[None, :, None]
    occ = jnp.max(jnp.where(state.alive.reshape(nb, capg, lanes), rank, -1),
                  axis=(1, 2)) + 1
    fld, tag, occ = jax.device_put((fld, tag, occ))
    np.asarray(occ)

    variants = [
        ("baseline", {}),
        ("hash=full", {"hash": "full"}),
        ("noise=off", {"noise": "off"}),
        ("mi=off", {"mi": "off"}),
        ("all-off", {"hash": "full", "noise": "off", "mi": "off"}),
        ("looped", {"bigtile": False}),
    ]

    def build(ab):
        bigtile = ab.pop("bigtile", None)
        kern = make_pair_kernel(geom, params=cfg.pair, dt=cfg.dt,
                                bigtile=bigtile, variant=ab)

        @jax.jit
        def scan(fld, tag, occ):
            def body(c, i):
                # per-iteration salt so each step computes fresh noise,
                # matching the production _forces cadence
                f = kern(c, tag, jnp.uint32(123) + i.astype(jnp.uint32), occ)
                # feed a hair of output back to serialize iterations
                c = c.at[:, 3:6].add(1e-30 * f)
                return c, None
            c, _ = jax.lax.scan(body, fld, jnp.arange(100, dtype=jnp.int32))
            return c
        return scan

    scans = [(name, build(dict(ab))) for name, ab in variants]
    for _, scan in scans:
        np.asarray(scan(fld, tag, occ))
    for rep in range(3):
        out = []
        for name, scan in scans:
            t0 = time.perf_counter()
            np.asarray(scan(fld, tag, occ))
            out.append("%s %.3f" % (name, (time.perf_counter() - t0) / 100 * 1e3))
        print(" | ".join(out))


if __name__ == "__main__":
    main()
