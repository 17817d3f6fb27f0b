"""Pair-kernel-only microbenchmark: the same ~94k-atom OBMD_DPD fluid
filed into padded layouts with different cell capacities, timing ONLY the
Pallas kernel call.  Quantifies the j-side cap slack (VERDICT: kernel work
scales ~linearly with cap; production cap=24 vs max occupancy ~16)."""
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
from obmd_tpu.forces.pallas_dpd import PadGeometry, make_pair_kernel
from obmd_tpu import rng as _rng


def main():
    scale = float(os.environ.get("BENCH_SCALE", "8"))
    base = scenes.obmd_dpd_scene(scale=scale, seed=7)
    cfg0 = base.cfg.finalize()
    state = setup(cfg0, base.state)
    state = equilibrate(cfg0, state, 1500)
    np.asarray(state.x)
    # host copy of the live atoms; re-file per capacity
    alive = np.asarray(state.alive)
    x = np.asarray(state.x)[alive]
    v = np.asarray(state.v)[alive]

    for cap in (24, 20, 18, 16):
        sc = scenes.obmd_dpd_scene(scale=scale, seed=7, cell_capacity=cap)
        cfg = sc.cfg.finalize()
        geom = ec.make_geometry(cfg)
        from obmd_tpu.state import init_state
        st = init_state(cfg, x, v=v)
        st = jax.jit(lambda s: layout_build(geom, cfg.box, s))(st)
        dropped = len(x) - int(jnp.sum(st.alive))
        kern = make_pair_kernel(geom, params=cfg.pair, dt=cfg.dt)
        nb, capg, lanes = geom.n_blocks, geom.cap, geom.lanes

        @jax.jit
        def forces(s):
            a3 = s.alive[:, None]
            xm = jnp.where(a3, s.x, 1e9).astype(jnp.float32)
            fld = jnp.concatenate([xm, s.v.astype(jnp.float32)], axis=1)
            fld = fld.reshape(nb, capg, lanes, 6).transpose(0, 3, 1, 2)
            tag = s.tag.reshape(nb, capg, lanes)
            rank = jnp.arange(capg, dtype=jnp.int32)[None, :, None]
            occ = jnp.max(jnp.where(s.alive.reshape(nb, capg, lanes),
                                    rank, -1), axis=(1, 2)) + 1
            salt = _rng.step_salt(cfg.pair.seed, s.step, 1)
            return kern(fld, tag, salt, occ)

        f = forces(st)
        jax.block_until_ready(f)
        iters = 50
        t0 = time.perf_counter()
        for i in range(iters):
            # anti-hoist: rotate the step so the salt changes
            st = st.replace(step=st.step + 1)
            f = forces(st)
        jax.block_until_ready(f)
        ms = (time.perf_counter() - t0) / iters * 1e3
        occ_live = int(jnp.max(
            jnp.sum(st.alive.reshape(nb, capg, lanes), axis=1).max()))
        print(f"cap={cap}: kernel {ms:.3f} ms  dropped={dropped} "
              f"max_col_occ={occ_live}", flush=True)


if __name__ == "__main__":
    main()
