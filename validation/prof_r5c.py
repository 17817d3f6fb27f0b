"""Surgical step-component attribution: variants of the production step
with single pieces removed, all compiled in one process and interleaved
(chip-state drift between processes made cross-run deltas useless).
Trajectories differ between variants — only the TIMING is meaningful."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from obmd_tpu import scenes, rng
from obmd_tpu.integrate import equilibrate, setup, PURPOSE_PAIR_NOISE
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cellpad import layout_build, relayout_incremental, note_skin_check
from obmd_tpu.cells import BIG
from obmd_tpu.state import per_atom_mass


def main():
    scale = float(os.environ.get("BENCH_SCALE", "8"))
    cap = int(os.environ.get("BENCH_CAP", "15"))
    nsteps = 390                      # 30 chunks of r_every=13
    sc = scenes.obmd_dpd_scene(scale=scale, seed=7)
    state = setup(sc.cfg, sc.state)
    state = equilibrate(sc.cfg, state, 1500)
    np.asarray(state.x)
    cfg = dataclasses.replace(
        sc.cfg, capacity=dataclasses.replace(
            sc.cfg.capacity, cell_capacity=cap)).finalize()
    geom = ec.make_geometry(cfg)
    state = jax.jit(lambda s: layout_build(geom, cfg.box, s))(state)
    n = int(state.natoms)
    kern = ec._make_kernel(cfg, geom)
    r_every = ec.auto_rebuild_every(cfg)
    dt = float(cfg.dt)
    print("natoms", n, "fill", geom.fcap, "store", geom.cap,
          "r_every", r_every)

    def make_run(*, kick=True, drift=True, wrap=True, pack=True,
                 kernel=True, unpack=True, boundary=True, stage=True,
                 relayout=True):
        flags = ec.relayout_flags(cfg)

        def pstep(state, do_relayout):
            dtype = state.x.dtype.type
            m = per_atom_mass(cfg, state)[:, None]
            a3 = state.alive[:, None]
            dtf = dtype(0.5 * dt)
            v = (jnp.where(a3, state.v + dtf * state.f / m, state.v)
                 if kick else state.v)
            x = (jnp.where(a3, state.x + dtype(dt) * v, state.x)
                 if drift else state.x)
            if wrap:
                x = cfg.box.wrap(x)
            state = state.replace(x=x, v=v)
            if do_relayout and relayout:
                state = note_skin_check(cfg.box, float(cfg.skin), state)
                state = relayout_incremental(geom, cfg.box, state,
                                             move_f=False, **flags)
            if stage:
                state = ec._obmd_stage(cfg, geom, state,
                                       with_rebuild=False)
            # forces, piecewise
            nb, capg, lanes = geom.n_blocks, geom.cap, geom.lanes
            if pack:
                xm = jnp.where(a3, state.x, BIG).astype(jnp.float32)
                fld = jnp.concatenate(
                    [xm, state.v.astype(jnp.float32)], axis=1)
                fld = fld.reshape(nb, capg, lanes, 6).transpose(0, 3, 1, 2)
            else:
                fld = jnp.full((nb, 6, capg, lanes), 2.0, jnp.float32) \
                    + 1e-30 * state.x[0, 0]
            aux = state.nbrs
            tag, occ = aux.tag3d, aux.occ
            salt = rng.step_salt(getattr(cfg.pair, "seed", 0), state.step,
                                 PURPOSE_PAIR_NOISE)
            if kernel:
                fpad = kern(fld, tag, salt, occ, None)
            else:
                fpad = jnp.zeros((nb, 3, capg, lanes), jnp.float32) \
                    + 1e-30 * fld[:, :3]
            if unpack:
                f = fpad.transpose(0, 2, 3, 1).reshape(-1, 3).astype(
                    state.x.dtype)
            else:
                f = jnp.zeros_like(state.x) + 1e-30 * fpad[0, 0, 0, 0]
            if boundary and cfg.obmd is not None:
                f = ec._boundary_force_sliced(cfg, geom, state, f)
            f = jnp.where(state.alive[:, None], f, 0.0)
            m = per_atom_mass(cfg, state)[:, None]
            v = (jnp.where(state.alive[:, None],
                           state.v + dtf * f / m, state.v)
                 if kick else state.v)
            return state.replace(v=v, f=f, step=state.step + 1)

        @jax.jit
        def run(state):
            def chunk(s, _):
                s = pstep(s, True)
                s, _ = jax.lax.scan(
                    lambda c, __: (pstep(c, False), None), s, None,
                    length=r_every - 1)
                return s, None
            s, _ = jax.lax.scan(chunk, state, None,
                                length=nsteps // r_every)
            return s
        return run

    variants = [
        ("full", {}),
        ("-kernel", dict(kernel=False)),
        ("-pack", dict(pack=False)),
        ("-unpack", dict(unpack=False)),
        ("-kick", dict(kick=False)),
        ("-drift+wrap", dict(drift=False, wrap=False)),
        ("-wrap", dict(wrap=False)),
        ("-boundary", dict(boundary=False)),
        ("-stage", dict(stage=False)),
        ("-relayout", dict(relayout=False)),
    ]
    runs = [(nm, make_run(**kw)) for nm, kw in variants]
    for _, r in runs:
        np.asarray(r(state).x)
    for rep in range(2):
        out = []
        for nm, r in runs:
            t0 = time.perf_counter()
            np.asarray(r(state).x)
            out.append("%s %.3f" % (nm, (time.perf_counter() - t0)
                                    / nsteps * 1e3))
        print(" | ".join(out))


if __name__ == "__main__":
    main()
