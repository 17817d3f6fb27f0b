"""In-context substitution profile, finer grain than prof_r5: each
variant removes ONE piece of the production step by substituting its
output (XLA dead-code-eliminates the piece; everything else unchanged).
Bare-kernel scans are NOT trustworthy here (they measured MORE than the
whole step — scan-carry layout artifacts), substitution inside the real
run is."""
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


def rate(run, state, nsteps):
    s = run(state)
    np.asarray(s.x)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        s2 = run(s)
        np.asarray(s2.x)
        best = min(best, time.perf_counter() - t0)
    return best / nsteps * 1e3


def main():
    scale = float(os.environ.get("BENCH_SCALE", "8"))
    cap = int(os.environ.get("BENCH_CAP", "15"))
    nsteps = 400

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
    print("natoms", n, "fill", geom.fcap, "store", geom.cap,
          "nb", geom.n_blocks)

    real_make = ec.make_pair_kernel

    def variant(name, make_kernel=None):
        if make_kernel is not None:
            ec.make_pair_kernel = make_kernel
        try:
            t = rate(ec.make_run_cellpad(cfg, nsteps), state, nsteps)
        finally:
            ec.make_pair_kernel = real_make
        print("%-16s %.3f ms/step  (%.2f Mps/s)" % (name, t, n / t / 1e3))
        return t

    t_prod = variant("production")

    # kernel removed (fld/pack kept live through a 1e-30 tap)
    def mk_zero(geom_, **kw):
        nb, cap_, lanes = geom_.n_blocks, geom_.cap, geom_.lanes

        def fn(fld, tag, salt, occ, pbond=None, sig_scale=None):
            return jnp.zeros((nb, 3, cap_, lanes), jnp.float32) \
                + 1e-30 * fld[:, :3]
        return fn
    t_nok = variant("no-kernel", mk_zero)

    # pack removed: kernel runs on a constant field (same shapes; the
    # [N,NF] -> (nb,NF,cap,lanes) retile is dead-code-eliminated)
    def mk_nopack(geom_, **kw):
        real = real_make(geom_, **kw)
        nb, cap_, lanes = geom_.n_blocks, geom_.cap, geom_.lanes

        def fn(fld, tag, salt, occ, pbond=None, sig_scale=None):
            cfld = jnp.full((nb, fld.shape[1], cap_, lanes), 2.0,
                            jnp.float32) + 1e-30 * fld[0, 0, 0, 0]
            return real(cfld, tag, salt, occ, pbond,
                        sig_scale=sig_scale)
        return fn
    t_nopack = variant("no-pack", mk_nopack)

    # unpack removed: downstream consumes only a scalar tap of the kernel
    # output (the (nb,3,cap,lanes) -> [N,3] transpose is eliminated)
    def mk_nounpack(geom_, **kw):
        real = real_make(geom_, **kw)
        nb, cap_, lanes = geom_.n_blocks, geom_.cap, geom_.lanes

        def fn(fld, tag, salt, occ, pbond=None, sig_scale=None):
            f = real(fld, tag, salt, occ, pbond, sig_scale=sig_scale)
            return jnp.zeros((nb, 3, cap_, lanes), jnp.float32) \
                + 1e-30 * f[0, 0, 0, 0]
        return fn
    t_nounp = variant("no-unpack", mk_nounpack)

    cfg_ns = dataclasses.replace(cfg, obmd=None).finalize()
    t_ns = rate(ec.make_run_cellpad(cfg_ns, nsteps), state, nsteps)
    print("%-16s %.3f ms/step" % ("no-stage", t_ns))

    print("-> kernel %.3f | pack %.3f | unpack %.3f | stage %.3f | "
          "other %.3f"
          % (t_prod - t_nok, t_prod - t_nopack, t_prod - t_nounp,
             t_prod - t_ns,
             t_nok - (t_prod - t_nopack) - (t_prod - t_ns)))


if __name__ == "__main__":
    main()
