import time, functools
import jax, jax.numpy as jnp
import numpy as np
from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup, make_run
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cellpad import relayout_incremental
from obmd_tpu.cells import BIG

sc = scenes.obmd_dpd_scene(scale=8, seed=7)
cfg = sc.cfg
geom = ec.make_geometry(cfg)
print("dims", geom.dims, "cap", geom.cap, "n_slots", geom.n_slots,
      "R", ec.auto_rebuild_every(cfg), flush=True)
state = setup(cfg, sc.state)
state = equilibrate(cfg, state, 200)
jax.block_until_ready(state.x)
print("natoms", int(state.natoms), flush=True)
kern = ec._make_kernel(cfg, geom)

def timeit(name, fn, state, iters=50):
    @jax.jit
    def loop(s):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, s, None, length=iters)
        return c
    out = loop(state); jax.block_until_ready(out.x)
    t0 = time.perf_counter(); out = loop(state); jax.block_until_ready(out.x)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms/iter", flush=True)

timeit("plain step (stage+forces+kick)",
       functools.partial(ec._plain_step, cfg, geom, kern), state)
timeit("forces only", lambda s: s.replace(f=ec._forces(cfg, geom, kern, s)), state)

nb, cap, lanes = geom.n_blocks, geom.cap, geom.lanes
a3 = state.alive[:, None]
xm = jnp.where(a3, state.x, BIG).astype(jnp.float32)
fld = jnp.concatenate([xm, state.v.astype(jnp.float32)], axis=1)
fld = fld.reshape(nb, cap, lanes, 6).transpose(0, 3, 1, 2)
tag = state.tag.reshape(nb, cap, lanes)
rank = jnp.arange(cap, dtype=jnp.int32)[None, :, None]
occ = jnp.max(jnp.where(state.alive.reshape(nb, cap, lanes), rank, -1),
              axis=(1, 2)) + 1
print("occ mean %.1f max %d" % (float(occ.mean()), int(occ.max())), flush=True)
salt = jnp.uint32(123)
@jax.jit
def kloop(fld):
    def body(c, _):
        out = kern(c, tag, salt, occ, None)
        return c.at[:, 3:, :, :].add(1e-12 * out), None
    c, _ = jax.lax.scan(body, fld, None, length=50)
    return c
out = kloop(fld); jax.block_until_ready(out)
t0 = time.perf_counter(); out = kloop(fld); jax.block_until_ready(out)
print(f"{'newton kernel only':40s} {(time.perf_counter()-t0)/50*1e3:8.3f} ms/iter", flush=True)

timeit("obmd stage only",
       lambda s: ec._obmd_stage(cfg, geom, s, with_rebuild=False), state)
timeit("relayout_incremental", lambda s: relayout_incremental(geom, cfg.box, s), state)
