import time
import jax, jax.numpy as jnp
import numpy as np
from obmd_tpu import scenes
from obmd_tpu.integrate import equilibrate, setup
from obmd_tpu import engine_cellpad as ec
from obmd_tpu.cellpad import relayout_incremental
from obmd_tpu.obmd.stage import delete_outside, region_count
from obmd_tpu.obmd.subset import usher_search_subset

sc = scenes.obmd_dpd_scene(scale=8, seed=7)
cfg = sc.cfg
geom = ec.make_geometry(cfg)
state = setup(cfg, sc.state)
state = equilibrate(cfg, state, 200)
jax.block_until_ready(state.x)
obmd = cfg.obmd
pad = cfg.pair.max_cut + cfg.skin

def timeit(name, fn, iters=50):
    """fn(state)->pytree; input perturbed by prior output so nothing hoists."""
    @jax.jit
    def loop(s):
        def body(carry, _):
            acc, = carry
            s2 = s.replace(x=s.x + acc)
            out = fn(s2)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, 'dtype')]
            tot = sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)
            return (tot * 1e-38,), None
        (acc,), _ = jax.lax.scan(body, (jnp.zeros(()),), None, length=iters)
        return acc
    out = loop(state); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = loop(state); jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms", flush=True)

timeit("delete_outside", lambda s: delete_outside(cfg, s)[0].alive)
timeit("census x2", lambda s: (region_count(s, obmd.region1),
                               region_count(s, obmd.region2)))
timeit("subset slices x2", lambda s: (ec._subset_slice(cfg, geom, s, obmd.region5, pad).x,
                                      ec._subset_slice(cfg, geom, s, obmd.region6, pad).x))
K = obmd.insert_kmax
kk = jax.random.PRNGKey(0)
cand = obmd.region5.sample_uniform(jax.random.uniform(kk, (K,3)))
ctype = jnp.zeros((K,), jnp.int32)
timeit("usher_search (one side)",
       lambda s: usher_search_subset(cfg, ec._subset_slice(cfg, geom, s, obmd.region5, pad),
                                     cand, ctype, obmd.region5)[0])
timeit("insert (both sides)",
       lambda s: ec._insert(cfg, geom, s, jnp.int32(2), jnp.int32(2),
                            ec._subset_slice(cfg, geom, s, obmd.region5, pad),
                            ec._subset_slice(cfg, geom, s, obmd.region6, pad)).alive)
timeit("boundary force", lambda s: ec.apply_boundary_force(cfg, s, s.f))
timeit("stage full", lambda s: ec._obmd_stage(cfg, geom, s, with_rebuild=False).alive)
timeit("relayout", lambda s: relayout_incremental(geom, cfg.box, s).alive, iters=20)

# scaling test: does usher time scale with B at all?
from obmd_tpu.obmd.subset import Subset as SS
for B in (2048, 8192, 32768):
    xs = jnp.asarray(np.random.default_rng(0).uniform(0, 40, (B, 3)).astype(np.float32))
    subB = SS(idx=jnp.zeros((B,), jnp.int32), x=xs,
              type=jnp.zeros((B,), jnp.int32), q=jnp.zeros((B,), jnp.float32),
              valid=jnp.ones((B,), bool), overflow=jnp.zeros((), bool))
    timeit(f"usher B={B}",
           lambda s, sb=subB: usher_search_subset(cfg, sb._replace(x=sb.x + 0.0*s.x[0,0]), cand, ctype, obmd.region5)[0])

from obmd_tpu.forces.pallas_usher import usher_search_pallas
cand_l = obmd.region5.sample_uniform(jax.random.uniform(kk, (K,3)))
cand_r = obmd.region6.sample_uniform(jax.random.uniform(kk, (K,3)))
timeit("pallas usher (both sides)",
       lambda s: usher_search_pallas(cfg, ec._subset_slice(cfg, geom, s, obmd.region5, pad),
                                     ec._subset_slice(cfg, geom, s, obmd.region6, pad),
                                     cand_l, cand_r, obmd.region5, obmd.region6)[0])
from obmd_tpu.obmd.subset import usher_search_subset_batch
ct0 = jnp.zeros((K,), jnp.int32)
timeit("xla batch usher (both sides)",
       lambda s: usher_search_subset_batch(cfg, ec._subset_slice(cfg, geom, s, obmd.region5, pad),
                                           ec._subset_slice(cfg, geom, s, obmd.region6, pad),
                                           cand_l, cand_r, ct0, obmd.region5, obmd.region6)[0])
