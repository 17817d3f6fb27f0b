"""Micro-benchmark: the relayout's row-move primitives on chip.

relayout_incremental pays ~8 single-column scatters (x,y,z,vx,vy,vz,
tag,alive) of ~12k rows each into 198k-slot columns; prof_r5c attributes
~0.27 ms/step amortized (~3.5 ms/event at r_every 13) to the relayout.
This measures the alternatives:
  A. per-column scatter (current scatter_rows)
  B. ONE int32 source-map scatter + per-column full-N gathers
  C. packed [N,8] row scatter (the rejected r4 variant, for the record)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 198656
M = 12416


def timeit(fn, *args, iters=200):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(N, 3)).astype(np.float32))
    v = jnp.asarray(r.normal(size=(N, 3)).astype(np.float32))
    tag = jnp.asarray(r.integers(0, N, N).astype(np.int32))
    alive = jnp.asarray(r.random(N) < 0.5)
    idx = jnp.asarray(r.choice(N, M, replace=False).astype(np.int32))
    src_rows = jnp.asarray(r.choice(N, M, replace=False).astype(np.int32))

    @jax.jit
    def col_scatters(x, v, tag, alive):
        xs = x[src_rows]
        vs = v[src_rows]
        cols = [x[:, k].at[idx].set(xs[:, k]) for k in range(3)]
        cols += [v[:, k].at[idx].set(vs[:, k]) for k in range(3)]
        t = tag.at[idx].set(tag[src_rows])
        a = alive.at[idx].set(alive[src_rows])
        return jnp.stack(cols[:3], 1), jnp.stack(cols[3:], 1), t, a

    @jax.jit
    def src_map_gathers(x, v, tag, alive):
        src = jnp.arange(N, dtype=jnp.int32).at[idx].set(src_rows)
        fill = jnp.zeros((N,), bool).at[src_rows].set(True)
        xs = [jnp.where(fill, 0.0, x[:, k][src]) for k in range(3)]
        vs = [jnp.where(fill, 0.0, v[:, k][src]) for k in range(3)]
        t = jnp.where(fill, -1, tag[src])
        a = jnp.where(fill, False, alive[src])
        return jnp.stack(xs, 1), jnp.stack(vs, 1), t, a

    @jax.jit
    def packed_scatter(x, v, tag, alive):
        pk = jnp.concatenate(
            [x, v, tag.view(jnp.float32)[:, None] if False else
             tag.astype(jnp.float32)[:, None],
             alive.astype(jnp.float32)[:, None]], axis=1)
        out = pk.at[idx].set(pk[src_rows])
        return out

    print("col_scatters   %.3f ms" % timeit(col_scatters, x, v, tag, alive))
    print("src_map_gather %.3f ms" % timeit(src_map_gathers, x, v, tag,
                                            alive))
    print("packed_scatter %.3f ms" % timeit(packed_scatter, x, v, tag,
                                            alive))
    # single-op costs for the model
    one_sc = jax.jit(lambda x: x[:, 0].at[idx].set(1.0))
    one_g = jax.jit(lambda x: x[:, 0][src_rows])
    full_g = jax.jit(
        lambda x: x[:, 0][jnp.arange(N, dtype=jnp.int32).at[idx].set(
            src_rows)])
    print("1-col scatter  %.3f ms" % timeit(one_sc, x))
    print("12k gather     %.3f ms" % timeit(one_g, x))
    print("full-N gather  %.3f ms" % timeit(full_g, x))


if __name__ == "__main__":
    main()
