import jax, jax.numpy as jnp, numpy as np
n = 1000
tags = jnp.arange(1, n+1, dtype=jnp.int32)
x = jnp.ones((n, 3), jnp.float32)
packed = jnp.concatenate([x, tags.view(jnp.float32)[:, None]], axis=1)
idx = jnp.asarray(np.random.default_rng(0).integers(0, n, (64,)), jnp.int32)

@jax.jit
def go(packed, idx):
    pad = jnp.zeros((1, 4), jnp.float32)
    g = jnp.concatenate([packed, pad], axis=0)[idx]
    return g[:, 3].view(jnp.int32)

out = np.asarray(go(packed, idx))
want = np.asarray(tags)[np.asarray(idx)]
print("tags survive gather:", np.array_equal(out, want), "| sample out", out[:5], "want", want[:5])
