import time, jax, jax.numpy as jnp
print("default_backend:", jax.default_backend(), flush=True)
from staticmapping_tpu.ops import nn_search
M, N = 32768, 4096
q = jax.random.normal(jax.random.PRNGKey(0), (M, 3)) * 10
t = jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 10
mask = jnp.ones((N,), bool)
print("_use_pallas:", nn_search._use_pallas(M, N), flush=True)

f = jax.jit(lambda q: nn_search.nearest_1(q, t, mask))
d, i = f(q); jax.block_until_ready((d, i))
t0 = time.perf_counter()
for _ in range(50): d, i = f(q)
jax.block_until_ready((d, i))
print("nearest_1 each ms:", (time.perf_counter()-t0)/50*1000, flush=True)

# pallas inside fori_loop
def loop(q):
    def body(k, carry):
        d, i = nn_search.nearest_1(q + 0.001 * k, t, mask)
        return carry + jnp.sum(d)
    return jax.lax.fori_loop(0, 12, body, 0.0)
g = jax.jit(loop)
r = g(q); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(10): r = g(q)
jax.block_until_ready(r)
print("12x nn in fori_loop, each call ms:", (time.perf_counter()-t0)/10*1000, flush=True)
