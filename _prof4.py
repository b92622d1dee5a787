import time, jax, jax.numpy as jnp
from staticmapping_tpu.ops import nn_search
M, N = 32768, 4096
q = jax.random.normal(jax.random.PRNGKey(0), (M, 3)) * 10
t = jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 10
mask = jnp.ones((N,), bool)

def bench(f, *args, n=50, name=""):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.3f} ms", flush=True)

# wrapper pieces inside one jit
@jax.jit
def f1(q, t, mask):
    tgt = jnp.where(mask[:, None], t, jnp.full_like(t, 1e6))
    return nn_search._nearest_pallas(nn_search._pad8(q), nn_search._pad8(tgt), 512, 4096)
bench(f1, q, t, mask, name="where+pad+pallas jit")

@jax.jit
def f2(q, t, mask):
    return nn_search.nearest_1(q, t, mask)
bench(f2, q, t, mask, name="nearest_1 jit")
