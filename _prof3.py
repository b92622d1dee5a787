import time, jax, jax.numpy as jnp
from staticmapping_tpu.ops import nn_search
M, N = 32768, 4096
q8 = jnp.pad(jax.random.normal(jax.random.PRNGKey(0), (M, 3)) * 10, ((0,0),(0,5)))
t8 = jnp.pad(jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 10, ((0,0),(0,5)))

def bench(f, *args, n=50, name=""):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.3f} ms", flush=True)

f = lambda a, b: nn_search._nearest_pallas(a, b, 512, 4096)
bench(f, q8, t8, name="_nearest_pallas direct")

g = jax.jit(lambda a, b: nn_search._nearest_pallas(a, b, 512, 4096))
bench(g, q8, t8, name="_nearest_pallas outer-jit")
