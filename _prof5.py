import time, jax, jax.numpy as jnp
from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.ops.normals import estimate_normals
from staticmapping_tpu.registration.icp_fast import align_point_to_plane
from staticmapping_tpu.io import synthetic

capacity = 32768
scans, gt = synthetic.make_sequence(n_scans=4, seed=0, trajectory="straight", step=0.5, max_points=20000)
clouds = [cloud_lib.from_numpy(s, capacity=capacity) for s in scans]
guess = jnp.eye(4, dtype=jnp.float32)
tgt = estimate_normals(clouds[0], leaf_size=8)
jax.block_until_ready(tgt)

for kw in (dict(), dict(exact_quantile=True), dict(max_iteration=12)):
    T, score = align_point_to_plane(clouds[1], tgt, guess, **kw)
    jax.block_until_ready(T)
    t0 = time.perf_counter()
    for _ in range(10): T, score = align_point_to_plane(clouds[1], tgt, guess, **kw)
    jax.block_until_ready(T)
    print(kw, "each ms:", (time.perf_counter()-t0)/10*1000, flush=True)
