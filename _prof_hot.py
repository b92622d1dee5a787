import time, jax, jax.numpy as jnp, numpy as np
from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.ops.normals import estimate_normals
from staticmapping_tpu.registration.icp_fast import align_point_to_plane
from staticmapping_tpu.io import synthetic
from staticmapping_tpu.common import np_se3

capacity = 32768
scans, gt = synthetic.make_sequence(n_scans=4, seed=0, trajectory="straight", step=0.5, max_points=20000)
clouds = [cloud_lib.from_numpy(s, capacity=capacity) for s in scans]
guess = jnp.eye(4, dtype=jnp.float32)

t0=time.perf_counter()
tgt = estimate_normals(clouds[0], leaf_size=8)
jax.block_until_ready(tgt)
print("normals compile+run", time.perf_counter()-t0, flush=True)
t0=time.perf_counter()
for _ in range(20): tgt = estimate_normals(clouds[0], leaf_size=8)
jax.block_until_ready(tgt)
print("normals each ms:", (time.perf_counter()-t0)/20*1000, flush=True)

t0=time.perf_counter()
T,score,it = align_point_to_plane(clouds[1], tgt, guess, return_aux=True)
jax.block_until_ready(T)
print("align compile+run", time.perf_counter()-t0, "iters", int(it), flush=True)
t0=time.perf_counter()
for _ in range(20): T,score = align_point_to_plane(clouds[1], tgt, guess)
jax.block_until_ready(T)
print("align each ms:", (time.perf_counter()-t0)/20*1000, "score", float(score), flush=True)
T_rel_gt = np_se3.inverse(gt[0]) @ gt[1]
print("T err max:", np.abs(np.asarray(T) - T_rel_gt).max())
