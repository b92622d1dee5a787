import numpy as np, jax.numpy as jnp, itertools
import tests.test_icp as t
from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.common import se3
from staticmapping_tpu.ops.normals import estimate_normals
from staticmapping_tpu.registration.icp_fast import align_point_to_plane

pts = t.make_scene()
true_T = se3.from_rt(se3.euler_to_matrix(jnp.array([0.01, -0.02, 0.05])),
                     jnp.array([0.4, -0.3, 0.1]))
tgt_pc = cloud_lib.from_numpy(pts, capacity=4096)
src_pts = np.asarray(se3.apply(se3.inverse(true_T), jnp.asarray(pts)))
source = cloud_lib.from_numpy(src_pts, capacity=4096)
for method, eq in itertools.product(["morton", "kdsplit"], [False, True]):
    target = estimate_normals(tgt_pc, leaf_size=8, method=method)
    T, score = align_point_to_plane(source, target, se3.identity(), tile=512,
                                    exact_quantile=eq)
    err = np.abs(np.asarray(T @ se3.inverse(true_T)) - np.eye(4))[:3,:].max()
    print(f"{method:8s} exact={eq}: err={err:.4f} score={float(score):.3f}")
