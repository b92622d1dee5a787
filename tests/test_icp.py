import numpy as np
import jax.numpy as jnp

from staticmapping_tpu.common import se3
from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.ops.normals import estimate_normals
from staticmapping_tpu.registration.icp_fast import align_point_to_plane, IcpFast


def make_scene(n=4096, seed=0):
    """Structured synthetic scene (planes at many orientations) so
    point-to-plane has full 6-DoF constraint."""
    rng = np.random.default_rng(seed)
    per = n // 4
    # floor
    floor = np.column_stack([rng.uniform(-20, 20, per),
                             rng.uniform(-20, 20, per),
                             np.zeros(per)])
    # two walls
    w1 = np.column_stack([np.full(per, 8.0) + 0.3 * rng.standard_normal(per) * 0,
                          rng.uniform(-20, 20, per),
                          rng.uniform(0, 6, per)])
    w2 = np.column_stack([rng.uniform(-20, 20, per),
                          np.full(per, -6.0),
                          rng.uniform(0, 6, per)])
    # slanted roof
    x = rng.uniform(-20, 20, per)
    roof = np.column_stack([x, rng.uniform(-20, 20, per), 6.0 + 0.3 * x])
    return np.vstack([floor, w1, w2, roof]).astype(np.float32)


def test_icp_recovers_transform():
    pts = make_scene()
    true_T = se3.from_rt(
        se3.euler_to_matrix(jnp.array([0.01, -0.02, 0.05])),
        jnp.array([0.4, -0.3, 0.1]))
    tgt_pc = cloud_lib.from_numpy(pts, capacity=4096)
    target = estimate_normals(tgt_pc, leaf_size=8)
    # source = target points moved by inverse(T): aligning source onto
    # target should recover T
    src_pts = np.asarray(se3.apply(se3.inverse(true_T), jnp.asarray(pts)))
    source = cloud_lib.from_numpy(src_pts, capacity=4096)

    T, score = align_point_to_plane(source, target, se3.identity(),
                                    tile=512)
    err = np.asarray(T @ se3.inverse(true_T)) - np.eye(4)
    # precision bound set by leaf-size-8 downsampled normals (same error
    # class as the reference's SamplingSurfaceNormal leaves)
    assert np.abs(err[:3, :]).max() < 3e-2, f"T=\n{np.asarray(T)}"
    assert float(score) > 0.4


def test_icp_identity_on_same_cloud():
    pts = make_scene(seed=1)
    tgt_pc = cloud_lib.from_numpy(pts, capacity=4096)
    target = estimate_normals(tgt_pc, leaf_size=8)
    source = cloud_lib.from_numpy(pts, capacity=4096)
    T, score = align_point_to_plane(source, target, se3.identity(), tile=512)
    Tn = np.asarray(T)
    assert np.abs(Tn - np.eye(4)).max() < 5e-2
    assert float(score) > 0.4


def test_icp_uses_guess():
    # large offset, good guess → converges
    pts = make_scene(seed=2)
    true_T = se3.from_rt(se3.euler_to_matrix(jnp.array([0.0, 0.0, 0.3])),
                         jnp.array([3.0, -2.0, 0.5]))
    tgt_pc = cloud_lib.from_numpy(pts, capacity=4096)
    target = estimate_normals(tgt_pc, leaf_size=8)
    src_pts = np.asarray(se3.apply(se3.inverse(true_T), jnp.asarray(pts)))
    source = cloud_lib.from_numpy(src_pts, capacity=4096)
    T, score = align_point_to_plane(source, target, true_T, tile=512)
    err = np.asarray(T @ se3.inverse(true_T)) - np.eye(4)
    assert np.abs(err[:3, :]).max() < 2e-2


def test_matcher_class_api():
    pts = make_scene(seed=3)
    matcher = IcpFast(tile=512)
    tgt_pc = cloud_lib.from_numpy(pts, capacity=4096)
    matcher.set_input_target(estimate_normals(tgt_pc, leaf_size=8))
    matcher.set_input_source(cloud_lib.from_numpy(pts, capacity=4096))
    T, score = matcher.align(se3.identity())
    assert float(score) > 0.4
