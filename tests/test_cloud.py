import numpy as np
import jax.numpy as jnp

from staticmapping_tpu.common import se3
from staticmapping_tpu.data import cloud as cloud_lib


def make_cloud(n=100, cap=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-10, 10, size=(n, 3))
    return cloud_lib.from_numpy(pts, capacity=cap), pts


def test_from_numpy_counts():
    pc, pts = make_cloud(100, 256)
    assert pc.capacity == 256
    assert int(pc.num_valid()) == 100
    np.testing.assert_allclose(np.asarray(pc.xyz)[:100], pts, atol=1e-5)


def test_factor_stamping():
    pc, _ = make_cloud(100, 256)
    f = np.asarray(pc.factor)
    np.testing.assert_allclose(f[:100], np.arange(100) / 100.0, atol=1e-6)
    assert np.all(f[100:] == 0)


def test_transform():
    pc, pts = make_cloud(50, 64)
    T = se3.from_rt(se3.euler_to_matrix(jnp.array([0.1, 0.2, 0.3])),
                    jnp.array([1.0, 2.0, 3.0]))
    out = pc.transform(T)
    R = np.asarray(se3.rotation(T))
    t = np.asarray(se3.translation(T))
    np.testing.assert_allclose(np.asarray(out.xyz)[:50],
                               pts @ R.T + t, atol=1e-4)


def test_motion_compensation_identity_factor_zero():
    # factor = 0 → point untouched even with a big transform
    pts = np.array([[1.0, 2.0, 3.0]])
    pc = cloud_lib.from_numpy(pts, capacity=8, stamp_factors=False)
    T = se3.from_rt(se3.euler_to_matrix(jnp.array([0.0, 0.0, 1.0])),
                    jnp.array([5.0, 0.0, 0.0]))
    out = pc.motion_compensate(T)
    np.testing.assert_allclose(np.asarray(out.xyz)[0], pts[0], atol=1e-5)


def test_motion_compensation_factor_one():
    # factor == 1 → full transform applied (slerp endpoint)
    pc = cloud_lib.PointCloud(
        xyz=jnp.array([[1.0, 0.0, 0.0]]),
        intensity=jnp.zeros((1,)),
        factor=jnp.ones((1,)),
        mask=jnp.ones((1,), dtype=bool),
    )
    T = se3.from_rt(se3.euler_to_matrix(jnp.array([0.0, 0.0, np.pi / 2])),
                    jnp.array([0.0, 0.0, 1.0]))
    out = pc.motion_compensate(T)
    np.testing.assert_allclose(np.asarray(out.xyz)[0], [0.0, 1.0, 1.0],
                               atol=1e-5)


def test_compact():
    pc, _ = make_cloud(10, 32)
    # knock out some points
    mask = np.asarray(pc.mask).copy()
    mask[[0, 2, 4]] = False
    pc = cloud_lib.PointCloud(pc.xyz, pc.intensity, pc.factor, jnp.asarray(mask))
    out = pc.compact()
    m = np.asarray(out.mask)
    assert int(m.sum()) == 7
    assert np.all(m[:7]) and not np.any(m[7:])
    # relative order preserved: factors still increasing
    f = np.asarray(out.factor)[:7]
    assert np.all(np.diff(f) > 0)


def test_concat():
    a, _ = make_cloud(10, 32, seed=1)
    b, _ = make_cloud(20, 32, seed=2)
    out = cloud_lib.concat(a, b, capacity=64)
    assert out.capacity == 64
    assert int(out.num_valid()) == 30


def test_centroid_ignores_padding():
    pts = np.array([[1.0, 0, 0], [3.0, 0, 0]])
    pc = cloud_lib.from_numpy(pts, capacity=16)
    np.testing.assert_allclose(np.asarray(pc.centroid()), [2.0, 0, 0],
                               atol=1e-5)


def test_to_numpy_roundtrip():
    pc, pts = make_cloud(33, 64)
    out = cloud_lib.to_numpy(pc)
    assert out.shape == (33, 4)
    np.testing.assert_allclose(out[:, :3], pts, atol=1e-5)
