import numpy as np
import jax.numpy as jnp
import pytest

from staticmapping_tpu.common import se3


def rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return np.asarray(se3.quat_normalize(jnp.asarray(q)))


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(0)
    q = rand_quat(rng, (32,))
    q = np.where(q[..., :1] < 0, -q, q)
    R = se3.quat_to_matrix(jnp.asarray(q))
    q2 = se3.matrix_to_quat(R)
    np.testing.assert_allclose(np.abs(np.sum(q * np.asarray(q2), axis=-1)),
                               1.0, atol=1e-5)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, (8,))
    v = rng.normal(size=(8, 3)).astype(np.float32)
    R = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    out = np.asarray(se3.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(out, np.einsum("nij,nj->ni", R, v), atol=1e-5)


def test_euler_roundtrip():
    rng = np.random.default_rng(2)
    e = rng.uniform(-1.0, 1.0, size=(16, 3)).astype(np.float32)
    R = se3.euler_to_matrix(jnp.asarray(e))
    e2 = se3.matrix_to_euler(R)
    np.testing.assert_allclose(np.asarray(e2), e, atol=1e-5)


def test_compose_inverse():
    rng = np.random.default_rng(3)
    q = rand_quat(rng, (4,))
    t = rng.normal(size=(4, 3)).astype(np.float32)
    T = se3.from_rt(se3.quat_to_matrix(jnp.asarray(q)), jnp.asarray(t))
    out = np.asarray(T @ se3.inverse(T))
    np.testing.assert_allclose(out, np.broadcast_to(np.eye(4), (4, 4, 4)),
                               atol=1e-5)


def test_apply_points():
    T = se3.from_rt(se3.euler_to_matrix(jnp.array([0.0, 0.0, np.pi / 2])),
                    jnp.array([1.0, 0.0, 0.0]))
    pts = jnp.array([[1.0, 0.0, 0.0]])
    out = np.asarray(se3.apply(T, pts))
    np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-6)


def test_interpolate_endpoints():
    rng = np.random.default_rng(4)
    qa, qb = rand_quat(rng), rand_quat(rng)
    Ta = se3.from_rt(se3.quat_to_matrix(jnp.asarray(qa)), jnp.array([0.0, 0, 0]))
    Tb = se3.from_rt(se3.quat_to_matrix(jnp.asarray(qb)), jnp.array([1.0, 2, 3]))
    np.testing.assert_allclose(np.asarray(se3.interpolate(Ta, Tb, 0.0)),
                               np.asarray(Ta), atol=1e-5)
    np.testing.assert_allclose(np.asarray(se3.interpolate(Ta, Tb, 1.0)),
                               np.asarray(Tb), atol=1e-5)


def test_interpolate_half_translation():
    Ta = se3.identity()
    Tb = se3.from_rt(jnp.eye(3), jnp.array([2.0, 0.0, 0.0]))
    mid = se3.interpolate(Ta, Tb, 0.5)
    np.testing.assert_allclose(np.asarray(se3.translation(mid)),
                               [1.0, 0.0, 0.0], atol=1e-6)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(5)
    xi = rng.uniform(-0.5, 0.5, size=(16, 6)).astype(np.float32)
    T = se3.exp_se3(jnp.asarray(xi))
    xi2 = se3.log_se3(T)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-4)


def test_exp_zero():
    T = se3.exp_se3(jnp.zeros((6,)))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


def test_axis_angle_roundtrip():
    rng = np.random.default_rng(6)
    w = rng.uniform(-1, 1, size=(8, 3)).astype(np.float32)
    R = se3.axis_angle_to_matrix(jnp.asarray(w))
    w2 = se3.matrix_to_axis_angle(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)


def test_angular_distance():
    qa = se3.quat_identity()
    qb = se3.euler_to_quat(jnp.array([0.0, 0.0, 0.3]))
    d = se3.quat_angular_distance(qa, qb)
    np.testing.assert_allclose(float(d), 0.3, atol=1e-5)


def test_average_transforms():
    Ta = se3.from_rt(jnp.eye(3), jnp.array([0.0, 0.0, 0.0]))
    Tb = se3.from_rt(jnp.eye(3), jnp.array([2.0, 4.0, 6.0]))
    avg = se3.average_transforms(jnp.stack([Ta, Tb]))
    np.testing.assert_allclose(np.asarray(se3.translation(avg)),
                               [1.0, 2.0, 3.0], atol=1e-5)


def test_vector6_roundtrip():
    rng = np.random.default_rng(7)
    v = np.concatenate([rng.normal(size=3),
                        rng.uniform(-1, 1, size=3)]).astype(np.float32)
    T = se3.vector6_to_transform(jnp.asarray(v))
    v2 = se3.transform_to_vector6(T)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-5)
