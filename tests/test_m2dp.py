import numpy as np
import jax.numpy as jnp

from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.descriptor import m2dp
from staticmapping_tpu.common import np_se3


def make_structured(seed=0, n=2000):
    rng = np.random.default_rng(seed)
    per = n // 3
    a = np.column_stack([rng.uniform(-10, 10, per), rng.uniform(-5, 5, per),
                         np.full(per, -1.7)])
    b = np.column_stack([np.full(per, 4.0), rng.uniform(-8, 8, per),
                         rng.uniform(0, 5, per)])
    c = np.column_stack([rng.uniform(-10, 0, per), np.full(per, -3.0),
                         rng.uniform(0, 3, per)])
    return np.vstack([a, b, c]).astype(np.float32)


def desc_of(pts, cap=2048):
    pc = cloud_lib.from_numpy(pts, capacity=cap)
    return np.asarray(m2dp.compute_descriptor(pc))


def test_descriptor_shape_and_finite():
    d = desc_of(make_structured())
    l = int(np.ceil(np.sqrt(m2dp.MAX_DISTANCE / m2dp.R_BIN)))
    assert d.shape == (m2dp.P_VIEWS * m2dp.Q_VIEWS + l * m2dp.T_BINS,)
    assert np.isfinite(d).all()


def test_rotation_invariance():
    """M2DP is (approximately) rotation invariant thanks to PCA alignment —
    the property loop detection relies on."""
    pts = make_structured(seed=1)
    d0 = desc_of(pts)
    T = np_se3.from_rt(np_se3.euler_to_matrix(np.array([0.0, 0.0, 1.3])),
                       np.array([25.0, -14.0, 0.4]))
    pts2 = (pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    d1 = desc_of(pts2)
    score = float(m2dp.match_descriptors(jnp.asarray(d0), jnp.asarray(d1)))
    assert score > 0.95, score


def test_same_cloud_perfect_match():
    pts = make_structured(seed=2)
    d = desc_of(pts)
    score = float(m2dp.match_descriptors(jnp.asarray(d), jnp.asarray(d)))
    assert score > 0.999


def test_different_scenes_low_match():
    d0 = desc_of(make_structured(seed=3))
    rng = np.random.default_rng(4)
    # a very different scene: scattered blob
    d1 = desc_of(rng.uniform(-3, 3, size=(2000, 3)).astype(np.float32))
    score = float(m2dp.match_descriptors(jnp.asarray(d0), jnp.asarray(d1)))
    same = float(m2dp.match_descriptors(jnp.asarray(d0), jnp.asarray(d0)))
    assert score < same - 0.05


def test_match_many():
    pts = make_structured(seed=5)
    d = jnp.asarray(desc_of(pts))
    bank = jnp.stack([d, d * 0.5 + 0.01, jnp.asarray(
        desc_of(make_structured(seed=6)))])
    scores = np.asarray(m2dp.match_many(d, bank))
    assert scores.shape == (3,)
    assert scores[0] > 0.999
