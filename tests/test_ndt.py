"""NDT registration tests — "type 5" matcher parity
(reference: registrators/ndt.cc:38-64 wraps pclomp NDT; here the voxel
Gaussian field + Gauss-Newton optimizer must recover a known transform)."""
import numpy as np
import jax.numpy as jnp
import pytest

from staticmapping_tpu.common import np_se3
from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.registration.ndt import (Ndt, align_ndt, build_ndt_map)


def make_structured_cloud(n=4096, seed=0):
    """Floor + two walls + sloped roof — full 6-DoF constraint."""
    rng = np.random.default_rng(seed)
    per = n // 4
    floor = np.column_stack([rng.uniform(-10, 10, per),
                             rng.uniform(-10, 10, per),
                             0.02 * rng.standard_normal(per)])
    w1 = np.column_stack([np.full(per, 5.0) + 0.02 * rng.standard_normal(per),
                          rng.uniform(-10, 10, per),
                          rng.uniform(0, 4, per)])
    w2 = np.column_stack([rng.uniform(-10, 10, per),
                          np.full(per, -4.0) + 0.02 * rng.standard_normal(per),
                          rng.uniform(0, 4, per)])
    x = rng.uniform(-10, 10, per)
    roof = np.column_stack([x, rng.uniform(-10, 10, per),
                            4.0 + 0.15 * x + 0.02 * rng.standard_normal(per)])
    return np.vstack([floor, w1, w2, roof]).astype(np.float32)


def test_build_ndt_map_runs():
    pts = make_structured_cloud()
    target = cloud_lib.from_numpy(pts, capacity=4096)
    m = build_ndt_map(target, 1.0)
    n_valid = int(jnp.sum(m.valid))
    assert n_valid > 50
    # valid voxel means must lie inside the cloud bbox
    means = np.asarray(m.mean)[np.asarray(m.valid)]
    assert means[:, 0].min() > -11 and means[:, 0].max() < 11
    # keys sorted ascending so searchsorted lookups work
    keys = np.asarray(m.key)
    assert (np.diff(keys.astype(np.int64)) >= 0).all()


def test_ndt_recovers_transform():
    pts = make_structured_cloud()
    target = cloud_lib.from_numpy(pts, capacity=4096)
    true_T = np_se3.from_rt(
        np_se3.euler_to_matrix(np.array([0.0, 0.0, 0.03])),
        np.array([0.3, -0.2, 0.05]))
    # source = inverse(true_T)·target points → aligning source onto the
    # target field should recover true_T (same convention as test_icp)
    src_pts = ((pts - true_T[:3, 3].astype(np.float32))
               @ true_T[:3, :3].astype(np.float32))
    source = cloud_lib.from_numpy(src_pts, capacity=4096)

    matcher = Ndt(resolution=1.0)
    matcher.set_input_target(target)
    matcher.set_input_source(source)
    T, score = matcher.align(jnp.eye(4, dtype=jnp.float32))
    err = np.asarray(T, dtype=np.float64) @ np_se3.inverse(true_T) - np.eye(4)
    assert np.abs(err[:3, :]).max() < 3e-2, \
        f"T=\n{np.asarray(T)}\nexpected\n{true_T}"
    assert float(score) > 0.4


def test_ndt_identity_noop():
    pts = make_structured_cloud(seed=2)
    target = cloud_lib.from_numpy(pts, capacity=4096)
    source = cloud_lib.from_numpy(pts, capacity=4096)
    m = build_ndt_map(target, 1.0)
    T, score = align_ndt(source, m, jnp.eye(4, dtype=jnp.float32))
    err = np.asarray(T) - np.eye(4)
    assert np.abs(err[:3, :]).max() < 1e-2
    assert float(score) > 0.5
