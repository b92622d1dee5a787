"""Matcher factory + GICP + NdtWithGicp + IcpPM tests
(reference: registrators/interface.cc:139-173 factory semantics; each
matcher must recover a known transform — the reference never tested these,
README.md:203-206, so this exceeds its coverage)."""
import numpy as np
import jax.numpy as jnp
import pytest

from staticmapping_tpu.common import np_se3
from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.registration import (
    Gicp, IcpFast, IcpPointMatcher, Ndt, NdtWithGicp, create_matcher,
    compute_point_normals)


def make_scene(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    per = n // 4
    floor = np.column_stack([rng.uniform(-10, 10, per),
                             rng.uniform(-10, 10, per),
                             0.02 * rng.standard_normal(per)])
    w1 = np.column_stack([np.full(per, 5.0) + 0.02 * rng.standard_normal(per),
                          rng.uniform(-10, 10, per), rng.uniform(0, 4, per)])
    w2 = np.column_stack([rng.uniform(-10, 10, per),
                          np.full(per, -4.0) + 0.02 * rng.standard_normal(per),
                          rng.uniform(0, 4, per)])
    x = rng.uniform(-10, 10, per)
    roof = np.column_stack([x, rng.uniform(-10, 10, per),
                            4.0 + 0.15 * x + 0.02 * rng.standard_normal(per)])
    return np.vstack([floor, w1, w2, roof]).astype(np.float32)


def shifted_pair(seed=0):
    pts = make_scene(seed=seed)
    true_T = np_se3.from_rt(
        np_se3.euler_to_matrix(np.array([0.0, 0.01, 0.03])),
        np.array([0.25, -0.15, 0.05]))
    src_pts = ((pts - true_T[:3, 3].astype(np.float32))
               @ true_T[:3, :3].astype(np.float32))
    target = cloud_lib.from_numpy(pts, capacity=4096)
    source = cloud_lib.from_numpy(src_pts, capacity=4096)
    return source, target, true_T


def _assert_recovers(matcher, tol=5e-2, seed=0):
    source, target, true_T = shifted_pair(seed=seed)
    matcher.set_input_target(target)
    matcher.set_input_source(source)
    T, score = matcher.align(jnp.eye(4, dtype=jnp.float32))
    err = np.asarray(T, dtype=np.float64) @ np_se3.inverse(true_T) - np.eye(4)
    assert np.abs(err[:3, :]).max() < tol, \
        f"{type(matcher).__name__}: T=\n{np.asarray(T)}\nvs\n{true_T}"
    assert float(score) > 0.3


def test_factory_types():
    assert isinstance(create_matcher(1), IcpPointMatcher)
    assert isinstance(create_matcher(3), NdtWithGicp)
    assert isinstance(create_matcher(5), Ndt)
    assert isinstance(create_matcher(6), IcpFast)
    assert isinstance(create_matcher("icp_fast"), IcpFast)
    with pytest.raises(ValueError):
        create_matcher(2)          # libicp deprecated → FATAL in reference
    with pytest.raises(ValueError):
        create_matcher(4)          # lego-loam deprecated
    with pytest.raises(ValueError):
        create_matcher(99)
    with pytest.raises(ValueError):
        create_matcher(6, {"no_such_option": 1})


def test_factory_applies_options():
    m = create_matcher(6, {"max_iteration": 42, "dist_outlier_ratio": 0.8})
    assert m.max_iteration == 42 and m.dist_outlier_ratio == 0.8
    n = create_matcher(5, {"resolution": 2.0})
    assert n.resolution == 2.0


def test_gicp_point_normals():
    pts = make_scene()
    cloud = cloud_lib.from_numpy(pts, capacity=4096)
    gc = compute_point_normals(cloud, k=16)
    nm = np.asarray(gc.normals)
    mask = np.asarray(gc.mask)
    assert mask.sum() > 3000
    # floor points (first quarter) should have ±z normals
    floor_n = nm[:1024][mask[:1024]]
    assert np.abs(floor_n[:, 2]).mean() > 0.9


def test_gicp_recovers_transform():
    _assert_recovers(Gicp(max_iteration=50), tol=5e-2)


def test_ndt_gicp_chain_recovers_transform():
    _assert_recovers(NdtWithGicp(voxel_resolution=0.3), tol=5e-2, seed=3)


def test_icp_pm_recovers_transform():
    _assert_recovers(IcpPointMatcher(), tol=5e-2, seed=5)
