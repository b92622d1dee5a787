import numpy as np
import jax.numpy as jnp
import pytest

from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.filters.filters import (
    RangeFilter, AxisRangeFilter, BoundingBoxRemovalFilter,
    RandomSamplerFilter, VoxelGridFilter, StatisticRemovalFilter,
    GroundRemovalFilter, create_filter, FilterChain)


def grid_cloud():
    """The reference's voxel-grid test fixture: 10x10 points at
    x=i*0.1+0.02 (test_filter_voxel_grid.cc:56-64)."""
    pts = []
    for x in range(10):
        for y in range(10):
            pts.append([x * 0.1 + 0.02, y * 0.1 + 0.02, 0.1])
    return cloud_lib.from_numpy(np.array(pts), capacity=128)


def test_voxel_grid_reference_counts():
    # exact count parity with test_filter_voxel_grid.cc:51-99
    pc = grid_cloud()
    assert int(VoxelGridFilter(voxel_size=0.1)(pc).num_valid()) == 100
    assert int(VoxelGridFilter(voxel_size=0.2)(pc).num_valid()) == 36
    assert int(VoxelGridFilter(voxel_size=0.4)(pc).num_valid()) == 9


def test_voxel_grid_centroid():
    pts = np.array([[0.0, 0.0, 0.0], [0.02, 0.02, 0.02], [5.0, 5.0, 5.0]])
    pc = cloud_lib.from_numpy(pts, capacity=16)
    out = VoxelGridFilter(voxel_size=1.0)(pc)
    assert int(out.num_valid()) == 2
    got = np.sort(cloud_lib.to_numpy(out)[:, 0])
    np.testing.assert_allclose(got, [0.01, 5.0], atol=1e-6)


def test_voxel_grid_invalid_config():
    with pytest.raises(ValueError):
        create_filter("VoxelGrid", {"voxel_size": 0.0})


def test_range_filter():
    pts = np.array([[0.5, 0, 0], [5.0, 0, 0], [150.0, 0, 0]])
    pc = cloud_lib.from_numpy(pts, capacity=16)
    out = RangeFilter(min_range=1.0, max_range=100.0)(pc)
    assert int(out.num_valid()) == 1
    np.testing.assert_allclose(cloud_lib.to_numpy(out)[0, :3], [5.0, 0, 0])


def test_axis_range_filter():
    pts = np.array([[0, 0, -2.0], [0, 0, 0.5], [0, 0, 3.0]])
    pc = cloud_lib.from_numpy(pts, capacity=16)
    out = AxisRangeFilter(min=-1.0, max=1.0, axis_index=2)(pc)
    assert int(out.num_valid()) == 1


def test_bounding_box_removal():
    pts = np.array([[0, 0, 0], [0.5, 0.5, 0.5], [5, 5, 5]])
    pc = cloud_lib.from_numpy(pts, capacity=16)
    out = BoundingBoxRemovalFilter(min_x=-1, min_y=-1, min_z=-1,
                                   max_x=1, max_y=1, max_z=1)(pc)
    assert int(out.num_valid()) == 1  # only [5,5,5] survives


def test_random_sampler_rate():
    rng = np.random.default_rng(0)
    pc = cloud_lib.from_numpy(rng.normal(size=(4000, 3)), capacity=4096)
    out = RandomSamplerFilter(sampling_rate=0.5, seed=1)(pc)
    frac = int(out.num_valid()) / 4000
    assert 0.45 < frac < 0.55


def test_statistic_removal():
    rng = np.random.default_rng(1)
    dense = rng.normal(scale=0.2, size=(200, 3))
    outlier = np.array([[50.0, 50.0, 50.0]])
    pc = cloud_lib.from_numpy(np.vstack([dense, outlier]), capacity=256)
    out = StatisticRemovalFilter(point_num_meank=10, std_mul=1.0, tile=256)(pc)
    m = np.asarray(out.mask)
    assert not m[200]  # outlier removed
    assert int(out.num_valid()) > 150


def test_ground_removal():
    rng = np.random.default_rng(2)
    # flat ground plane at z in [0, 0.02], z-index trunc(0.02/0.5)=0 → ground
    ground = np.column_stack([
        rng.uniform(0, 2, size=400), rng.uniform(0, 2, size=400),
        rng.uniform(0.0, 0.02, size=400)])
    # a vertical wall spanning z 0..2 in one voxel column
    wall = np.column_stack([
        np.full(400, 0.25), rng.uniform(0, 0.4, size=400),
        rng.uniform(0.0, 2.0, size=400)])
    pc = cloud_lib.from_numpy(np.vstack([ground, wall]), capacity=1024)
    out = GroundRemovalFilter(min_point_num_in_voxel=3, leaf_size=0.5,
                              height_threshold=0.1)(pc)
    m = np.asarray(out.mask)
    # most ground removed, most wall kept
    assert m[:400].sum() < 100
    assert m[400:800].sum() > 300


def test_factory_by_name():
    f = create_filter("Range", {"min_range": 1.0, "max_range": 10.0})
    assert isinstance(f, RangeFilter)
    assert f.min_range == 1.0
    with pytest.raises(KeyError):
        create_filter("NoSuchFilter")
    with pytest.raises(KeyError):
        create_filter("Range", {"bogus": 1})


def test_chain():
    pts = np.array([[0.5, 0, 0], [5.0, 0, 0], [5.02, 0, 0], [50.0, 0, 0]])
    pc = cloud_lib.from_numpy(pts, capacity=16)
    chain = FilterChain([
        RangeFilter(min_range=1.0, max_range=10.0),
        VoxelGridFilter(voxel_size=1.0),
    ])
    out = chain(pc)
    assert int(out.num_valid()) == 1
    np.testing.assert_allclose(cloud_lib.to_numpy(out)[0, 0], 5.01, atol=1e-4)


def test_filters_preserve_stamps_and_factors():
    # mask-based filters must keep per-point factor intact (reference keeps
    # InnerPointType fields through filters)
    pc = grid_cloud()
    out = RangeFilter(min_range=0.0, max_range=100.0)(pc)
    np.testing.assert_allclose(np.asarray(out.factor), np.asarray(pc.factor))
