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


# ---------------------------------------------------------------------------
# GroundRemoval2 (filters/ground_removal2.py) and RangeImage
# (filters/range_image.py)
# ---------------------------------------------------------------------------

def _ground_scene(n_g=4000, n_b=800, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(2, 40, n_g)
    th = rng.uniform(0, 2 * np.pi, n_g)
    ground = np.column_stack([r * np.cos(th), r * np.sin(th),
                              rng.normal(0, 0.01, n_g)])
    box = np.column_stack([rng.uniform(9, 11, n_b),
                           rng.uniform(-1, 1, n_b),
                           rng.uniform(0.3, 2.0, n_b)])
    pts = np.vstack([ground, box]).astype(np.float32)
    return cloud_lib.from_numpy(pts, capacity=8192), n_g, n_b


def test_ground_removal2_removes_ground_keeps_objects():
    from staticmapping_tpu.filters import GroundRemoval2Filter
    pc, n_g, n_b = _ground_scene()
    f = GroundRemoval2Filter(start_ground_height=0.0, max_start_height=0.3)
    gm = np.asarray(f.ground_mask(pc))
    # most of the flat ground is labeled ground, nothing on the box is
    assert gm[:n_g].sum() > 0.9 * n_g
    assert gm[n_g:n_g + n_b].sum() == 0
    out = f(pc)
    kept = int(np.asarray(out.mask).sum())
    assert kept == int(np.asarray(pc.mask).sum()) - int(gm.sum())


def test_ground_removal2_config_names():
    from staticmapping_tpu.filters.filters import create_filter
    f = create_filter("GroundRemoval2", {
        "r_min": 0.1, "start_ground_height": -0.35,
        "long_line_threshold": 10, "max_slope": 0.12,
        "max_error": 0.1, "max_dist_to_line": 0.10,
        "max_start_height": 0.6, "thread_num": 4})
    assert f.r_min == 0.1 and f.thread_num == 4


def test_range_image_one_point_per_pixel():
    from staticmapping_tpu.filters import RangeImageFilter
    pc, _, _ = _ground_scene()
    f = RangeImageFilter(vertical_line_num=40, horizontal_line_num=900,
                         btm_angle=-30, top_angle=30)
    out = f(pc)
    kept = int(np.asarray(out.mask).sum())
    img = f.to_image(pc)
    assert kept == int((img > 0).sum())
    assert kept < int(np.asarray(pc.mask).sum())


def test_range_image_depth_cluster_separates_objects():
    from staticmapping_tpu.filters import RangeImageFilter
    # two distinct walls at different azimuths → different clusters
    rng = np.random.default_rng(1)
    wall1 = np.column_stack([np.full(600, 10.0), rng.uniform(-2, 2, 600),
                             rng.uniform(-1, 1, 600)])
    wall2 = np.column_stack([-np.full(600, 8.0), rng.uniform(-2, 2, 600),
                             rng.uniform(-1, 1, 600)])
    pc = cloud_lib.from_numpy(
        np.vstack([wall1, wall2]).astype(np.float32), capacity=2048)
    f = RangeImageFilter(vertical_line_num=40, horizontal_line_num=900,
                         btm_angle=-30, top_angle=30)
    labels = np.asarray(f.depth_cluster(pc))
    l1 = labels[:600][labels[:600] > 0]
    l2 = labels[600:1200][labels[600:1200] > 0]
    assert len(l1) and len(l2)
    assert set(np.unique(l1)).isdisjoint(set(np.unique(l2)))


def test_plane_detector_and_sampler():
    from staticmapping_tpu.filters import (PlaneDetector,
                                           RandomSampleWithPlaneDetectFilter)
    rng = np.random.default_rng(0)
    n_g, n_s = 8000, 1500
    g = np.column_stack([rng.uniform(-10, 10, n_g), rng.uniform(-10, 10, n_g),
                         rng.normal(-1.7, 0.02, n_g)])
    s = rng.uniform(-10, 10, (n_s, 3))
    s[:, 2] = rng.uniform(0.5, 5.0, n_s)
    pts = np.vstack([g, s]).astype(np.float32)
    pc = cloud_lib.from_numpy(pts, capacity=16384)
    det = PlaneDetector(leaf_size=1.6, min_point_num_in_voxel=8)
    m = np.asarray(det.plane_mask(pc))
    assert m[:n_g].sum() > 0.95 * n_g           # flat ground is plane
    assert m[n_g:n_g + n_s].sum() < 0.02 * n_s  # scatter is not

    f = RandomSampleWithPlaneDetectFilter(
        sampling_rate=0.2, leaf_size=1.6, min_point_num_in_voxel=8)
    out = f(pc)
    keep = np.asarray(out.mask)
    # plane points all kept; scatter sampled near the rate
    assert keep[:n_g][m[:n_g]].all()
    scatter_rate = keep[n_g:n_g + n_s].mean()
    assert 0.1 < scatter_rate < 0.35, scatter_rate
