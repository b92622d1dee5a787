"""Map output + package checkpoint roundtrip tests."""
import os

import numpy as np
import pytest

from staticmapping_tpu.builder.frame import SubmapOptions
from staticmapping_tpu.builder.frontend import FrontEndOptions
from staticmapping_tpu.builder.map_builder import MapBuilder, MapBuilderOptions
from staticmapping_tpu.builder.map_package import load_trajectory, save_trajectory
from staticmapping_tpu.builder.mrvm import MrvmSettings
from staticmapping_tpu.io import pcd as pcd_io
from staticmapping_tpu.io import synthetic


@pytest.fixture(scope="module")
def finished_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("mapout")
    scans, gt = synthetic.make_sequence(
        n_scans=12, seed=0, trajectory="straight", step=0.5,
        max_points=4000, max_range=30.0)
    opts = MapBuilderOptions(
        front_end=FrontEndOptions(scan_capacity=4096, nn_tile=512,
                                  max_iteration=30, target_leaf_size=4,
                                  motion_compensation=False,
                                  use_average=False),
        submap=SubmapOptions(frame_count=2),
        submap_capacity=8192,
        export_file_path=str(out),
        save_map_package=True,
        mrvm_settings=MrvmSettings(max_ray_steps=128),
    )
    mb = MapBuilder(opts)
    for i, pts in enumerate(scans):
        mb.insert_pointcloud(i * 0.1, pts)
    mb.finish()
    return mb, str(out)


def test_outputs_exist(finished_run):
    mb, out = finished_run
    for name in ("kitti_pose.txt", "path.csv", "static_map.pcd",
                 "whole_map.pcd"):
        assert os.path.exists(os.path.join(out, name)), name


def test_pcd_roundtrip(finished_run):
    mb, out = finished_run
    static = pcd_io.read_pcd(os.path.join(out, "static_map.pcd"))
    whole = pcd_io.read_pcd(os.path.join(out, "whole_map.pcd"))
    assert static.shape[1] == 4 and static.shape[0] > 100
    assert whole.shape[0] > static.shape[0]  # MRVM filters the map
    assert np.isfinite(static).all()


def test_static_map_geometry(finished_run):
    mb, out = finished_run
    static = pcd_io.read_pcd(os.path.join(out, "static_map.pcd"))
    # nothing below the ground plane (world z=0 → map frame z=-1.8)
    assert static[:, 2].min() > -2.2
    # some ground voxels survive (sparse synthetic ground → only re-observed
    # voxels pass the probability filter) and plenty of structure above
    assert (static[:, 2] < -1.5).sum() > 10
    assert (static[:, 2] > 0.0).sum() > 100


def test_package_roundtrip(finished_run):
    mb, out = finished_run
    pkg = os.path.join(out, "map_package")
    assert os.path.exists(os.path.join(pkg, "map.xml"))
    loaded = load_trajectory(pkg)
    assert len(loaded) == len(mb.trajectory)
    for a, b in zip(loaded, mb.trajectory):
        assert a.id == b.id
        np.testing.assert_allclose(a.global_pose, b.global_pose, atol=1e-6)
        if b.cloud is not None:
            assert a.cloud is not None
            assert abs(int(a.cloud.num_valid()) - int(b.cloud.num_valid())) == 0
        assert len(a.frames) == len(b.frames)
