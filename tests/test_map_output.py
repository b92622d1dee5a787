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


def _tiny_run(out, **opt_overrides):
    scans, _gt = synthetic.make_sequence(
        n_scans=8, seed=0, trajectory="straight", step=0.5,
        max_points=3000, max_range=30.0)
    opts = MapBuilderOptions(
        front_end=FrontEndOptions(scan_capacity=4096, nn_tile=512,
                                  max_iteration=25, target_leaf_size=4,
                                  motion_compensation=False,
                                  use_average=False),
        submap=SubmapOptions(frame_count=2),
        submap_capacity=8192,
        export_file_path=str(out),
        mrvm_settings=MrvmSettings(max_ray_steps=64),
    )
    for k, v in opt_overrides.items():
        if k == "mrvm_settings":
            opts.mrvm_settings = v
        else:
            setattr(opts, k, v)
    mb = MapBuilder(opts)
    for i, pts in enumerate(scans):
        mb.insert_pointcloud(i * 0.1, pts)
    mb.finish()
    return mb


def test_output_rgb(tmp_path):
    """output_rgb writes an XYZRGB static map with r=g=b=intensity
    (multi_resolution_voxel_map.h:57, OutputToPointCloud cc:187-233)."""
    _tiny_run(tmp_path, mrvm_settings=MrvmSettings(
        max_ray_steps=64, output_rgb=True))
    path = os.path.join(str(tmp_path), "static_map.pcd")
    assert os.path.exists(path)
    with open(path, "rb") as f:
        header = f.read(200).decode(errors="replace")
    assert "FIELDS x y z rgb" in header
    # packed colors must not be near-black: 0..1 intensities are rescaled
    # to 0..255 and boosted x1.4 (multi_resolution_voxel_map.cc:181-186)
    rec = pcd_io.read_pcd(path)
    packed = np.ascontiguousarray(rec[:, 3]).view(np.uint32)
    grey = (packed >> 16) & 0xFF
    assert grey.max() > 8, f"RGB map is near-black (max={grey.max()})"
    # r == g == b (grayscale-from-intensity)
    assert np.array_equal(grey, (packed >> 8) & 0xFF)
    assert np.array_equal(grey, packed & 0xFF)


def test_separate_output(tmp_path):
    """separate_output splits the combined + MRVM maps every
    separate_step submaps (map_builder.cc:857-891)."""
    mb = _tiny_run(tmp_path, separate_output=True, separate_step=2)
    n_sub = len(mb.trajectory)
    assert n_sub >= 3
    parts = [f for f in os.listdir(str(tmp_path))
             if f.startswith("part_map_")]
    static_parts = [f for f in os.listdir(str(tmp_path))
                    if f.startswith("static_part_map_")]
    assert len(parts) >= 2, parts
    assert static_parts, static_parts
    # no monolithic outputs in separate mode
    assert not os.path.exists(os.path.join(str(tmp_path), "whole_map.pcd"))
    total = sum(len(pcd_io.read_pcd(os.path.join(str(tmp_path), f)))
                for f in parts)
    assert total > 1000


def test_show_callbacks(tmp_path):
    """SetShow{Map,Submap,Path,Edge}Function parity
    (map_builder.h:139-162): observers fire as submaps complete."""
    seen = {"map": 0, "submap": 0, "path": 0, "edge": 0}
    sizes = []

    scans, _gt = synthetic.make_sequence(
        n_scans=8, seed=0, trajectory="straight", step=0.5,
        max_points=3000, max_range=30.0)
    opts = MapBuilderOptions(
        front_end=FrontEndOptions(scan_capacity=4096, nn_tile=512,
                                  max_iteration=25, target_leaf_size=4,
                                  motion_compensation=False,
                                  use_average=False),
        submap=SubmapOptions(frame_count=2),
        submap_capacity=8192, export_file_path=str(tmp_path),
        output_mrvm=False, output_direct_combined_map=False)
    mb = MapBuilder(opts)
    mb.set_show_map_function(
        lambda pts: (seen.__setitem__("map", seen["map"] + 1),
                     sizes.append(len(pts))))
    mb.set_show_submap_function(
        lambda pts: seen.__setitem__("submap", seen["submap"] + 1))
    mb.set_show_path_function(
        lambda poses: seen.__setitem__("path", seen["path"] + 1))
    mb.set_show_edge_function(
        lambda edges: seen.__setitem__("edge", seen["edge"] + 1))
    for i, pts in enumerate(scans):
        mb.insert_pointcloud(i * 0.1, pts)
    mb.finish()
    assert seen["submap"] >= 2
    assert seen["path"] >= 2
    assert seen["edge"] >= 2
    assert seen["map"] >= 1 and sizes[-1] > 1000


def test_pcd_to_las_roundtrip(tmp_path):
    """pcd_to_las tool (tools/pcd_to_las.cc role) — LAS 1.2 roundtrip."""
    from staticmapping_tpu import tools
    from staticmapping_tpu.io import las as las_io
    rng = np.random.default_rng(0)
    pts = np.column_stack([rng.uniform(-50, 50, (500, 3)),
                           rng.uniform(0, 1, (500, 1))]).astype(np.float32)
    pcd = os.path.join(str(tmp_path), "in.pcd")
    las = os.path.join(str(tmp_path), "out.las")
    pcd_io.write_pcd(pcd, pts)
    assert tools.main(["pcd_to_las", pcd, las]) == 0
    back = las_io.read_las(las)
    assert back.shape == pts.shape
    np.testing.assert_allclose(back[:, :3], pts[:, :3], atol=2e-3)
    np.testing.assert_allclose(back[:, 3], pts[:, 3], atol=1e-4)
