"""Config system (config.py), CLI plumbing, URDF extrinsics, tools."""
import os

import numpy as np
import pytest

from staticmapping_tpu import config as config_lib
from staticmapping_tpu.common import np_se3


CFG = os.path.join(os.path.dirname(__file__), "..", "config",
                   "lidar_only_kitti.xml")


def test_load_reference_vocabulary():
    cfg = config_lib.load_config(CFG)
    mb = cfg.map_builder
    assert mb.front_end.motion_filter.translation_range == 0.5
    assert mb.front_end.matcher_type == 6
    assert mb.front_end.max_iteration == 100
    assert mb.submap.frame_count == 2
    assert mb.submap.enable_voxel_filter is True
    assert mb.mrvm_settings.prob_threshold == 0.57
    assert mb.mrvm_settings.z_offset == 1.2
    assert cfg.loop_detector.m2dp_match_score == 0.98
    assert cfg.loop_detector.loop_ignore_threshold == 50
    assert cfg.submap_matcher.accepted_min_score == 0.7
    assert [n for n, _ in cfg.filters] == ["Range", "AxisRange",
                                           "RandomSampler"]


def test_defaults_without_file():
    cfg = config_lib.load_config(None)
    assert cfg.scan_matcher.type == 6
    assert cfg.map_builder.submap.frame_count == 5


def test_check_options_rejects_bad_mrvm():
    cfg = config_lib.load_config(None)
    cfg.map_builder.mrvm_settings.hit_prob = 0.4
    with pytest.raises(AssertionError):
        config_lib.check_options(cfg)


def test_build_map_builder_wires_chain_and_backend():
    cfg = config_lib.load_config(CFG)
    mb = config_lib.build_map_builder(cfg)
    assert mb.backend is not None
    assert mb.front_end.filter_chain is not None
    assert len(mb.front_end.filter_chain.filters) == 3


def test_urdf_extrinsics_lookup():
    from staticmapping_tpu.io.urdf import (lookup_transform,
                                           read_fixed_transforms)
    urdf = """<robot name="car">
      <joint name="j1" type="fixed">
        <parent link="base_link"/><child link="velodyne"/>
        <origin xyz="1.2 0 1.8" rpy="0 0 0.1"/>
      </joint>
      <joint name="j2" type="fixed">
        <parent link="velodyne"/><child link="imu"/>
        <origin xyz="0 0 -0.5" rpy="0 0 0"/>
      </joint>
      <joint name="jr" type="revolute">
        <parent link="base_link"/><child link="wheel"/>
        <origin xyz="9 9 9"/>
      </joint>
    </robot>"""
    tfs = read_fixed_transforms(urdf)
    assert ("base_link", "velodyne") in tfs
    assert ("base_link", "wheel") not in tfs      # non-fixed skipped
    T = lookup_transform(tfs, "base_link", "velodyne")
    np.testing.assert_allclose(T[:3, 3], [1.2, 0, 1.8], atol=1e-12)
    # chained lookup base_link -> imu through velodyne
    T2 = lookup_transform(tfs, "base_link", "imu")
    expected = tfs[("base_link", "velodyne")] @ tfs[("velodyne", "imu")]
    np.testing.assert_allclose(T2, expected, atol=1e-12)
    # reverse direction
    T3 = lookup_transform(tfs, "imu", "base_link")
    np.testing.assert_allclose(T3, np_se3.inverse(expected), atol=1e-9)
    assert lookup_transform(tfs, "base_link", "nonexistent") is None


def test_rpe_metric():
    from staticmapping_tpu.io.kitti import rpe
    n = 10
    gt = []
    for k in range(n):
        T = np.eye(4)
        T[0, 3] = k * 1.0
        gt.append(T)
    est = [T.copy() for T in gt]
    for T in est[5:]:
        T[0, 3] += 0.5         # constant offset after frame 5
    t_err, r_err = rpe(np.stack(est), np.stack(gt), delta=1)
    # only ONE relative step (4→5) differs, by 0.5
    assert abs(t_err - np.sqrt(0.25 / (n - 1))) < 1e-9
    assert r_err < 1e-9


def test_tools_path_statistic(tmp_path, capsys):
    from staticmapping_tpu.tools import path_statistic
    rows = np.column_stack([
        np.arange(5) * 0.1, np.arange(5) * 2.0, np.zeros(5), np.zeros(5),
        np.ones(5), np.zeros(5), np.zeros(5), np.zeros(5)])
    p = tmp_path / "path.csv"
    np.savetxt(p, rows)
    assert path_statistic(str(p)) == 0
    outp = capsys.readouterr().out
    assert "length:       8.00 m" in outp
