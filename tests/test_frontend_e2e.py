"""End-to-end slice test: synthetic scans → odometry → submaps → KITTI poses.
(SURVEY §7.2 step 4 — the ONE-model-running milestone.)"""
import os

import numpy as np
import pytest

from staticmapping_tpu.builder.frame import SubmapOptions
from staticmapping_tpu.builder.frontend import FrontEndOptions, MotionFilterOptions
from staticmapping_tpu.builder.map_builder import MapBuilder, MapBuilderOptions
from staticmapping_tpu.io import kitti as kitti_io
from staticmapping_tpu.io import synthetic


def small_options():
    fe = FrontEndOptions(scan_capacity=8192, nn_tile=512, max_iteration=40)
    return MapBuilderOptions(front_end=fe,
                             submap=SubmapOptions(frame_count=2),
                             submap_capacity=16384)


def run_sequence(n_scans, trajectory="straight", step=0.5, yaw_rate=0.0,
                 seed=0):
    scans, gt = synthetic.make_sequence(
        n_scans=n_scans, seed=seed, trajectory=trajectory, step=step,
        yaw_rate=yaw_rate, max_points=6000)
    mb = MapBuilder(small_options())
    for i, pts in enumerate(scans):
        mb.insert_pointcloud(i * 0.1, pts)
    return mb, gt


def test_straight_odometry_accuracy(tmp_path):
    n = 25
    mb, gt = run_sequence(n, step=0.5)
    mb.options.export_file_path = str(tmp_path)
    mb.finish()

    # front-end pose error vs ground truth (gt starts at pose[0] != I;
    # express both relative to their first pose)
    frames = [f for s in mb.trajectory for f in s.frames]
    assert len(frames) >= n // 2, f"too few keyframes: {len(frames)}"
    est = np.stack([f.global_pose for f in frames])
    # ground truth for frame i is gt pose at its scan stamp index
    stamps = [f.stamp for f in frames]
    idx = [int(round(s / 0.1)) for s in stamps]
    gt_sel = np.stack([np.linalg.inv(gt[0]) @ gt[i] for i in idx])
    ate = kitti_io.ate_rmse(est, gt_sel, align=True)
    # 12 m travelled; ICP odometry should stay well under 0.3 m RMSE
    assert ate < 0.3, f"ATE {ate}"

    # kitti_pose.txt written and parseable
    path = os.path.join(str(tmp_path), "kitti_pose.txt")
    assert os.path.exists(path)
    poses = kitti_io.read_poses(path)
    assert poses.shape[1:] == (4, 4)
    assert len(poses) == len(mb.trajectory)


def test_turning_odometry():
    mb, gt = run_sequence(30, step=0.5, yaw_rate=0.04, seed=3)
    frames = [f for s in mb.trajectory for f in s.frames]
    est = np.stack([f.global_pose for f in frames])
    idx = [int(round(f.stamp / 0.1)) for f in frames]
    gt_sel = np.stack([np.linalg.inv(gt[0]) @ gt[i] for i in idx])
    ate = kitti_io.ate_rmse(est, gt_sel, align=True)
    assert ate < 0.4, f"ATE {ate}"
    # yaw must actually accumulate (we really turned)
    import staticmapping_tpu.common.np_se3 as np_se3
    yaw = np_se3.matrix_to_euler(est[-1][:3, :3])[2]
    gt_yaw = np_se3.matrix_to_euler(gt_sel[-1][:3, :3])[2]
    assert abs(yaw - gt_yaw) < 0.1


def test_motion_filter_keyframe_rate():
    # tiny steps below the motion filter → few keyframes
    mb, _ = run_sequence(10, step=0.05, seed=5)
    frames = [f for s in mb.trajectory for f in s.frames]
    # 0.05 m / scan < 0.35 m threshold → only the first frame + every ~7th
    assert len(frames) <= 3


def test_submap_grouping():
    mb, _ = run_sequence(20, step=0.5, seed=6)
    for s in mb.trajectory.submaps[:-1]:
        assert s.full
        assert s.cloud is not None
        assert int(s.cloud.num_valid()) > 0
