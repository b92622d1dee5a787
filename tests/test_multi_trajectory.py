"""Multi-trajectory merge (builder/multi_trajectory.py)."""
import numpy as np
import pytest

from staticmapping_tpu.builder.frame import Frame, Submap, SubmapOptions, Trajectory
from staticmapping_tpu.builder.multi_trajectory import (
    MultiTrajectoryMapBuilder, MultiTrajectoryOptions)
from staticmapping_tpu.common import np_se3
from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.io import synthetic


def _make_trajectory(world, poses, traj_id, pose_error=None,
                     capacity=8192):
    """One submap per pose, cloud rendered from the world at the TRUE
    pose; stored global_pose optionally corrupted by ``pose_error``."""
    traj = Trajectory(traj_id)
    rng = np.random.default_rng(traj_id)
    for k, T in enumerate(poses):
        pts = synthetic.render_scan(world, T, max_range=40.0,
                                    max_points=6000, seed=traj_id * 100 + k)
        s = Submap(k, SubmapOptions(frame_count=1), capacity=capacity)
        s.insert_frame(Frame(
            stamp=float(k), cloud=cloud_lib.from_numpy(pts, capacity=capacity),
            global_pose=T.copy()))
        stored = T if pose_error is None else pose_error @ T
        s.global_pose = np_se3.normalize_rotation(stored)
        if k + 1 < len(poses):
            s.match_transform_to_next = np_se3.inverse(poses[k]) @ poses[k + 1]
        traj.append(s)
    return traj


def test_merge_recovers_inter_trajectory_offset():
    """Two passes over the same street; the second trajectory's poses are
    offset by a 1.2 m / 3° initialization error.  After merge, the cross
    edges must pull it back onto the first pass."""
    world = synthetic.make_world(seed=2)
    line = [np_se3.from_rt(np.eye(3), [4.0 * k, 0.0, 0.0])
            for k in range(6)]
    err = np_se3.from_rt(np_se3.euler_to_matrix([0, 0, 0.05]),
                         [1.0, -0.7, 0.0])
    t0 = _make_trajectory(world, line, 0)
    t1 = _make_trajectory(world, line, 1, pose_error=err)

    before = np.mean([np.linalg.norm(
        t1[k].global_pose[:3, 3] - line[k][:3, 3]) for k in range(len(line))])
    assert before > 0.8   # the injected error is visible

    mt = MultiTrajectoryMapBuilder(MultiTrajectoryOptions(
        max_distance=10.0, use_descriptor=False, accept_match_score=0.3,  # sparse synthetic ground -> large mean NN dist
        normal_leaf_size=4, nn_tile=512, max_pairs=12))
    mt.add_trajectory(t0)
    mt.add_trajectory(t1)
    n_edges = mt.merge()
    assert n_edges >= 3, n_edges

    after = np.mean([np.linalg.norm(
        t1[k].global_pose[:3, 3] - line[k][:3, 3]) for k in range(len(line))])
    # base trajectory stays anchored
    base_move = np.mean([np.linalg.norm(
        t0[k].global_pose[:3, 3] - line[k][:3, 3]) for k in range(len(line))])
    assert base_move < 0.2, base_move
    assert after < 0.3 * before, (before, after)


def test_node_id_layout():
    mt = MultiTrajectoryMapBuilder()
    ta = Trajectory(0)
    tb = Trajectory(1)
    for k in range(3):
        ta.append(Submap(k, SubmapOptions(), capacity=1))
    for k in range(2):
        tb.append(Submap(k, SubmapOptions(), capacity=1))
    mt.add_trajectory(ta)
    mt.add_trajectory(tb)
    assert mt.node_id(0, 2) == 2
    assert mt.node_id(1, 0) == 3
    assert mt.node_id(1, 1) == 4
