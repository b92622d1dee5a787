"""Back-end e2e: square loop → loop detection → pose-graph correction."""
import numpy as np
import pytest

from staticmapping_tpu.backend.loop_detector import LoopDetectorSettings
from staticmapping_tpu.backend.optimizer import IncrementalOptimizer, OptimizerOptions
from staticmapping_tpu.builder.frame import SubmapOptions
from staticmapping_tpu.builder.frontend import FrontEndOptions
from staticmapping_tpu.builder.map_builder import MapBuilder, MapBuilderOptions
from staticmapping_tpu.io import kitti as kitti_io, synthetic


@pytest.fixture(scope="module")
def loop_run():
    scans, gt = synthetic.make_sequence(
        n_scans=0, seed=11, trajectory="square", step=1.0, max_points=8000,
        max_range=30.0)
    loop_settings = LoopDetectorSettings(
        loop_ignore_threshold=8,
        max_close_loop_distance=5.0,
        trying_detect_loop_count=1,
        use_descriptor=False,
        nn_tile=512,
        normal_leaf_size=4,
        accept_scan_match_score=0.45,
    )
    backend = IncrementalOptimizer(OptimizerOptions(),
                                   loop_settings=loop_settings)
    opts = MapBuilderOptions(
        front_end=FrontEndOptions(scan_capacity=8192, nn_tile=512,
                                  max_iteration=40,
                                  motion_compensation=False,
                                  use_average=False,
                                  target_leaf_size=4),
        submap=SubmapOptions(frame_count=2),
        submap_capacity=16384,
        submap_matcher_leaf_size=4,
    )
    mb = MapBuilder(opts, backend=backend)
    for i, pts in enumerate(scans):
        mb.insert_pointcloud(i * 0.1, pts)
    mb.options.output_kitti_pose = False
    mb.finish()
    return mb, backend, gt


def test_loop_edges_found(loop_run):
    mb, backend, gt = loop_run
    assert backend.loop_edge_count > 0, "no loop closures detected"


def test_trajectory_consistency_after_optimization(loop_run):
    mb, backend, gt = loop_run
    # the revisited start: last submaps should be near the first ones
    first = mb.trajectory[0].global_pose[:3, 3]
    last = mb.trajectory[-1].global_pose[:3, 3]
    gt_first = gt[0][:3, 3]
    gt_last = gt[len(gt) - 1][:3, 3]
    gt_gap = np.linalg.norm(gt_last - gt_first)
    est_gap = np.linalg.norm(last - first)
    # optimized gap should be within 1 m of the true gap
    assert abs(est_gap - gt_gap) < 1.0, (est_gap, gt_gap)


def test_frame_ate_reasonable(loop_run):
    mb, backend, gt = loop_run
    frames = [f for s in mb.trajectory for f in s.frames]
    est = np.stack([f.global_pose for f in frames])
    idx = [min(int(round(f.stamp / 0.1)), len(gt) - 1) for f in frames]
    gt_sel = np.stack([np.linalg.inv(gt[0]) @ gt[i] for i in idx])
    ate = kitti_io.ate_rmse(est, gt_sel, align=True)
    assert ate < 1.0, f"ATE {ate}"


def test_submap_pair_scores(loop_run):
    mb, backend, gt = loop_run
    scores = [s.match_score_to_previous for s in mb.trajectory.submaps[1:]
              if s.full]
    assert len(scores) > 10
    # most consecutive submaps should register well
    assert np.mean(np.asarray(scores) > 0.5) > 0.8
