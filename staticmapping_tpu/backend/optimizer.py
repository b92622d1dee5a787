"""Incremental pose-graph optimizer — the GTSAM-iSAM2 replacement.

API parity with ``back_end::IsamOptimizer`` (back_end/isam_optimizer.{h,cc}):
``add_submap`` ≈ AddFrame (cc:196-293), ``run_final_optimization`` ≈
RunFinalOptimazation (cc:351-368). Internals differ by design: instead of an
incremental Bayes tree we re-solve the full (sparse) pose graph with the
batched TPU Gauss-Newton of :mod:`pose_graph` — cheap on MXU at these sizes,
and only necessary when loop closures arrive (a between-only chain is
already exactly consistent, so per-submap updates are pose chaining).

Noise model parity (isam_optimizer.cc:78-94), converted to (trans, rot)
order: frame match sigmas (0.15,0.15,0.15, 0.1,0.1,0.1); loop closures the
same; prior handled as a hard gauge on node 0.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..common import np_se3
from ..descriptor import m2dp
from .loop_detector import LoopDetector, LoopDetectorSettings
from .pose_graph import PoseGraph

# (trans, rot) sigma order — see module docstring
FRAME_MATCH_SIGMAS = (0.15, 0.15, 0.15, 0.1, 0.1, 0.1)
LOOP_CLOSURE_SIGMAS = (0.15, 0.15, 0.15, 0.1, 0.1, 0.1)


@dataclasses.dataclass
class OptimizerOptions:
    """IsamOptimizerOptions parity (isam_optimizer.h:59-67)."""

    use_gps: bool = False
    use_odom: bool = False
    enable_extrinsic_calib: bool = False
    gps_factor_init_num: int = 20
    gps_factor_init_angle_rad: float = 0.5
    gps_factor_sample_step: int = 1
    gn_iterations: int = 8


class IncrementalOptimizer:
    def __init__(self, options: OptimizerOptions = None,
                 loop_settings: LoopDetectorSettings = None):
        self.options = options or OptimizerOptions()
        self.loop_detector = LoopDetector(loop_settings)
        self.graph = PoseGraph()
        self.loop_edge_count = 0
        self._dirty = False       # loop edges pending a solve

    # ------------------------------------------------------------------
    def add_submap(self, trajectory, submap) -> None:
        """AddFrame parity: descriptor, loop detection, factors, update."""
        # descriptor for the loop detector's M2DP gate
        if (self.loop_detector.settings.use_descriptor
                and submap.descriptor is None):
            submap.descriptor = np.asarray(
                m2dp.compute_descriptor(submap.cloud))

        idx = self.graph.add_node()
        assert idx == submap.id == len(self.loop_detector.frames)

        if idx > 0:
            prev = trajectory[idx - 1]
            # the PREVIOUS submap stores the matched transform to this one
            # (SetMatchedTransformedToNext, map_builder.cc:436-444)
            T_prev_cur = prev.match_transform_to_next
            if T_prev_cur is None:
                # fall back to odometry chaining
                T_prev_cur = np_se3.inverse(prev.global_pose) @ \
                    submap.global_pose
            self.graph.add_between(idx - 1, idx, T_prev_cur,
                                   FRAME_MATCH_SIGMAS)
            # chain the global pose from the matched transform
            # (ConnectAllSubmap, map_builder.cc:484-489)
            submap.global_pose = np_se3.normalize_rotation(
                prev.global_pose @ T_prev_cur)

        result = self.loop_detector.add_frame(submap, do_loop_detect=True)

        if result.close_succeed:
            for edge in result.edges:
                self.graph.add_between(edge.target_index, edge.source_index,
                                       edge.transform, LOOP_CLOSURE_SIGMAS)
                self.loop_edge_count += 1
            self._dirty = True
            self._solve(trajectory)

    # ------------------------------------------------------------------
    def _solve(self, trajectory) -> None:
        poses = np.stack([s.global_pose for s in trajectory
                          if s.id < self.graph.num_nodes])
        out = self.graph.optimize(poses,
                                  num_iters=self.options.gn_iterations)
        for s, T in zip(trajectory, out):
            s.global_pose = T
        self._dirty = False

    def run_final_optimization(self, trajectory) -> None:
        """RunFinalOptimazation parity (isam_optimizer.cc:351-368)."""
        if self.graph.num_nodes >= 2 and len(self.graph.factors) > 0:
            self._solve(trajectory)
