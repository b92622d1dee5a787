"""MapBuilder — the orchestrator.

Host-side parity with the reference's central class
(builder/map_builder.h:122-276): owns the front end, the submap builder, the
trajectory, and (once attached) the pose-graph back end and map output.
The reference's three pipeline threads (+queues) collapse into a sequential
host loop whose heavy stages are jitted device programs; the back end runs
batched between submap insertions (SURVEY §2.9 P1/P2 re-expression).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional

import numpy as np
import jax.numpy as jnp

from ..common import np_se3
from ..io import kitti as kitti_io
from ..ops.normals import estimate_normals
from ..registration.icp_fast import align_point_to_plane
from .frame import Frame, Submap, SubmapOptions, Trajectory
from .frontend import FrontEnd, FrontEndOptions


@dataclasses.dataclass
class MapBuilderOptions:
    """MapBuilderOptions parity (builder/map_builder.h:97-120)."""

    front_end: FrontEndOptions = dataclasses.field(
        default_factory=FrontEndOptions)
    submap: SubmapOptions = dataclasses.field(default_factory=SubmapOptions)
    export_file_path: str = "./"
    output_kitti_pose: bool = True
    submap_capacity: int = 65536
    # back_end submap matcher (registrators/interface.h:61)
    submap_matcher_accepted_min_score: float = 0.7
    submap_matcher_leaf_size: int = 8
    enable_submap_pair_match: bool = True


class MapBuilder:
    def __init__(self, options: MapBuilderOptions = None,
                 filter_chain: Optional[Callable] = None,
                 backend=None):
        self.options = options or MapBuilderOptions()
        self.front_end = FrontEnd(self.options.front_end,
                                  filter_chain=filter_chain)
        self.trajectory = Trajectory(0)
        self.backend = backend        # attached pose-graph optimizer or None
        self._current_submap: Optional[Submap] = None
        self._next_submap_id = 0

    # ------------------------------------------------------------------
    def insert_pointcloud(self, stamp: float, points: np.ndarray) -> None:
        """InsertPointcloudMsg-equivalent for host arrays
        (map_builder.cc:156-178)."""
        frame = self.front_end.process(stamp, points)
        if frame is not None:
            self._insert_frame(frame)

    def insert_imu(self, stamp: float, angular_velocity, linear_acceleration):
        from .pose_extrapolator import ImuData
        self.front_end.extrapolator.add_imu_data(
            ImuData(stamp, np.asarray(angular_velocity),
                    np.asarray(linear_acceleration)))

    def _insert_frame(self, frame: Frame) -> None:
        """InsertFrameForSubmap + SubmapProcessing merge step
        (map_builder.cc:221-229, 662-709)."""
        if self._current_submap is None or self._current_submap.full:
            self._current_submap = Submap(
                self._next_submap_id, self.options.submap,
                capacity=self.options.submap_capacity)
            self._next_submap_id += 1
            self.trajectory.append(self._current_submap)
        self._current_submap.insert_frame(frame)
        if self._current_submap.full:
            if (self.options.enable_submap_pair_match
                    and self._current_submap.id > 0):
                self._submap_pair_match(self._current_submap.id,
                                        self._current_submap.id - 1)
            if self.backend is not None:
                self.backend.add_submap(self.trajectory, self._current_submap)

    def _submap_pair_match(self, source_index: int, target_index: int) -> None:
        """SubmapPairMatch parity (map_builder.cc:399-446): register submap
        ``source`` onto its predecessor; the predecessor stores the matched
        transform-to-next (used as the sequential pose-graph factor)."""
        source = self.trajectory[source_index]
        target = self.trajectory[target_index]
        guess = np_se3.inverse(target.frames[0].global_pose) @ \
            source.frames[0].global_pose
        target_nc = estimate_normals(
            target.cloud.compact(),
            leaf_size=self.options.submap_matcher_leaf_size)
        T, score = align_point_to_plane(
            source.cloud, target_nc, jnp.asarray(guess, dtype=jnp.float32),
            tile=self.options.front_end.nn_tile)
        score = float(score)
        source.match_score_to_previous = score
        if score >= self.options.submap_matcher_accepted_min_score:
            target.match_transform_to_next = np_se3.normalize_rotation(
                np.asarray(T, dtype=np.float64))
        else:
            # keep the odometry transform (map_builder.cc:439-444)
            target.match_transform_to_next = guess

    # ------------------------------------------------------------------
    def finish(self) -> None:
        """FinishAllComputations-equivalent (map_builder.cc:715-746):
        flush, run final optimization, write outputs."""
        # drop a trailing unfinished submap's pending frames into the pose
        # list anyway (they still carry odometry poses)
        if self.backend is not None:
            self.backend.run_final_optimization(self.trajectory)
            for s in self.trajectory:
                s.update_inner_frame_poses()
        if self.options.output_kitti_pose:
            os.makedirs(self.options.export_file_path, exist_ok=True)
            kitti_io.write_poses(
                os.path.join(self.options.export_file_path,
                             "kitti_pose.txt"),
                self.submap_poses())

    def submap_poses(self) -> List[np.ndarray]:
        return [s.global_pose for s in self.trajectory]

    def frame_poses(self) -> List[np.ndarray]:
        return [f.global_pose for s in self.trajectory for f in s.frames]
