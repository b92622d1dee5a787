"""Keyframe / submap containers.

Parity with the reference hierarchy frames → submaps → trajectory
(builder/frame.h:33-63, builder/submap.h:41-51, builder/trajectory.h:57-79).
Clouds live on device as fixed-capacity ``PointCloud``s; poses are host
float64 (like the reference's Eigen::Matrix4d bookkeeping).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..common import np_se3
from ..data.cloud import PointCloud, concat as cloud_concat
from ..ops import voxel as voxel_ops


@dataclasses.dataclass
class Frame:
    """One keyframe (FrameBase parity, builder/frame_base.h:51-118)."""

    stamp: float
    cloud: PointCloud                 # sensor-frame points (compensated)
    global_pose: np.ndarray           # [4, 4] f64
    local_pose: np.ndarray = None     # pose within its submap
    match_score: float = 1.0
    descriptor: Optional[np.ndarray] = None   # M2DP, filled by backend

    def transform_cloud_to_global(self) -> PointCloud:
        return self.cloud.transform(
            jnp.asarray(self.global_pose, dtype=jnp.float32))


@dataclasses.dataclass
class SubmapOptions:
    """builder/submap_options.h:30-45 parity (same defaults)."""

    frame_count: int = 5
    enable_voxel_filter: bool = False
    voxel_size: float = 0.1
    enable_inner_mrvm: bool = False
    enable_random_sampling: bool = False
    random_sampling_rate: float = 0.5
    # disk offload (submap.cc:197-236 + memory_manager.cc:51-62)
    enable_disk_saving: bool = False
    disk_saving_delay: int = 30       # inactive seconds before RAM release
    saving_name_prefix: str = "s_"


class Submap:
    """Container of ``frame_count`` frames merged in the first frame's
    coordinate system (Submap::InsertFrame, builder/submap.cc:76-163)."""

    def __init__(self, submap_id: int, options: SubmapOptions,
                 capacity: int):
        self.id = submap_id
        self.options = options
        self.capacity = capacity
        self.frames: List[Frame] = []
        self.global_pose: np.ndarray = np.eye(4)   # pose of first frame
        self.cloud: Optional[PointCloud] = None    # merged, submap-local
        self.descriptor: Optional[np.ndarray] = None
        self.match_transform_to_next: Optional[np.ndarray] = None
        self.match_score_to_previous: float = 1.0
        self.stamp: float = 0.0
        # sensor tags interpolated at the submap stamp
        # (SetRelatedGpsInENU / SetRelatedOdom, map_builder.cc:690-701)
        self.related_gps_enu: Optional[np.ndarray] = None   # [3]
        self.related_odom: Optional[np.ndarray] = None      # [4, 4]

    @property
    def full(self) -> bool:
        return len(self.frames) >= self.options.frame_count

    def insert_frame(self, frame: Frame) -> None:
        assert not self.full
        if not self.frames:
            self.global_pose = frame.global_pose.copy()
            self.stamp = frame.stamp
        frame.local_pose = np_se3.inverse(self.global_pose) @ frame.global_pose
        self.frames.append(frame)
        if self.full:
            self._finalize()

    def _finalize(self) -> None:
        """Merge frames in local coords (+ optional voxel filter)
        (submap.cc:98-162)."""
        merged = None
        for f in self.frames:
            local = f.cloud.transform(jnp.asarray(f.local_pose,
                                                  dtype=jnp.float32))
            merged = local if merged is None else cloud_concat(
                merged, local, capacity=self.capacity)
        if merged.capacity > self.capacity:
            merged = PointCloud(
                xyz=merged.xyz[:self.capacity],
                intensity=merged.intensity[:self.capacity],
                factor=merged.factor[:self.capacity],
                mask=merged.mask[:self.capacity])
        if self.options.enable_voxel_filter:
            merged = voxel_ops.voxel_downsample(
                merged, self.options.voxel_size, mode="round")
        self.cloud = merged

    def update_inner_frame_poses(self) -> None:
        """Submap::UpdateInnerFramePose parity (submap.cc:268-274): after
        optimization, frame globals follow the submap pose."""
        for f in self.frames:
            f.global_pose = self.global_pose @ f.local_pose


class Trajectory:
    """Ordered submap list (builder/trajectory.h:57-79; single-threaded —
    the TPU pipeline has no concurrent writers)."""

    def __init__(self, trajectory_id: int = 0):
        self.id = trajectory_id
        self.submaps: List[Submap] = []

    def __iter__(self):
        return iter(self.submaps)

    def __len__(self):
        return len(self.submaps)

    def __getitem__(self, i):
        return self.submaps[i]

    def append(self, s: Submap):
        self.submaps.append(s)
