"""Scan-matching front end: the odometry loop.

Host-side re-expression of ``MapBuilder::ScanMatchProcessing``
(builder/map_builder.cc:260-397). The reference runs this in its own thread
fed by queues; here it is a plain sequential loop (the serial dependency is
fundamental — scan t needs pose t−1, SURVEY §7.3) whose heavy steps are
jitted device programs:

  * target normal estimation (`ops.normals.estimate_normals`)
  * per-point motion compensation (`PointCloud.motion_compensate`)
  * point-to-plane ICP (`registration.icp_fast.align_point_to_plane`)

Semantics parity, step by step against map_builder.cc:
  first cloud → becomes target + first keyframe at identity  (cc:281-293)
  guess = pose_target⁻¹ · extrapolated(t), normalized        (cc:302-309)
  motion-compensate source by accum⁻¹·guess                  (cc:313-328)
  align; optionally average(align_result, guess) and
  re-compensate with accum⁻¹·average                         (cc:330-354)
  pose_source = pose_target · align_result; accum = result   (cc:356-357)
  motion filter: translation ≥ range OR Σ|euler|° ≥ range →
  new keyframe, source becomes target (re-normal-ed)         (cc:369-392)
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..common import np_se3, prof
from ..data import cloud as cloud_lib
from ..data.cloud import PointCloud
from ..ops.normals import estimate_normals
from ..registration.icp_fast import align_point_to_plane
from .frame import Frame
from .pose_extrapolator import PoseExtrapolator


@dataclasses.dataclass
class MotionFilterOptions:
    """front_end::Options::motion_filter (map_builder.h:79-83)."""

    translation_range: float = 0.35
    angle_range: float = 1.5       # degrees (sum of |euler|)
    time_range: float = 0.0


@dataclasses.dataclass
class FrontEndOptions:
    """front_end::Options parity (map_builder.h:68-91)."""

    motion_filter: MotionFilterOptions = dataclasses.field(
        default_factory=MotionFilterOptions)
    accumulate_cloud_num: int = 1
    motion_compensation: bool = True
    use_average: bool = True
    # matcher knobs (icp_fast.h:56-60)
    matcher_type: int = 6          # registrator::Type (interface.h:41-50)
    max_iteration: int = 100
    dist_outlier_ratio: float = 0.7
    # TPU shape knobs
    scan_capacity: int = 32768
    target_leaf_size: int = 8
    nn_tile: int = 1024
    # chunked front end only: gyro-driven rotation prediction in the
    # device scan step (builder/pipeline.py; pose_extrapolator.cc:177-197)
    use_imu: bool = False


@jax.jit
def _compensate(cloud: PointCloud, delta: jax.Array) -> PointCloud:
    return cloud.motion_compensate(delta)


@partial(jax.jit, static_argnames=("leaf_size",))
def _target_normals(pc: PointCloud, leaf_size: int):
    """compact + normal estimation fused into ONE dispatch — eager op
    dispatch costs seconds per op over the remote-TPU tunnel, so every
    per-scan stage must be a single jitted program."""
    return estimate_normals(pc.compact(), leaf_size=leaf_size)


@partial(jax.jit, static_argnames=("compensation", "use_average",
                                   "max_iteration", "tile"))
def _frontend_align(pc: PointCloud, target, guess, accum_inv,
                    compensation: bool, use_average: bool,
                    dist_outlier_ratio, max_iteration: int, tile: int):
    """The whole per-scan device program in ONE dispatch
    (map_builder.cc:311-354): motion-compensate by accum⁻¹·guess, align,
    optionally average with the guess, re-compensate the raw cloud by
    accum⁻¹·result.  Returns (T_align, score, source_out)."""
    from ..common import se3 as jse3
    src = pc.motion_compensate(accum_inv @ guess) if compensation else pc
    T, score = align_point_to_plane(
        src, target, guess, dist_outlier_ratio=dist_outlier_ratio,
        max_iteration=max_iteration, tile=tile)
    if compensation and use_average:
        T = jse3.average_transforms(jnp.stack([T, guess]))
    if compensation:
        src = pc.motion_compensate(accum_inv @ T)
    return T, score, src


class FrontEnd:
    """Feed scans in time order via :meth:`process`; returns a new keyframe
    ``Frame`` when the motion filter fires, else None."""

    def __init__(self, options: FrontEndOptions = None,
                 filter_chain: Optional[Callable[[PointCloud], PointCloud]] = None,
                 extrapolator: Optional[PoseExtrapolator] = None):
        self.options = options or FrontEndOptions()
        self.filter_chain = filter_chain
        self.extrapolator = extrapolator or PoseExtrapolator.initial_simple_ctrv()
        self.pose_target = np.eye(4)
        self.accumulative = np.eye(4)
        self.target = None            # NormalCloud on device
        self.got_first = False
        self.last_score = 1.0
        self.num_scans = 0
        # non-default matcher backends (type 1/3/5) go through the factory
        # (CreateMatcher role, interface.cc:139-173); type 6 keeps the
        # specialized icp_fast path with target-normal caching below.
        self.matcher = None
        if self.options.matcher_type != 6:
            from ..registration.factory import create_matcher
            self.matcher = create_matcher(self.options.matcher_type)
        # jit the whole filter chain into one dispatch (eager per-filter
        # dispatch over the remote-TPU tunnel costs seconds per op)
        self._chain_jit = (jax.jit(self.filter_chain.__call__)
                           if self.filter_chain is not None else None)
        self._compact_jit = jax.jit(PointCloud.compact)

    # ------------------------------------------------------------------
    def _prepare(self, points: np.ndarray) -> PointCloud:
        pc = cloud_lib.from_numpy(points,
                                  capacity=self.options.scan_capacity)
        if self._chain_jit is not None:
            pc = self._chain_jit(pc)
        return pc

    def _set_target(self, pc: PointCloud) -> None:
        # "scan match:target" block (map_builder.cc:316)
        with prof.block("scan match:target"):
            if self.matcher is None:
                self.target = _target_normals(
                    pc, leaf_size=self.options.target_leaf_size)
            else:
                self.target = self._compact_jit(pc)
                self.matcher.set_input_target(self.target)

    def _align(self, source: PointCloud, guess: jax.Array):
        # "scan match:align" block (map_builder.cc:332)
        with prof.block("scan match:align"):
            if self.matcher is None:
                return align_point_to_plane(
                    source, self.target, guess,
                    dist_outlier_ratio=self.options.dist_outlier_ratio,
                    max_iteration=self.options.max_iteration,
                    tile=self.options.nn_tile)
            self.matcher.set_input_source(source)
            return self.matcher.align(guess)

    def process(self, stamp: float, points: np.ndarray) -> Optional[Frame]:
        # "FrontEndOneFrame" block (map_builder.cc:295)
        with prof.block("FrontEndOneFrame"):
            return self._process(stamp, points)

    def _process(self, stamp: float, points: np.ndarray) -> Optional[Frame]:
        opts = self.options
        self.num_scans += 1
        pc = self._prepare(points)

        if not self.got_first:
            self.got_first = True
            self._set_target(pc)
            self.extrapolator.add_pose(stamp, np.eye(4))
            self.pose_target = np.eye(4)
            return Frame(stamp=stamp, cloud=pc, global_pose=np.eye(4),
                         match_score=1.0)

        last_t = self.extrapolator.last_pose_time()
        if last_t is not None and stamp < last_t:
            # stale scan (map_builder.cc:296-301): resync target
            self._set_target(pc)
            return None

        pose_source = self.extrapolator.extrapolate_pose(stamp)
        guess = np_se3.normalize_rotation(
            np_se3.inverse(self.pose_target) @ pose_source)

        if self.matcher is None:
            # fused per-scan device program: compensate + align + average +
            # re-compensate in ONE dispatch ("scan match:align",
            # map_builder.cc:311-354)
            with prof.block("scan match:align"):
                T_align, score, source = _frontend_align(
                    pc, self.target,
                    jnp.asarray(guess, dtype=jnp.float32),
                    jnp.asarray(np_se3.inverse(self.accumulative),
                                dtype=jnp.float32),
                    compensation=opts.motion_compensation,
                    use_average=opts.use_average,
                    dist_outlier_ratio=opts.dist_outlier_ratio,
                    max_iteration=opts.max_iteration, tile=opts.nn_tile)
            align_result = np_se3.normalize_rotation(
                np.asarray(T_align, dtype=np.float64))
            self.last_score = float(score)
        else:
            source = pc
            if opts.motion_compensation:
                delta = np_se3.inverse(self.accumulative) @ guess
                source = _compensate(pc, jnp.asarray(delta,
                                                     dtype=jnp.float32))
            T_align, score = self._align(
                source, jnp.asarray(guess, dtype=jnp.float32))
            align_result = np_se3.normalize_rotation(
                np.asarray(T_align, dtype=np.float64))
            self.last_score = float(score)
            if opts.motion_compensation:
                if opts.use_average:
                    align_result = np_se3.average_transforms(
                        [align_result, guess])
                source = _compensate(
                    pc, jnp.asarray(np_se3.inverse(self.accumulative)
                                    @ align_result, dtype=jnp.float32))

        pose_source = self.pose_target @ align_result
        self.accumulative = align_result
        self.extrapolator.add_pose(stamp, pose_source)

        # motion filter (map_builder.cc:369-392)
        accu_translation = np_se3.translation_norm(self.accumulative)
        accu_angles = np_se3.rotation_angles_abs_sum_deg(self.accumulative)
        mf = opts.motion_filter
        if (accu_translation >= mf.translation_range or
                (mf.angle_range > 1e-3 and accu_angles >= mf.angle_range)):
            frame = Frame(stamp=stamp, cloud=source,
                          global_pose=pose_source,
                          match_score=self.last_score)
            self.accumulative = np.eye(4)
            self._set_target(source)
            self.pose_target = pose_source
            return frame
        return None
