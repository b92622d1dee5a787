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
from ..data.data_collector import (DataCollector, DataCollectorOptions,
                                   ImuMsg, NavSatFixMsg, OdomMsg)
from ..io import kitti as kitti_io
from ..io import pcd as pcd_io
from ..ops.normals import estimate_normals
from ..registration.icp_fast import align_point_to_plane
from .frame import Frame, MemoryManager, Submap, SubmapOptions, Trajectory
from .frontend import FrontEnd, FrontEndOptions
from .map_package import MapPackageOptions, save_trajectory
from .mrvm import MrvmSettings, MultiResolutionVoxelMap


from functools import partial
import jax


@partial(jax.jit, static_argnames=("stride",))
def _stride_sample(cloud, stride: int):
    """Uniform source subsampling for submap-pair registration: compact the
    valid points to the front (stable — preserves scan-time order) and keep
    every ``stride``-th, shrinking the CAPACITY by ``stride``.

    The brute-force MXU correspondence search costs O(capacity_src ×
    capacity_tgt) regardless of the valid count, so a mask-only thinning
    (the reference-parity RandomSampler) saves nothing on TPU — the
    capacity itself must shrink.  A 4× stride on a ~30k-point submap
    leaves ~8k matches for a 6-DoF trimmed estimate (the reference's PM
    pipeline similarly subsamples its reading, icp_pointmatcher.cc:171)."""
    c = cloud.compact()
    import dataclasses as _dc
    return _dc.replace(
        c, xyz=c.xyz[::stride], intensity=c.intensity[::stride],
        factor=c.factor[::stride], mask=c.mask[::stride])


@partial(jax.jit, static_argnames=("stride", "n_iters", "tile",
                                   "score_spacing_ref"))
def _batch_pair_align(sources, targets, guesses, stride: int, n_iters: int,
                      tile: int, dist_outlier_ratio: float = 0.7,
                      score_spacing_ref: float = 0.0):
    """Submap-pair registration batch in ONE device dispatch: stride-sample
    every source, stack, and run a vmapped FIXED-TRIP point-to-plane ICP
    (SubmapPairMatch queue, map_builder.cc:705-709 / SURVEY §2.9 P2).

    The fixed-iteration scan (``fixed_iterations``) is what makes the vmap
    profitable: a vmapped ``while_loop`` runs every pair to the slowest
    pair's trip count, whereas this is exactly ``B × n_iters`` with
    converged pairs frozen — and one dispatch replaces B serial ~5 ms
    kernel launches through the remote-TPU tunnel."""
    if stride > 1:
        # plain slot stride: submap clouds are voxel-compacted (or
        # frame-blocked), so every ``stride``-th slot subsamples the valid
        # points uniformly without paying a compact() sort per source
        sources = tuple(jax.tree.map(lambda x: x[::stride], s)
                        for s in sources)
    batch_src = jax.tree.map(lambda *xs: jnp.stack(xs), *sources)
    batch_tgt = jax.tree.map(lambda *xs: jnp.stack(xs), *targets)
    return jax.vmap(lambda s, t, g: align_point_to_plane(
        s, t, g, dist_outlier_ratio=dist_outlier_ratio, tile=tile,
        fixed_iterations=n_iters,
        score_spacing_ref=score_spacing_ref))(batch_src, batch_tgt, guesses)


@jax.jit
def _pack_pair_outs(outs):
    """Stack per-pair (T, score) results into two arrays so the host reads
    them back in one transfer instead of 2B round trips."""
    return (jnp.stack([T for T, _ in outs]),
            jnp.stack([s for _, s in outs]))


@partial(jax.jit, static_argnames=("leaf_size",))
def _batch_normals(cloud_tuple, leaf_size: int):
    """Normal estimation for B submap clouds in ONE vmapped dispatch —
    the sort cascade inside ``estimate_normals`` is the most expensive
    per-submap program, so new submaps get their target normals computed
    together at flush time and cached on the ``Submap``
    (:meth:`~staticmapping_tpu.builder.frame.Submap.normal_cloud`).
    Takes and returns TUPLES of per-submap clouds (stack and unstack both
    happen inside this jit: eager per-leaf stacking/slicing would cost one
    remote-tunnel dispatch per leaf per submap)."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cloud_tuple)
    ncs = jax.vmap(
        lambda c: estimate_normals(c.compact(), leaf_size=leaf_size)
    )(stacked)
    b = len(cloud_tuple)
    return tuple(jax.tree.map(lambda x, k=k: x[k], ncs) for k in range(b))


@dataclasses.dataclass
class MapBuilderOptions:
    """MapBuilderOptions parity (builder/map_builder.h:97-120)."""

    front_end: FrontEndOptions = dataclasses.field(
        default_factory=FrontEndOptions)
    submap: SubmapOptions = dataclasses.field(default_factory=SubmapOptions)
    data_collector: DataCollectorOptions = dataclasses.field(
        default_factory=DataCollectorOptions)
    use_imu: bool = False
    use_gps: bool = False
    use_odom: bool = False
    export_file_path: str = "./"
    output_kitti_pose: bool = True
    output_mrvm: bool = True
    output_direct_combined_map: bool = True
    # piecewise direct map export: close and restart the combined/MRVM maps
    # every `separate_step` submaps, writing part_map_<k>.pcd /
    # static_part_map_<k>.pcd (whole_options, map_builder.h:104-109,
    # SaveMaps cc:857-891)
    separate_output: bool = False
    separate_step: int = 200
    save_map_package: bool = False
    mrvm_settings: MrvmSettings = dataclasses.field(
        default_factory=MrvmSettings)
    map_package: MapPackageOptions = dataclasses.field(
        default_factory=MapPackageOptions)
    submap_capacity: int = 65536
    # back_end submap matcher (registrators/interface.h:61)
    submap_matcher_accepted_min_score: float = 0.7
    submap_matcher_leaf_size: int = 8
    # source subsampling stride for pair matches (1 = reference-exact full
    # cloud; see _stride_sample — capacity must stay a multiple of 128)
    submap_matcher_source_stride: int = 4
    enable_submap_pair_match: bool = True
    # P1 pipeline layer (builder/pipeline.py): device-resident front end,
    # one dispatch per `pipeline_chunk` scans instead of per scan
    pipelined: bool = False
    pipeline_chunk: int = 16
    # P2 batching: defer submap-pair matches and run them `pair_match_batch`
    # at a time in one vmapped dispatch (1 = match synchronously per submap)
    pair_match_batch: int = 1
    # fixed ICP trip count for the batched pair matches (vmap-friendly;
    # odometry-guessed pairs converge in ~5-8 iterations, frozen after)
    pair_match_fixed_iterations: int = 10
    # density normalization anchor for acceptance scores (metres of target
    # median NN spacing at which exp(-avg_dist) thresholds were
    # calibrated; 0 = raw reference-exact score law, interface.h:61)
    score_spacing_ref: float = 0.0


class MapBuilder:
    def __init__(self, options: MapBuilderOptions = None,
                 filter_chain: Optional[Callable] = None,
                 backend=None):
        self.options = options or MapBuilderOptions()
        # use_imu selects the IMU-driven extrapolator mode
        # (map_builder.cc:68-75: InitialWithImu vs InitialSimpleCTRV)
        extrapolator = None
        if self.options.use_imu and not self.options.pipelined:
            from .pose_extrapolator import PoseExtrapolator
            extrapolator = PoseExtrapolator(mode=PoseExtrapolator.MODE_IMU)
        if self.options.pipelined:
            if self.options.front_end.matcher_type not in (3, 5, 6):
                raise ValueError(
                    "pipelined=True supports matcher types 3/5/6 — got "
                    f"matcher_type={self.options.front_end.matcher_type}. "
                    "Use pipelined=False for type 1 (IcpUsingPointMatcher; "
                    "registrators/interface.cc:139-173 registry).")
            from .pipeline import DeviceFrontEnd
            # IMU + pipelined is supported since r05: gyro samples ride
            # with each chunk and drive the rotation prediction on device
            self.options.front_end.use_imu = self.options.use_imu
            self.front_end = DeviceFrontEnd(
                self.options.front_end, filter_chain=filter_chain,
                chunk_size=self.options.pipeline_chunk)
        else:
            self.front_end = FrontEnd(self.options.front_end,
                                      filter_chain=filter_chain,
                                      extrapolator=extrapolator)
        self.data_collector = DataCollector(self.options.data_collector)
        self.trajectory = Trajectory(0)
        self.backend = backend        # attached pose-graph optimizer or None
        self._current_submap: Optional[Submap] = None
        self._next_submap_id = 0
        self._pending_submaps: List[Submap] = []   # deferred P2 queue
        self._pair_results_inflight: List[tuple] = []  # dispatched batches
        # memory bounding (memory_manager.cc:51-62)
        self._submap_dir = None
        self.memory_manager: Optional[MemoryManager] = None
        if self.options.submap.enable_disk_saving:
            self._submap_dir = os.path.join(
                self.options.export_file_path, "submaps")
            self.memory_manager = MemoryManager(
                self.trajectory,
                delay_seconds=float(self.options.submap.disk_saving_delay))
        # static extrinsics (SetTrackingTo*, map_builder.h:124-137)
        self.tracking_to_lidar = np.eye(4)
        self.tracking_to_imu = np.eye(4)
        self.tracking_to_odom = np.eye(4)
        self.tracking_to_gps = np.eye(4)
        # live visualization observers (SetShow{Map,Submap,Path,Edge}
        # Function, map_builder.h:139-162; the reference's ROS publishers
        # hang off these — here any host callable can)
        self._show_map_fn = None
        self._show_submap_fn = None
        self._show_path_fn = None
        self._show_edge_fn = None
        self.show_map_every = 10      # submaps between whole-map callbacks

    # ----------------------------------------------- observer callbacks --
    # SetShow*Function parity (map_builder.h:139-162).  Callbacks fire on
    # the host after each completed submap reaches the back end (the
    # reference fires them from the ConnectAllSubmap daemon,
    # map_builder.cc:495-557).
    def set_show_map_function(self, fn) -> None:
        """fn(points [N, 4]) — the current optimized map, every
        ``show_map_every`` submaps and at finish."""
        self._show_map_fn = fn

    def set_show_submap_function(self, fn) -> None:
        """fn(points [N, 4]) — the newest submap cloud (submap frame)."""
        self._show_submap_fn = fn

    def set_show_path_function(self, fn) -> None:
        """fn(poses: List[np [4, 4]]) — current submap poses."""
        self._show_path_fn = fn

    def set_show_edge_function(self, fn) -> None:
        """fn(edges: List[(i, j)]) — current pose-graph edges."""
        self._show_edge_fn = fn

    def _notify_observers(self, submap, final: bool = False) -> None:
        if self._show_submap_fn is not None and submap is not None \
                and submap.cloud is not None:
            from ..data import cloud as cloud_lib
            self._show_submap_fn(cloud_lib.to_numpy(submap.cloud))
        if self._show_path_fn is not None:
            self._show_path_fn([s.global_pose for s in self.trajectory])
        if self._show_edge_fn is not None:
            if self.backend is not None and hasattr(self.backend,
                                                    "view_graph"):
                vg = self.backend.view_graph
                edges = [(a, b) for a, lst in vg.edges.items()
                         for b, _ in lst]
            else:
                edges = []
            self._show_edge_fn(edges)
        if self._show_map_fn is not None and (
                final or (len(self.trajectory) % self.show_map_every == 0)):
            import jax.numpy as jnp
            from ..data import cloud as cloud_lib
            parts = []
            for s in self.trajectory:
                if s.cloud is None:
                    continue
                parts.append(cloud_lib.to_numpy(s.cloud.transform(
                    jnp.asarray(s.global_pose, dtype=jnp.float32))))
            if parts:
                self._show_map_fn(np.vstack(parts))

    # ------------------------------------------------- extrinsic setters --
    def set_tracking_to_lidar(self, T: np.ndarray):
        self.tracking_to_lidar = np.asarray(T, dtype=np.float64)

    def set_tracking_to_imu(self, T: np.ndarray):
        self.tracking_to_imu = np.asarray(T, dtype=np.float64)

    def set_tracking_to_odom(self, T: np.ndarray):
        self.tracking_to_odom = np.asarray(T, dtype=np.float64)
        if self.backend is not None and hasattr(
                self.backend, "set_transform_odom_to_lidar"):
            # tf_odom_lidar = tracking_to_odom⁻¹ · tracking_to_lidar
            self.backend.set_transform_odom_to_lidar(
                np_se3.inverse(self.tracking_to_odom)
                @ self.tracking_to_lidar)

    def set_tracking_to_gps(self, T: np.ndarray):
        self.tracking_to_gps = np.asarray(T, dtype=np.float64)
        if self.backend is not None and hasattr(
                self.backend, "set_transform_tracking_to_gps"):
            self.backend.set_transform_tracking_to_gps(self.tracking_to_gps)

    # ------------------------------------------------------------------
    def insert_pointcloud(self, stamp: float, points: np.ndarray) -> None:
        """InsertPointcloudMsg-equivalent for host arrays
        (map_builder.cc:156-178): transform into the tracking frame,
        accumulate, then feed the front end."""
        points = np.asarray(points)
        if not np.allclose(self.tracking_to_lidar, np.eye(4)):
            R = self.tracking_to_lidar[:3, :3].astype(points.dtype)
            t = self.tracking_to_lidar[:3, 3].astype(points.dtype)
            xyz = points[:, :3] @ R.T + t
            points = np.column_stack([xyz, points[:, 3:]]) \
                if points.shape[1] > 3 else xyz
        out = self.data_collector.add_cloud(stamp, points)
        if out is None:
            return
        stamp, points = out
        frame = self.front_end.process(stamp, points)
        if isinstance(frame, list):           # pipelined: keyframe burst
            for f in frame:
                self._insert_frame(f)
        elif frame is not None:
            self._insert_frame(frame)

    def insert_imu(self, stamp: float, angular_velocity, linear_acceleration):
        """InsertImuMsg parity (map_builder.cc:172-192): rotate into the
        tracking frame, store, feed the extrapolator."""
        from .pose_extrapolator import ImuData
        R = self.tracking_to_imu[:3, :3]
        w = R @ np.asarray(angular_velocity, dtype=np.float64)
        a = R @ np.asarray(linear_acceleration, dtype=np.float64)
        self.data_collector.add_imu(ImuMsg(stamp, w, a))
        if hasattr(self.front_end, "add_imu"):          # chunked device FE
            self.front_end.add_imu(stamp, w)
        else:
            self.front_end.extrapolator.add_imu_data(ImuData(stamp, w, a))

    def insert_odom(self, stamp: float, pose: np.ndarray) -> None:
        """InsertOdomMsg parity (map_builder.cc:194-205) — for precise
        INS-RTK-class odometry; only the pose is used."""
        if not self.options.use_odom:
            return
        self.data_collector.add_odom(OdomMsg(stamp, np.asarray(pose)))

    def insert_gps(self, stamp: float, latitude: float, longitude: float,
                   altitude: float, status: int = 0) -> None:
        """InsertGpsMsg parity (map_builder.cc:206-211)."""
        if not self.options.use_gps:
            return
        self.data_collector.add_gps(NavSatFixMsg(
            stamp, latitude, longitude, altitude, status))

    def _insert_frame(self, frame: Frame) -> None:
        """InsertFrameForSubmap + SubmapProcessing merge step
        (map_builder.cc:221-229, 662-709)."""
        from ..common import prof
        with prof.block("SubmapInsert"):
            self._insert_frame_inner(frame)

    def _insert_frame_inner(self, frame: Frame) -> None:
        if self._current_submap is None or self._current_submap.full:
            self._current_submap = Submap(
                self._next_submap_id, self.options.submap,
                capacity=self.options.submap_capacity,
                save_dir=self._submap_dir)
            if (self.options.pair_match_batch > 1
                    and not self.options.submap.enable_inner_mrvm):
                # P2: merge in one batched dispatch at flush time
                self._current_submap.defer_merge = True
            self._next_submap_id += 1
            self.trajectory.append(self._current_submap)
        if self.memory_manager is not None:
            import time as _time
            self.memory_manager.tick(_time.monotonic())
        self._current_submap.insert_frame(frame)
        if self._current_submap.full:
            # sensor tags at the submap stamp (map_builder.cc:690-701)
            if self.options.use_gps:
                self._current_submap.related_gps_enu = \
                    self.data_collector.interpolate_gps(
                        self._current_submap.stamp, 0.001, trim_data=True)
            if self.options.use_odom:
                self._current_submap.related_odom = \
                    self.data_collector.interpolate_odom(
                        self._current_submap.stamp, 0.001, trim_data=True)
            if self.options.pair_match_batch > 1:
                # deferred P2 path: queue; flush in one vmapped dispatch
                self._pending_submaps.append(self._current_submap)
                if len(self._pending_submaps) >= self.options.pair_match_batch:
                    self._flush_pair_matches()
            else:
                if (self.options.enable_submap_pair_match
                        and self._current_submap.id > 0):
                    self._submap_pair_match(self._current_submap.id,
                                            self._current_submap.id - 1)
                if self.backend is not None:
                    self.backend.add_submap(self.trajectory,
                                            self._current_submap)
                self._notify_observers(self._current_submap)

    def _flush_pair_matches(self, drain: bool = False) -> None:
        """Resolve the deferred pair-match queue with THREE device
        dispatches — one vmapped merge for the queued submaps, one vmapped
        normal-estimation program, one packed registration batch — and NO
        host sync (P2 batching, SubmapPairMatch semantics
        map_builder.cc:399-446).  The results are read back one flush
        cycle LATER (:meth:`_consume_pair_results`) so the device crunches
        this flush's programs while the host stages the next front-end
        chunk; ``drain=True`` (finish) consumes everything now."""
        from ..common import prof
        queued = self._pending_submaps
        self._pending_submaps = []
        if queued:
            pairs = [s for s in queued
                     if self.options.enable_submap_pair_match and s.id > 0]
            record = (queued, [], [], None, None)
            with prof.block("SubmapPairMatchBatch"):
                self._batch_finalize(queued)
                if pairs:
                    leaf = self.options.submap_matcher_leaf_size
                    target_subs = [self.trajectory[s.id - 1] for s in pairs]
                    # batch-fill missing target normals (one vmapped
                    # dispatch)
                    missing = [t for t in target_subs
                               if t._normals is None
                               or t._normals_leaf != leaf]
                    if missing:
                        # pad the batch to the configured size so the
                        # vmapped program compiles for ONE shape, not one
                        # per flush count
                        pad = (-len(missing)) % max(
                            self.options.pair_match_batch, 1)
                        clouds = tuple([t.cloud for t in missing]
                                       + [missing[-1].cloud] * pad)
                        ncs = _batch_normals(clouds, leaf)
                        for t, nc in zip(missing, ncs):
                            t.set_normal_cloud(nc, leaf)
                    guesses = [
                        np_se3.inverse(
                            self.trajectory[s.id - 1].frames[0].global_pose)
                        @ s.frames[0].global_pose for s in pairs]
                    # one batched fixed-trip registration dispatch; pad to
                    # the configured batch so it compiles for ONE shape
                    stride = self.options.submap_matcher_source_stride
                    pad = (-len(pairs)) % max(
                        self.options.pair_match_batch, 1)
                    srcs = tuple([s.cloud for s in pairs]
                                 + [pairs[-1].cloud] * pad)
                    tgts = tuple([t.normal_cloud(leaf)
                                  for t in target_subs]
                                 + [target_subs[-1].normal_cloud(leaf)] * pad)
                    gs = jnp.asarray(
                        np.stack(guesses
                                 + [guesses[-1]] * pad).astype(np.float32))
                    Ts_d, scores_d = _batch_pair_align(
                        srcs, tgts, gs, stride=stride,
                        n_iters=self.options.pair_match_fixed_iterations,
                        tile=self.options.front_end.nn_tile,
                        score_spacing_ref=self.options.score_spacing_ref)
                    record = (queued, pairs, guesses, Ts_d, scores_d)
            self._pair_results_inflight.append(record)
        # one record stays in flight during the insert loop; drain at finish
        keep = 0 if drain else 1
        while len(self._pair_results_inflight) > keep:
            self._consume_pair_results()

    def _batch_finalize(self, queued: List[Submap]) -> None:
        """Merge the queued submaps' frames in ONE vmapped device dispatch
        (deferred ``Submap._finalize``; submap.cc:98-162 semantics)."""
        from .frame import _batch_merge_frames
        todo = [s for s in queued
                if s.defer_merge and s.cloud is None and s.frames]
        if not todo:
            return
        counts = {len(s.frames) for s in todo}
        if len(counts) != 1:
            # ragged tail (end of stream): per-submap merges
            for s in todo:
                s.defer_merge = False
                s._finalize()
            return
        F = counts.pop()
        poses = np.stack([np.stack([f.local_pose for f in s.frames])
                          for s in todo]).astype(np.float32)
        clouds_flat = tuple(f.cloud for s in todo for f in s.frames)
        opts = self.options.submap
        merged = _batch_merge_frames(
            clouds_flat, poses, n_frames=F,
            capacity=self.options.submap_capacity,
            voxel_size=np.float32(opts.voxel_size),
            voxel_mode="round" if opts.enable_voxel_filter else None)
        for s, pc in zip(todo, merged):
            s.install_merged_cloud(pc)

    def _consume_pair_results(self) -> None:
        """Read back the oldest in-flight pair-match batch and feed its
        submaps to the back end / observers (order preserved)."""
        queued, pairs, guesses, Ts_d, scores_d = \
            self._pair_results_inflight.pop(0)
        if pairs:
            Ts = np.asarray(Ts_d, dtype=np.float64)
            scores = np.asarray(scores_d, dtype=np.float64)
            for k, s in enumerate(pairs):
                target = self.trajectory[s.id - 1]
                s.match_score_to_previous = float(scores[k])
                if scores[k] >= self.options.submap_matcher_accepted_min_score:
                    target.match_transform_to_next = \
                        np_se3.normalize_rotation(Ts[k])
                else:
                    # keep the odometry transform (map_builder.cc:439-444)
                    target.match_transform_to_next = np.asarray(
                        guesses[k], dtype=np.float64)
        if self.backend is not None:
            for s in queued:
                self.backend.add_submap(self.trajectory, s)
        for s in queued:
            self._notify_observers(s)

    def _submap_pair_match(self, source_index: int, target_index: int) -> None:
        """SubmapPairMatch parity (map_builder.cc:399-446): register submap
        ``source`` onto its predecessor; the predecessor stores the matched
        transform-to-next (used as the sequential pose-graph factor)."""
        from ..common import prof
        with prof.block("SubmapPairMatch"):
            self._submap_pair_match_inner(source_index, target_index)

    def _submap_pair_match_inner(self, source_index: int,
                                 target_index: int) -> None:
        source = self.trajectory[source_index]
        target = self.trajectory[target_index]
        guess = np_se3.inverse(target.frames[0].global_pose) @ \
            source.frames[0].global_pose
        target_nc = target.normal_cloud(
            self.options.submap_matcher_leaf_size)
        stride = self.options.submap_matcher_source_stride
        src = _stride_sample(source.cloud, stride) if stride > 1 \
            else source.cloud
        T, score = align_point_to_plane(
            src, target_nc,
            jnp.asarray(guess, dtype=jnp.float32),
            tile=self.options.front_end.nn_tile,
            score_spacing_ref=self.options.score_spacing_ref)
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
        flush, run final optimization, write outputs (SaveMaps cc:825-911)."""
        if hasattr(self.front_end, "flush"):
            for f in self.front_end.flush():
                self._insert_frame(f)
        self._flush_pair_matches(drain=True)
        if self.backend is not None:
            self.backend.run_final_optimization(self.trajectory)
            for s in self.trajectory:
                s.update_inner_frame_poses()
            self._calculate_coord_transform_to_gps()

        out_dir = self.options.export_file_path
        os.makedirs(out_dir, exist_ok=True)

        if self.options.output_kitti_pose:
            kitti_io.write_poses(os.path.join(out_dir, "kitti_pose.txt"),
                                 self.submap_poses())
        self._output_path_files(out_dir)

        if self.options.output_mrvm or self.options.output_direct_combined_map:
            self._save_maps(out_dir)

        if self.options.save_map_package:
            save_trajectory(self.trajectory,
                            os.path.join(out_dir, "map_package"),
                            self.options.map_package)
            # bounded-size map pieces (SaveTrajectoriesAsMapPackage,
            # map_package.cc:51-230)
            from .map_package import save_map_pieces
            save_map_pieces(self.trajectory,
                            os.path.join(out_dir, "map_package", "pieces"),
                            self.options.map_package,
                            self.options.mrvm_settings)

        if (self.backend is not None
                and getattr(self.backend.options, "output_graph_pic", False)
                and hasattr(self.backend, "save_view_graph")):
            self.backend.save_view_graph(out_dir)
        self._notify_observers(None, final=True)

    def _calculate_coord_transform_to_gps(self) -> None:
        """CalculateCoordTransformToGps parity (map_builder.cc:748-762):
        rotate the whole map into the ENU frame."""
        if not self.options.use_gps or not hasattr(
                self.backend, "get_gps_coord_transform"):
            return
        T = self.backend.get_gps_coord_transform()
        if np.allclose(T, np.eye(4)):
            return
        for submap in self.trajectory:
            submap.global_pose = np_se3.normalize_rotation(
                T @ submap.global_pose)
            submap.update_inner_frame_poses()

    def _output_path_files(self, out_dir: str) -> None:
        """OutputPath parity (map_builder.cc:615-642 + trajectory path
        export): path.csv with stamp + translation + quaternion."""
        rows = []
        for s in self.trajectory:
            for f in s.frames:
                q = np_se3.matrix_to_quat(f.global_pose[:3, :3])
                t = f.global_pose[:3, 3]
                rows.append([f.stamp, *t, *q])
        if rows:
            np.savetxt(os.path.join(out_dir, "path.csv"),
                       np.asarray(rows),
                       header="stamp x y z qw qx qy qz", comments="# ")
        # raw sensor paths (RawGpsDataToFile / RawOdomDataToFile,
        # data_collector.cc:58-71)
        gps_path = self.data_collector.raw_gps_path()
        if gps_path.size:
            pcd_io.write_pcd(os.path.join(out_dir, "original_gps.pcd"),
                             gps_path)
        odom_path = self.data_collector.raw_odom_path()
        if odom_path.size:
            pcd_io.write_pcd(
                os.path.join(out_dir, "original_odom.pcd"),
                np.column_stack([odom_path,
                                 np.zeros(len(odom_path))]))

    def _write_static(self, path: str, mrvm) -> None:
        pts = mrvm.output_to_numpy()
        if self.options.mrvm_settings.output_rgb:
            # grayscale rgb from intensity (OutputToPointCloud cc:187-209)
            pcd_io.write_pcd_rgb(path, pts[:, :3], pts[:, 3])
        else:
            pcd_io.write_pcd(path, pts)

    def _save_maps(self, out_dir: str) -> None:
        """SaveMaps parity (map_builder.cc:825-911): transform every
        submap's cloud to its final global pose; ray-cast into the MRVM for
        the static map; optionally also write the direct combined map.
        With ``separate_output``, the combined/MRVM maps are flushed and
        restarted every ``separate_step`` submaps (cc:857-891) so huge maps
        never need to fit memory at once."""
        import jax.numpy as jnp
        opts = self.options
        mrvm = MultiResolutionVoxelMap(opts.mrvm_settings) \
            if opts.output_mrvm else None
        combined = []
        n_submaps = len(self.trajectory)
        # 1-deep MRVM pipeline: dispatch submap k's device ray-event sort,
        # then merge submap k-1's readback on the host while k computes
        mrvm_pending = None

        def _mrvm_drain():
            nonlocal mrvm_pending
            if mrvm is not None and mrvm_pending is not None:
                mrvm.consume(mrvm_pending)
                mrvm_pending = None

        for s in self.trajectory:
            if s.cloud is not None:
                global_cloud = s.cloud.transform(
                    jnp.asarray(s.global_pose, dtype=jnp.float32))
                if mrvm is not None:
                    h = mrvm.dispatch(global_cloud, s.global_pose[:3, 3])
                    _mrvm_drain()
                    mrvm_pending = h
                if opts.output_direct_combined_map:
                    combined.append(np.asarray(
                        np.column_stack([
                            np.asarray(global_cloud.xyz)[np.asarray(global_cloud.mask)],
                            np.asarray(global_cloud.intensity)[np.asarray(global_cloud.mask)],
                        ])))
            # flush on the part boundary even when this submap's cloud is
            # missing (offloaded/empty): the boundary otherwise merges
            # into the next part and the tail part may never be written
            if opts.separate_output and (
                    s.id == n_submaps - 1
                    or (s.id + 1) % opts.separate_step == 0):
                part = s.id // opts.separate_step
                if opts.output_direct_combined_map and combined:
                    pcd_io.write_pcd(
                        os.path.join(out_dir, f"part_map_{part}.pcd"),
                        np.vstack(combined))
                    combined = []
                _mrvm_drain()
                if mrvm is not None and mrvm.num_voxels:
                    self._write_static(
                        os.path.join(out_dir,
                                     f"static_part_map_{part}.pcd"), mrvm)
                    mrvm = MultiResolutionVoxelMap(opts.mrvm_settings)
        _mrvm_drain()
        if opts.separate_output:
            return
        if mrvm is not None and mrvm.num_voxels:
            self._write_static(os.path.join(out_dir, "static_map.pcd"),
                               mrvm)
        if combined:
            pcd_io.write_pcd(os.path.join(out_dir, "whole_map.pcd"),
                             np.vstack(combined))

    def submap_poses(self) -> List[np.ndarray]:
        return [s.global_pose for s in self.trajectory]

    def frame_poses(self) -> List[np.ndarray]:
        return [f.global_pose for s in self.trajectory for f in s.frames]
