"""Keyframe / submap containers.

Parity with the reference hierarchy frames → submaps → trajectory
(builder/frame.h:33-63, builder/submap.h:41-51, builder/trajectory.h:57-79).
Clouds live on device as fixed-capacity ``PointCloud``s; poses are host
float64 (like the reference's Eigen::Matrix4d bookkeeping).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..common import np_se3, se3
from ..data.cloud import PointCloud, concat as cloud_concat
from ..ops import voxel as voxel_ops


def _merge_body(xyz, intensity, factor, mask, local_poses, capacity: int,
                voxel_size, voxel_mode):
    """Single-submap merge on stacked arrays ``[F, N, ...]`` + poses
    ``[F, 4, 4]`` → merged PointCloud of ``capacity``."""
    pts = se3.apply(local_poses, xyz)     # [F, N, 3], T broadcast over N
    flat = PointCloud(
        xyz=pts.reshape(-1, 3),
        intensity=intensity.reshape(-1),
        factor=factor.reshape(-1),
        mask=mask.reshape(-1),
    )
    if flat.capacity > capacity:
        # only when truncating does valid-first order matter — compact is
        # a full sort cascade, skip it when everything fits
        flat = flat.compact()
    merged = PointCloud(
        xyz=flat.xyz[:capacity],
        intensity=flat.intensity[:capacity],
        factor=flat.factor[:capacity],
        mask=flat.mask[:capacity])
    if voxel_mode is not None:
        merged = voxel_ops.voxel_downsample(merged, voxel_size,
                                            mode=voxel_mode)
    return merged


@partial(jax.jit, static_argnames=("capacity", "voxel_mode"))
def _merge_frames(clouds, local_poses, capacity: int, voxel_size,
                  voxel_mode):
    """Fused submap merge (Submap::InsertFrame merge step, submap.cc:98-162):
    transform every frame's cloud into the submap-local frame, flatten,
    compact to ``capacity``, optional voxel filter — ONE device dispatch.

    clouds: tuple of per-frame ``PointCloud``s (stacked inside the jit so
    the host loop issues no eager ops), local_poses [F, 4, 4];
    ``voxel_mode`` None disables the voxel filter."""
    return _merge_body(
        jnp.stack([c.xyz for c in clouds]),
        jnp.stack([c.intensity for c in clouds]),
        jnp.stack([c.factor for c in clouds]),
        jnp.stack([c.mask for c in clouds]),
        local_poses, capacity, voxel_size, voxel_mode)


@partial(jax.jit, static_argnames=("n_frames", "capacity", "voxel_mode"))
def _batch_merge_frames(clouds_flat, local_poses, n_frames: int,
                        capacity: int, voxel_size, voxel_mode):
    """Merge S submaps of ``n_frames`` frames each in ONE vmapped dispatch
    (the per-submap ``_merge_frames`` dispatch costs ~5-7 ms through the
    remote-TPU tunnel — ×16 per flush that was the single biggest
    non-front-end block, r05 breakdown).

    clouds_flat: tuple of S·F per-frame ``PointCloud``s in submap-major
    order; local_poses ``[S, F, 4, 4]``.  Returns a TUPLE of S merged
    ``PointCloud``s — the unstack happens inside this jit (eager per-leaf
    slicing would cost one tunnel dispatch per leaf per submap)."""
    def stack(leaves):
        s = jnp.stack(leaves)                        # [S*F, N, ...]
        return s.reshape((-1, n_frames) + s.shape[1:])

    xyz = stack([c.xyz for c in clouds_flat])
    intensity = stack([c.intensity for c in clouds_flat])
    factor = stack([c.factor for c in clouds_flat])
    mask = stack([c.mask for c in clouds_flat])
    merged = jax.vmap(
        lambda x, i, f, m, p: _merge_body(x, i, f, m, p, capacity,
                                          voxel_size, voxel_mode)
    )(xyz, intensity, factor, mask, local_poses)
    s_count = len(clouds_flat) // n_frames
    return tuple(jax.tree.map(lambda x, k=k: x[k], merged)
                 for k in range(s_count))


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
    coordinate system (Submap::InsertFrame, builder/submap.cc:76-163).

    Disk offload parity (submap.cc:197-236 + memory_manager.cc:51-62):
    when ``options.enable_disk_saving`` and a save dir is attached, the
    merged cloud can be written to disk and dropped from device/host RAM
    (:meth:`offload`), transparently reloading on the next ``.cloud``
    access (``Submap::Cloud`` reload-on-access, submap.cc:217-222)."""

    def __init__(self, submap_id: int, options: SubmapOptions,
                 capacity: int, save_dir: Optional[str] = None):
        self.id = submap_id
        self.options = options
        self.capacity = capacity
        self.frames: List[Frame] = []
        self.global_pose: np.ndarray = np.eye(4)   # pose of first frame
        self._cloud: Optional[PointCloud] = None   # merged, submap-local
        self.descriptor: Optional[np.ndarray] = None
        self.match_transform_to_next: Optional[np.ndarray] = None
        self.match_score_to_previous: float = 1.0
        self.stamp: float = 0.0
        # sensor tags interpolated at the submap stamp
        # (SetRelatedGpsInENU / SetRelatedOdom, map_builder.cc:690-701)
        self.related_gps_enu: Optional[np.ndarray] = None   # [3]
        self.related_odom: Optional[np.ndarray] = None      # [4, 4]
        # disk offload state
        self.save_dir = save_dir
        self.inactive_time: float = 0.0
        self._on_disk = False
        # cached target normals (computed once per submap; reused by the
        # submap-pair matcher AND loop-closure re-registration — normal
        # estimation is a log2(N)-round sort cascade, the single most
        # expensive per-submap device program)
        self._normals = None
        self._normals_leaf: int = -1
        # P2 batching: when True, _finalize leaves the merge to the
        # orchestrator's batched flush (_batch_merge_frames) instead of
        # dispatching one _merge_frames program per submap
        self.defer_merge = False

    # ---------------------------------------------------- normal cache --
    def normal_cloud(self, leaf_size: int):
        """Downsampled submap cloud + normals at ``leaf_size``, cached
        (both back-end consumers use the same leaf size; a different one
        recomputes)."""
        if self._normals is None or self._normals_leaf != leaf_size:
            from .frontend import _target_normals
            self._normals = _target_normals(self.cloud,
                                            leaf_size=leaf_size)
            self._normals_leaf = leaf_size
        return self._normals

    def set_normal_cloud(self, nc, leaf_size: int) -> None:
        """Install externally-computed normals (batched fill path)."""
        self._normals = nc
        self._normals_leaf = leaf_size

    # ------------------------------------------------- cloud + offload --
    @property
    def cloud(self) -> Optional[PointCloud]:
        """Reload-on-access (submap.cc:217-222); touching resets the
        inactivity age."""
        self.inactive_time = 0.0
        if self._cloud is None and self._on_disk:
            self._load_from_disk()
        return self._cloud

    @cloud.setter
    def cloud(self, value: Optional[PointCloud]):
        self._cloud = value

    @property
    def cloud_in_memory(self) -> bool:
        return self._cloud is not None

    def _disk_path(self) -> str:
        import os
        prefix = getattr(self.options, "saving_name_prefix", "s_")
        return os.path.join(self.save_dir, f"{prefix}{self.id}.npz")

    def save_to_disk(self) -> bool:
        """Serialize the merged cloud (SaveToDisk role, submap.cc:197-215;
        format role of cloud_types.cc:180-230 — here a compressed npz of
        the valid points)."""
        if self.save_dir is None or self._cloud is None:
            return False
        import os
        os.makedirs(self.save_dir, exist_ok=True)
        m = np.asarray(self._cloud.mask)
        np.savez(self._disk_path(),
                 stamp=self.stamp,
                 xyz=np.asarray(self._cloud.xyz)[m],
                 intensity=np.asarray(self._cloud.intensity)[m],
                 factor=np.asarray(self._cloud.factor)[m])
        self._on_disk = True
        return True

    def offload(self) -> bool:
        """Write to disk (if not already) and drop the RAM/device copy
        (UpdateInactiveTime path, submap.cc:224-236)."""
        if self._cloud is None:
            return False
        if not self._on_disk and not self.save_to_disk():
            return False
        self._cloud = None
        # drop cached normals with the cloud: they are a full-capacity
        # device-resident NormalCloud (~1 MB each) and would otherwise
        # accumulate unbounded across offloaded submaps, defeating the
        # MemoryManager (normal_cloud() recomputes on demand after reload)
        self._normals = None
        self._normals_leaf = -1
        return True

    def _load_from_disk(self) -> None:
        from ..data import cloud as cloud_lib
        with np.load(self._disk_path()) as z:
            xyz, inten, factor = z["xyz"], z["intensity"], z["factor"]
        pc = cloud_lib.from_numpy(xyz, intensity=inten,
                                  capacity=self.capacity,
                                  stamp_factors=False)
        import jax.numpy as _jnp
        fac = np.zeros((self.capacity,), dtype=np.float32)
        fac[:len(factor)] = factor
        self._cloud = dataclasses.replace(pc, factor=_jnp.asarray(fac))

    def update_inactive_time(self, dt: float) -> Optional[float]:
        """Age the submap; returns the new age (UpdateInactiveTime,
        submap.cc:224-236)."""
        self.inactive_time += dt
        return self.inactive_time

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
        """Merge frames in local coords (+ optional inner MRVM and voxel
        filter) (submap.cc:98-162) — one fused jit dispatch for the merge."""
        if self.options.enable_inner_mrvm:
            # dynamic-object removal inside the submap: ray-cast every
            # frame from its own viewpoint, keep occupied voxels.
            # (The reference builds this map but never outputs it —
            # submap.cc:100-113 ends at "TODO(edward) Output to the
            # cloud"; this is the evident intent, completed.)
            import jax.numpy as _jnp
            from ..data import cloud as cloud_lib
            from .mrvm import MrvmSettings, MultiResolutionVoxelMap
            vm = MultiResolutionVoxelMap(MrvmSettings(
                output_average=True, prob_threshold=0.5))
            for f in self.frames:
                local = f.cloud.transform(_jnp.asarray(f.local_pose,
                                                       dtype=_jnp.float32))
                vm.insert_point_cloud(local, f.local_pose[:3, 3])
            pts = vm.output_to_numpy()
            merged = cloud_lib.from_numpy(
                pts[:self.capacity, :3],
                pts[:self.capacity, 3] if pts.shape[1] > 3 else None,
                capacity=self.capacity, stamp_factors=False)
            if self.options.enable_voxel_filter:
                merged = voxel_ops.voxel_downsample(
                    merged, self.options.voxel_size, mode="round")
            self.cloud = merged
            return
        if self.defer_merge:
            return   # batched flush installs the cloud (install_merged_cloud)
        poses = np.stack([f.local_pose for f in self.frames]
                         ).astype(np.float32)
        self.cloud = _merge_frames(
            tuple(f.cloud for f in self.frames), poses,
            capacity=self.capacity,
            voxel_size=np.float32(self.options.voxel_size),
            voxel_mode="round" if self.options.enable_voxel_filter else None)

    def install_merged_cloud(self, pc: PointCloud) -> None:
        """Install the batch-merged cloud (deferred-merge path)."""
        self._cloud = pc

    def update_inner_frame_poses(self) -> None:
        """Submap::UpdateInnerFramePose parity (submap.cc:268-274): after
        optimization, frame globals follow the submap pose."""
        for f in self.frames:
            f.global_pose = self.global_pose @ f.local_pose


class MemoryManager:
    """Ages submaps and drops inactive clouds to disk
    (builder/memory_manager.{h,cc}: a 1 Hz background thread in the
    reference; here ticked from the insertion loop — same policy, no
    thread).  A submap becomes offloadable once its
    ``match_transform_to_next`` is set (the reference saves at
    SetMatchedTransformedToNext, submap.cc:197-215)."""

    def __init__(self, trajectory: "Trajectory", delay_seconds: float = 30.0,
                 keep_last: int = 2):
        self.trajectory = trajectory
        self.delay = delay_seconds
        self.keep_last = keep_last
        self._last_tick = None

    def tick(self, now: float) -> int:
        """Age + offload; returns how many submaps were offloaded."""
        if self._last_tick is None:
            self._last_tick = now
            return 0
        dt = now - self._last_tick
        if dt <= 0:
            return 0
        self._last_tick = now
        n_off = 0
        cutoff = max(0, len(self.trajectory) - self.keep_last)
        for s in self.trajectory.submaps[:cutoff]:
            if not s.cloud_in_memory or s.match_transform_to_next is None:
                continue
            if s.update_inactive_time(dt) >= self.delay:
                if s.offload():
                    n_off += 1
        return n_off


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
