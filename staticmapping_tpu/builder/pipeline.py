"""Device-resident chunked front end — the P1 pipeline layer.

The reference hides per-scan latency with three pipelined threads and
queues (SURVEY §2.9 P1: data_collector.cc:40-41, map_builder.cc:103-109).
On TPU the equivalent bottleneck is the host↔device round trip: a host
loop that syncs every scan pays a full dispatch+readback latency per scan
(tens of ms through a remote-TPU tunnel), even when the device work is
~1 ms.  The TPU-native answer is to move the WHOLE front-end state machine
on device and advance it K scans per dispatch:

  * state (ICP target + normals, pose_target, CTRV velocities) lives on
    device as a pytree,
  * one ``lax.scan`` over a ``[K, …]`` scan stack runs filter chain →
    motion compensation → point-to-plane ICP → motion filter → keyframe
    target switch for K scans in ONE jitted call,
  * the host reads back only ``[K]`` poses/scores/flags per chunk (one
    sync), slices keyframe clouds out of the stacked device output in one
    fused gather, and re-bases the device pose state with float64 host
    arithmetic between chunks (folded into the next chunk's dispatch) so
    f32 on device only ever sees chunk-local (≤ tens of metres)
    coordinates.

Semantics parity with the sequential front end (frontend.py, which itself
mirrors map_builder.cc:260-397), with documented deviations:
  * CTRV velocity comes from the last two poses (the host extrapolator
    keeps a ~1 s pose queue, pose_extrapolator.cc:216-240);
  * stale (out-of-order) scans are not handled — chunks are in-order;
  * scan stamps are carried as f32 seconds (sub-ms resolution for
    hour-scale recordings).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Callable, List, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..common import np_se3, prof, se3
from ..data.cloud import PAD_COORD, NormalCloud, PointCloud
from ..ops.normals import estimate_normals
from ..registration.icp_fast import align_point_to_plane
from .frame import Frame
from .frontend import FrontEndOptions, _target_normals


# ---------------------------------------------------------------------------
# Host→device scan packing.  The remote-TPU tunnel moves data at only
# ~40-60 MB/s with ~50 ms per-transfer latency (measured r05), so shipping a
# chunk as separate f32 xyz/intensity/mask arrays (~10.5 MB, 5 calls) costs
# more than the whole chunk's device compute.  Scans are therefore packed on
# the host into ONE int16 array of 8 bytes/point — xyz quantized at 1/256 m
# (±128 m range, 4 mm resolution: below LiDAR noise), intensity at 1/64 —
# plus one tiny f32 meta row per scan, and dequantized inside the chunk jit.
# A 1-worker stage thread runs the pack + transfer so H2D overlaps the
# previous chunk's device program.
# ---------------------------------------------------------------------------
_QXYZ = 256.0     # 1/256 m xyz resolution, ±127.9 m range
_QINT = 64.0      # 1/64 intensity resolution, ±511 range


# max IMU samples carried per scan slot (100-200 Hz IMU vs 10 Hz scans
# → 10-20 samples; 32 covers slow scan rates)
_IMU_PER_SCAN = 32


def _pack_chunk(buf, base_stamp: float, K: int, cap: int, imu=None):
    """[(stamp, points)] → (int16 [K, cap, 4], f32 [K, 4] meta,
    f32 [K, J, 4] imu).

    meta rows: (chunk-relative stamp, n_valid, valid flag, 0).
    imu rows per scan: (dt_sample, wx, wy, wz) for the gyro samples in
    (prev_stamp, stamp], zero-padded (dt 0 = no sample)."""
    q = np.zeros((K, cap, 4), dtype=np.int16)
    meta = np.zeros((K, 4), dtype=np.float32)
    imu_out = np.zeros((K, _IMU_PER_SCAN, 4), dtype=np.float32)
    for i, (st, pts) in enumerate(buf):
        n = min(len(pts), cap)
        q[i, :n, :3] = np.clip(np.round(pts[:n, :3] * _QXYZ),
                               -32767, 32767)
        if pts.shape[1] > 3:
            q[i, :n, 3] = np.clip(np.round(pts[:n, 3] * _QINT),
                                  -32767, 32767)
        meta[i, 0] = st - base_stamp
        meta[i, 1] = n
        meta[i, 2] = 1.0
        if imu is not None and imu[i]:
            rows = imu[i][-_IMU_PER_SCAN:]
            imu_out[i, :len(rows)] = rows
    return q, meta, imu_out


def _unpack_chunk(qdata: jax.Array, meta: jax.Array):
    """Device-side dequantize: int16 chunk → (stamps, xyz, inten, mask,
    valid) in the layout the scan step consumes."""
    cap = qdata.shape[1]
    counts = meta[:, 1]
    mask = (jnp.arange(cap, dtype=jnp.float32)[None, :]
            < counts[:, None])                            # [K, cap]
    xyz = qdata[..., :3].astype(jnp.float32) * (1.0 / _QXYZ)
    xyz = jnp.where(mask[..., None], xyz, PAD_COORD)
    inten = qdata[..., 3].astype(jnp.float32) * (1.0 / _QINT)
    return meta[:, 0], xyz, inten, mask, meta[:, 2] > 0.0


def _matcher_pack(opts: "FrontEndOptions"):
    """(make_target, align) device functions for the configured matcher.

    The chunked front end is matcher-agnostic: the scan step only needs a
    target-build function (run inside the keyframe-switch ``lax.cond``)
    and an align function — all three reference matcher families that are
    lax-native plug in (interface.cc:139-173 registry):

      type 6  IcpFast      normals target + point-to-plane ICP
      type 5  Ndt          voxel-Gaussian field + GN on NDT weights
      type 3  NdtWithGicp  NDT coarse stage chained into GICP refine
              (ndt_gicp.cc:55-112: voxel filter 0.2, NDT res 1.0 /
              eps 0.01 / 35 iters, ndt_score <= gate keeps the guess,
              GICP 35 iters)
    """
    t = opts.matcher_type
    if t == 6:
        def make_target(src: PointCloud):
            return estimate_normals(src.compact(),
                                    leaf_size=opts.target_leaf_size)

        def align(src, target, guess):
            return align_point_to_plane(
                src, target, guess,
                dist_outlier_ratio=opts.dist_outlier_ratio,
                max_iteration=opts.max_iteration, tile=opts.nn_tile)
        return make_target, align
    if t == 5:
        from ..registration.ndt import align_ndt, build_ndt_map

        def make_target(src: PointCloud):
            return build_ndt_map(src, 1.0, min_points=4)

        def align(src, target, guess):
            return align_ndt(src, target, guess,
                             max_iteration=min(opts.max_iteration, 35))
        return make_target, align
    if t == 3:
        from ..ops.voxel import voxel_downsample
        from ..registration.gicp import align_gicp, compute_point_normals
        from ..registration.ndt import align_ndt, build_ndt_map
        ndt_min_score = 0.2            # NdtWithGicp.ndt_min_score

        def make_target(src: PointCloud):
            f = voxel_downsample(src, 0.2)
            return (build_ndt_map(f, 1.0, min_points=4),
                    compute_point_normals(f, k=20))

        def align(src, target, guess):
            ndt_map, tgt_gicp = target
            srcf = voxel_downsample(src, 0.2)
            T_ndt, s_ndt = align_ndt(srcf, ndt_map, guess,
                                     max_iteration=35)
            # NDT-diverged → keep the caller's guess (ndt_gicp.cc:106-109)
            ndt_guess = jnp.where(s_ndt >= ndt_min_score, T_ndt, guess)
            src_g = compute_point_normals(srcf, k=20)
            return align_gicp(src_g, tgt_gicp, ndt_guess,
                              max_iteration=35)
        return make_target, align
    raise ValueError(
        f"pipelined front end supports matcher types 3/5/6 — got {t} "
        "(type 1 IcpUsingPointMatcher stays on the sequential path)")


class _FeState(NamedTuple):
    target: NormalCloud          # current matcher target (pytree; type
    #                              depends on matcher: NormalCloud /
    #                              NdtMap / (NdtMap, GicpCloud))
    pose_target: jax.Array       # [4, 4] chunk-local
    prev_pose: jax.Array         # [4, 4] chunk-local (newest pose)
    prev_stamp: jax.Array        # scalar f32 (absolute seconds)
    vel_lin: jax.Array           # [3] world-frame m/s
    vel_ang: jax.Array           # [3] euler rad/s
    has_velocity: jax.Array      # bool


def _make_step(chain: Optional[Callable], opts: FrontEndOptions):
    """Build the single-scan device step."""
    mf = opts.motion_filter
    make_target, align_fn = _matcher_pack(opts)

    def step(state: _FeState, scan):
        stamp, xyz, inten, mask, valid, imu = scan
        n_valid = jnp.maximum(jnp.sum(mask), 1)
        factor = jnp.where(
            mask, jnp.cumsum(mask.astype(jnp.float32)) - 1.0, 0.0) / n_valid
        pc = PointCloud(xyz=xyz, intensity=inten, factor=factor, mask=mask)
        if chain is not None:
            pc = chain(pc)

        # CTRV extrapolation (pose_extrapolator.cc:177-197).  The predicted
        # step is clamped (translation ≤ 5 m, rotation ≤ 0.5 rad per scan):
        # one bad alignment otherwise poisons the velocity, whose wild next
        # guess throws ICP fully out of its basin — a divergence feedback
        # the sequential host loop is equally exposed to but that the
        # clamp cuts off.
        dt = jnp.maximum(stamp - state.prev_stamp, 0.0)
        ang = state.vel_ang * dt
        # IMU mode (pose_extrapolator.cc:177-197 / imu_tracker.cc:39-47
        # re-expressed on device): the rotation prediction comes from the
        # gyro integral over this scan interval instead of the CTRV yaw
        # rate — per-scan samples ride in with the chunk as (dt, ω) rows.
        # Translation stays CTRV (the reference also takes linear motion
        # from scan matching; accel only tracks gravity).  Scans with no
        # samples fall back to CTRV per scan (input fault tolerance).
        if opts.use_imu:
            gyro_ang = jnp.sum(imu[:, 1:4] * imu[:, 0:1], axis=0)
            has_imu = jnp.sum(imu[:, 0]) > 0
            ang = jnp.where(has_imu, gyro_ang, ang)
        ang_n = jnp.linalg.norm(ang)
        ang = ang * (jnp.minimum(ang_n, 0.5) / jnp.maximum(ang_n, 1e-9))
        step_t = state.vel_lin * dt
        t_n = jnp.linalg.norm(step_t)
        step_t = step_t * (jnp.minimum(t_n, 5.0) / jnp.maximum(t_n, 1e-9))
        dR = se3.euler_to_matrix(ang)
        pred = state.prev_pose.at[:3, :3].set(
            state.prev_pose[:3, :3] @ dR).at[:3, 3].add(step_t)
        pred = jnp.where(state.has_velocity, pred, state.prev_pose)
        guess = se3.inverse(state.pose_target) @ pred

        # per-scan motion for compensation (== accum⁻¹·guess of the host
        # front end: both are the predicted scan-to-scan delta)
        delta = se3.inverse(state.prev_pose) @ pred
        src = pc.motion_compensate(delta) if opts.motion_compensation else pc
        T, score = align_fn(src, state.target, guess)
        if opts.motion_compensation and opts.use_average:
            T = se3.average_transforms(jnp.stack([T, guess]))
        pose_source = se3.normalize_rotation(state.pose_target @ T)
        if opts.motion_compensation:
            src = pc.motion_compensate(se3.inverse(state.prev_pose)
                                       @ pose_source)

        # CTRV velocity from the last pose pair
        vel_ok = dt > 1e-6
        new_vel_lin = jnp.where(
            vel_ok, (pose_source[:3, 3] - state.prev_pose[:3, 3])
            / jnp.maximum(dt, 1e-6), state.vel_lin)
        rel_R = state.prev_pose[:3, :3].T @ pose_source[:3, :3]
        new_vel_ang = jnp.where(
            vel_ok, se3.matrix_to_euler(rel_R) / jnp.maximum(dt, 1e-6),
            state.vel_ang)

        # motion filter (map_builder.cc:369-392): T is target-relative ==
        # accumulated motion since the last keyframe
        accu_t = jnp.linalg.norm(T[:3, 3])
        eul = se3.matrix_to_euler(T[:3, :3])
        accu_a = jnp.sum(jnp.abs(eul)) * (180.0 / jnp.pi)
        is_kf = (accu_t >= mf.translation_range) | (
            (mf.angle_range > 1e-3) & (accu_a >= mf.angle_range))

        new_target = jax.lax.cond(
            is_kf,
            lambda _: make_target(src),
            lambda _: state.target, None)
        new_pose_target = jnp.where(is_kf, pose_source, state.pose_target)

        new_state = _FeState(
            target=new_target, pose_target=new_pose_target,
            prev_pose=pose_source, prev_stamp=stamp,
            vel_lin=new_vel_lin, vel_ang=new_vel_ang,
            has_velocity=jnp.asarray(True))
        # padded chunk slots pass the state through untouched
        new_state = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(valid, (1,) * new.ndim) if new.ndim else valid,
                new, old),
            new_state, state)
        return new_state, (pose_source, score, is_kf & valid, src)

    return step


@partial(jax.jit, static_argnames=("idxs",))
def _gather_frames(stacked: PointCloud, idxs: Tuple[int, ...]):
    """Slice keyframe clouds out of the stacked chunk output — one
    dispatch for all of them."""
    return tuple(jax.tree.map(lambda x: x[i], stacked) for i in idxs)


class DeviceFrontEnd:
    """Chunked device-resident front end.

    Same role as :class:`~staticmapping_tpu.builder.frontend.FrontEnd` but
    ``process`` buffers scans and returns a LIST of keyframes whenever a
    chunk of ``chunk_size`` scans completes (call :meth:`flush` at end of
    stream).  Host keeps a float64 base pose; the device works
    chunk-locally in f32 and is re-based between chunks.
    """

    def __init__(self, options: FrontEndOptions = None,
                 filter_chain: Optional[Callable] = None,
                 chunk_size: int = 16, queue_depth: int = 2):
        self.options = options or FrontEndOptions()
        self.chunk_size = chunk_size
        self.filter_chain = filter_chain
        self._step = _make_step(filter_chain, self.options)
        self._target_jit = jax.jit(_matcher_pack(self.options)[0])
        self._run_chunk = jax.jit(self._chunk_fn)
        self._chain_jit = (jax.jit(filter_chain.__call__)
                           if filter_chain is not None else None)
        self.base = np.eye(4)            # f64 global pose of the device frame
        self.state: Optional[_FeState] = None
        self._base_stamp = 0.0           # absolute stamp of chunk frame
        self.num_scans = 0
        self.last_score = 1.0
        self._buf: List[Tuple[float, np.ndarray]] = []
        # Three-stage pipeline:
        #   _staged   — chunks whose pack+H2D runs on the stage thread; the
        #               oldest is dispatched when the NEXT chunk fills, so
        #               the transfer gets a full period to overlap device
        #               compute (tunnel H2D ≈ chunk compute time)
        #   _inflight — dispatched device programs awaiting harvest; depth
        #               ``queue_depth`` = double buffering of outputs.
        # The inter-chunk rebase runs ON DEVICE (from the state's own
        # prev_pose) so dispatching chunk k+1 needs no host value from
        # chunk k; the host still composes the global base in f64 at
        # harvest time.
        self.queue_depth = max(1, queue_depth)
        self._inflight: List[tuple] = []   # (stamps_abs, valid, poses, scores, kf, sources)
        self._staged: List[tuple] = []     # (stamps_abs, valid, future)
        self._stage_pool = ThreadPoolExecutor(max_workers=1)
        # IMU routing (use_imu): gyro samples buffered on the host and
        # shipped with each chunk, partitioned per scan interval
        self.use_imu = bool(getattr(self.options, "use_imu", False))
        self._imu_buf: List[tuple] = []    # (stamp, wx, wy, wz) sorted
        self._prev_scan_stamp: Optional[float] = None

    # ------------------------------------------------------------------
    def add_imu(self, stamp: float, angular_velocity) -> None:
        """Buffer one gyro sample (InsertImuMsg route for the chunked
        front end — the host extrapolator path needs per-scan sync)."""
        w = np.asarray(angular_velocity, dtype=np.float64)
        self._imu_buf.append((float(stamp), w[0], w[1], w[2]))

    def _take_imu(self, scan_stamps: List[float]):
        """Partition buffered samples into per-scan (dt, ω) row lists for
        the intervals (prev_scan, scan]."""
        out = []
        prev = self._prev_scan_stamp
        buf = self._imu_buf
        j = 0
        for st in scan_stamps:
            rows = []
            last_t = prev if prev is not None else (buf[j][0] - 1e-3
                                                    if j < len(buf) else st)
            while j < len(buf) and buf[j][0] <= st:
                t, wx, wy, wz = buf[j]
                rows.append((max(t - last_t, 0.0), wx, wy, wz))
                last_t = t
                j += 1
            out.append(rows)
            prev = st
        self._imu_buf = buf[j:]
        self._prev_scan_stamp = scan_stamps[-1] if scan_stamps else prev
        return out

    # ------------------------------------------------------------------
    def _chunk_fn(self, state: _FeState, qdata, meta, imu_arr):
        # dequantize the packed int16 chunk on device (see _pack_chunk)
        stamps, xyz, inten, mask, valid = _unpack_chunk(qdata, meta)
        # device-side rebase into the frame of the newest pose: keeps all
        # chunk-local coordinates small so f32 never sees absolute drift.
        # (B is at most one chunk of motion away from the previous rebase,
        # so the f32 inverse costs ~1e-5 m; the f64 global base on the host
        # absorbs the long-horizon accumulation at harvest time.)
        rebase_inv = se3.inverse(se3.normalize_rotation(state.prev_pose))
        state = state._replace(
            pose_target=rebase_inv @ state.pose_target,
            prev_pose=jnp.eye(4, dtype=jnp.float32),
            # vel_lin is a chunk-frame vector — rotate it into the new
            # chunk frame (vel_ang is body-relative, frame-invariant)
            vel_lin=rebase_inv[:3, :3] @ state.vel_lin)
        return jax.lax.scan(self._step, state,
                            (stamps, xyz, inten, mask, valid, imu_arr))

    def _pad_cloud(self, points: np.ndarray):
        cap = self.options.scan_capacity
        n = min(len(points), cap)
        xyz = np.full((cap, 3), PAD_COORD, dtype=np.float32)
        xyz[:n] = points[:n, :3]
        inten = np.zeros((cap,), dtype=np.float32)
        if points.shape[1] > 3:
            inten[:n] = points[:n, 3]
        mask = np.zeros((cap,), dtype=bool)
        mask[:n] = True
        return xyz, inten, mask

    def process(self, stamp: float, points: np.ndarray) -> List[Frame]:
        """Feed one scan; returns keyframes completed so far (possibly
        empty; they arrive in bursts at chunk boundaries)."""
        self.num_scans += 1
        points = np.asarray(points)
        if self.state is None:
            # first scan: becomes target + first keyframe at identity
            # (map_builder.cc:281-293)
            xyz, inten, mask = self._pad_cloud(points)
            pc = PointCloud(xyz=jnp.asarray(xyz),
                            intensity=jnp.asarray(inten),
                            factor=jnp.zeros_like(jnp.asarray(inten)),
                            mask=jnp.asarray(mask))
            if self._chain_jit is not None:
                pc = self._chain_jit(pc)
            target = self._target_jit(pc)
            eye = jnp.eye(4, dtype=jnp.float32)
            self._base_stamp = stamp
            self.state = _FeState(
                target=target, pose_target=eye, prev_pose=eye,
                prev_stamp=jnp.float32(0.0),
                vel_lin=jnp.zeros(3, dtype=jnp.float32),
                vel_ang=jnp.zeros(3, dtype=jnp.float32),
                has_velocity=jnp.asarray(False))
            return [Frame(stamp=stamp, cloud=pc, global_pose=np.eye(4),
                          match_score=1.0)]
        self._buf.append((stamp, points))
        if len(self._buf) < self.chunk_size:
            return []
        return self._dispatch_and_maybe_harvest()

    def flush(self) -> List[Frame]:
        frames: List[Frame] = []
        if self._buf and self.state is not None:
            self._stage_buffered()
        self._pump(force=True)
        while self._inflight:
            frames.extend(self._harvest_one())
        return frames

    # ------------------------------------------------------------------
    def _dispatch_and_maybe_harvest(self) -> List[Frame]:
        with prof.block("FrontEndChunk"):
            self._stage_buffered()
            # dispatch the PREVIOUS staged chunk (its H2D had a full period
            # to complete on the stage thread), keep the newest staging
            self._pump(force=False)
            frames: List[Frame] = []
            while len(self._inflight) >= self.queue_depth:
                frames.extend(self._harvest_one())
            return frames

    def _stage_buffered(self) -> None:
        """Hand the buffered scans to the stage thread: pack to int16 and
        start the H2D transfer off the main thread."""
        K = self.chunk_size
        cap = self.options.scan_capacity
        buf = self._buf
        self._buf = []
        stamps_abs = [st for st, _ in buf]
        valid = np.zeros((K,), dtype=bool)
        valid[:len(buf)] = True
        base = self._base_stamp
        imu = self._take_imu(stamps_abs) if self.use_imu else None

        def job():
            q, meta, imu_arr = _pack_chunk(buf, base, K, cap, imu)
            return jnp.asarray(q), jnp.asarray(meta), jnp.asarray(imu_arr)

        self._staged.append((stamps_abs, valid,
                             self._stage_pool.submit(job)))

    def _pump(self, force: bool) -> None:
        """Dispatch staged chunks in order.  Leaves the newest one staging
        unless ``force`` (flush) — dispatch consumes ``self.state`` so it
        must happen on the main thread, in order."""
        while self._staged and (force or len(self._staged) > 1):
            stamps_abs, valid, fut = self._staged.pop(0)
            qdata, meta, imu_arr = fut.result()
            new_state, (poses, scores, kf, sources) = self._run_chunk(
                self.state, qdata, meta, imu_arr)
            self.state = new_state
            self._inflight.append((stamps_abs, valid, poses, scores, kf,
                                   sources))

    def _harvest_one(self) -> List[Frame]:
        """Block on the OLDEST in-flight chunk's tiny outputs and build its
        keyframes; compose the f64 global base from its final pose."""
        stamps_abs, valid, poses, scores, kf, sources = \
            self._inflight.pop(0)
        K = self.chunk_size
        poses_h = np.asarray(poses, dtype=np.float64)
        scores_h = np.asarray(scores, dtype=np.float64)
        kf_h = np.asarray(kf)
        if np.any(valid):
            self.last_score = float(scores_h[valid][-1])

        # ---- keyframes: fused gather of their clouds (always all K
        # slots — ONE static pattern, so the jit never retraces on
        # different keyframe masks) ----
        kf_idx = tuple(int(i) for i in np.nonzero(kf_h)[0])
        frames: List[Frame] = []
        if kf_idx:
            all_clouds = _gather_frames(sources, tuple(range(K)))
            clouds = [all_clouds[i] for i in kf_idx]
            for i, cl in zip(kf_idx, clouds):
                frames.append(Frame(
                    stamp=float(stamps_abs[i]),
                    cloud=cl,
                    global_pose=np_se3.normalize_rotation(
                        self.base @ poses_h[i]),
                    match_score=float(scores_h[i])))

        # ---- global base: f64 on host (the device already rebased its own
        # state to this chunk's final pose at the NEXT chunk's start) ----
        last = int(np.nonzero(np.asarray(valid))[0][-1])
        B = np_se3.normalize_rotation(poses_h[last])
        self.base = np_se3.normalize_rotation(self.base @ B)
        return frames
