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


class _FeState(NamedTuple):
    target: NormalCloud          # current ICP target (+normals)
    pose_target: jax.Array       # [4, 4] chunk-local
    prev_pose: jax.Array         # [4, 4] chunk-local (newest pose)
    prev_stamp: jax.Array        # scalar f32 (absolute seconds)
    vel_lin: jax.Array           # [3] world-frame m/s
    vel_ang: jax.Array           # [3] euler rad/s
    has_velocity: jax.Array      # bool


def _make_step(chain: Optional[Callable], opts: FrontEndOptions):
    """Build the single-scan device step."""
    mf = opts.motion_filter

    def step(state: _FeState, scan):
        stamp, xyz, inten, mask, valid = scan
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
        T, score = align_point_to_plane(
            src, state.target, guess,
            dist_outlier_ratio=opts.dist_outlier_ratio,
            max_iteration=opts.max_iteration, tile=opts.nn_tile)
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
            lambda _: estimate_normals(src.compact(),
                                       leaf_size=opts.target_leaf_size),
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
        self._run_chunk = jax.jit(self._chunk_fn)
        self._chain_jit = (jax.jit(filter_chain.__call__)
                           if filter_chain is not None else None)
        self.base = np.eye(4)            # f64 global pose of the device frame
        self.state: Optional[_FeState] = None
        self._base_stamp = 0.0           # absolute stamp of chunk frame
        self.num_scans = 0
        self.last_score = 1.0
        self._buf: List[Tuple[float, np.ndarray]] = []
        # deferred-harvest queue: dispatched chunks whose outputs have not
        # been read back yet.  Depth 2 = double buffering: while the device
        # crunches chunk k the host packs and dispatches chunk k+1, and only
        # then blocks on chunk k's tiny outputs.  The inter-chunk rebase
        # runs ON DEVICE (from the state's own prev_pose) so dispatching
        # chunk k+1 needs no host value from chunk k; the host still
        # composes the global base in f64 at harvest time.
        self.queue_depth = max(1, queue_depth)
        self._inflight: List[tuple] = []   # (stamps_abs, poses, scores, kf, sources)

    # ------------------------------------------------------------------
    def _chunk_fn(self, state: _FeState, stamps, xyz, inten, mask, valid):
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
                            (stamps, xyz, inten, mask, valid))

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
            target = _target_normals(pc,
                                     leaf_size=self.options.target_leaf_size)
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
            self._dispatch_buffered()
        while self._inflight:
            frames.extend(self._harvest_one())
        return frames

    # ------------------------------------------------------------------
    def _dispatch_and_maybe_harvest(self) -> List[Frame]:
        with prof.block("FrontEndChunk"):
            self._dispatch_buffered()
            frames: List[Frame] = []
            while len(self._inflight) >= self.queue_depth:
                frames.extend(self._harvest_one())
            return frames

    def _dispatch_buffered(self) -> None:
        """Pack + dispatch the buffered scans; returns immediately (JAX
        async dispatch) — outputs are read in :meth:`_harvest_one`."""
        K = self.chunk_size
        cap = self.options.scan_capacity
        stamps = np.zeros((K,), dtype=np.float32)
        xyz = np.full((K, cap, 3), PAD_COORD, dtype=np.float32)
        inten = np.zeros((K, cap), dtype=np.float32)
        mask = np.zeros((K, cap), dtype=bool)
        valid = np.zeros((K,), dtype=bool)
        for i, (st, pts) in enumerate(self._buf):
            x, it, mk = self._pad_cloud(pts)
            stamps[i] = st - self._base_stamp
            xyz[i], inten[i], mask[i] = x, it, mk
            valid[i] = True
        stamps_abs = [st for st, _ in self._buf]
        self._buf = []

        new_state, (poses, scores, kf, sources) = self._run_chunk(
            self.state, jnp.asarray(stamps), jnp.asarray(xyz),
            jnp.asarray(inten), jnp.asarray(mask), jnp.asarray(valid))
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
