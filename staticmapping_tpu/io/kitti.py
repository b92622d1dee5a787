"""KITTI odometry I/O.

Parity with the reference's KITTI support:
  * velodyne ``.bin`` reading — N×4 float32, intensity scaled ×255
    (ros_node/kitti_reader.cc:91-121)
  * ``kitti_pose.txt`` export — first 3 rows of the 4×4 pose, 12 numbers per
    line, precision 8 (builder/map_builder.cc:626-641)
"""
from __future__ import annotations

import os
from typing import Iterator, List, Sequence

import numpy as np

# KITTI velodyne nominal scan period (10 Hz)
SCAN_PERIOD = 0.1


def read_bin(path: str, intensity_scale: float = 255.0) -> np.ndarray:
    """Read one velodyne scan → ``[N, 4]`` float32 (x, y, z, intensity)."""
    data = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    out = data.copy()
    out[:, 3] *= intensity_scale
    return out


def list_sequence(velodyne_dir: str) -> List[str]:
    """Sorted .bin paths of a KITTI sequence directory."""
    files = [f for f in os.listdir(velodyne_dir) if f.endswith(".bin")]
    files.sort()
    return [os.path.join(velodyne_dir, f) for f in files]


def iter_scans(velodyne_dir: str, start_stamp: float = 0.0
               ) -> Iterator[tuple]:
    """Yield (stamp, points[N,4]) at the nominal 10 Hz rate
    (KittiReader::ReadNext parity)."""
    for i, path in enumerate(list_sequence(velodyne_dir)):
        yield start_stamp + i * SCAN_PERIOD, read_bin(path)


def write_poses(path: str, poses: Sequence[np.ndarray]) -> None:
    """Write kitti_pose.txt (map_builder.cc:626-641 format)."""
    with open(path, "w") as f:
        for T in poses:
            row = np.asarray(T, dtype=np.float64)[:3, :].reshape(-1)
            f.write(" ".join(f"{v:.8g}" for v in row) + "\n")


def read_poses(path: str) -> np.ndarray:
    """Read a KITTI pose file → ``[N, 4, 4]``."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    n = rows.shape[0]
    out = np.tile(np.eye(4), (n, 1, 1))
    out[:, :3, :] = rows
    return out


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error (RMSE of translation) after optional
    SE(3) Umeyama alignment — the metric evo reports
    (doc/kitti_evaluation.md methodology)."""
    p = est[:, :3, 3]
    q = gt[:, :3, 3]
    n = min(len(p), len(q))
    p, q = p[:n].T, q[:n].T           # [3, N]
    if align and n >= 3:
        mp, mq = p.mean(1, keepdims=True), q.mean(1, keepdims=True)
        pc, qc = p - mp, q - mq
        U, _, Vt = np.linalg.svd(qc @ pc.T)
        S = np.eye(3)
        if np.linalg.det(U @ Vt) < 0:
            S[2, 2] = -1
        R = U @ S @ Vt
        t = mq - R @ mp
        p = R @ p + t
    return float(np.sqrt(np.mean(np.sum((p - q) ** 2, axis=0))))


def rpe(est: np.ndarray, gt: np.ndarray, delta: int = 1):
    """Relative pose error over a fixed frame delta — evo's RPE.

    Returns (trans_rmse [m], rot_rmse [rad]) over all index pairs
    (i, i+delta)."""
    from ..common import np_se3
    n = min(len(est), len(gt))
    terr, rerr = [], []
    for i in range(n - delta):
        rel_est = np_se3.inverse(est[i]) @ est[i + delta]
        rel_gt = np_se3.inverse(gt[i]) @ gt[i + delta]
        e = np_se3.inverse(rel_gt) @ rel_est
        terr.append(np.linalg.norm(e[:3, 3]))
        c = np.clip((np.trace(e[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
        rerr.append(np.arccos(c))
    if not terr:
        return 0.0, 0.0
    return (float(np.sqrt(np.mean(np.square(terr)))),
            float(np.sqrt(np.mean(np.square(rerr)))))
