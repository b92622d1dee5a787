"""Synthetic LiDAR world + scan simulator.

There is no KITTI data in this environment (zero egress), so end-to-end tests
and benchmarks drive the pipeline with simulated urban-like scans along a
known trajectory; ATE against the simulator's ground truth replaces the
reference's evo-based evaluation (doc/kitti_evaluation.md) until real data is
mounted.
"""
from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from ..common import np_se3


@dataclasses.dataclass
class World:
    points: np.ndarray  # [M, 3] global structure points


def make_world(seed: int = 0, extent: float = 120.0,
               n_buildings: int = 150, density: float = 12.0) -> World:
    """Urban-ish world: box buildings + poles. Ground is sampled
    procedurally per scan in :func:`render_scan` (real LiDAR sees dense
    near-field ground; a fixed global carpet would be far too sparse)."""
    rng = np.random.default_rng(seed)
    pts = []
    for _ in range(n_buildings):
        cx, cy = rng.uniform(-extent * 0.9, extent * 0.9, 2)
        w, d = rng.uniform(6, 20, 2)
        h = rng.uniform(4, 15)
        n_wall = int((2 * (w + d) * h) * density / 6)
        side = rng.integers(0, 4, n_wall)
        u = rng.uniform(0, 1, n_wall)
        z = rng.uniform(0, h, n_wall)
        x = np.where(side == 0, cx - w / 2,
             np.where(side == 1, cx + w / 2, cx - w / 2 + u * w))
        y = np.where(side == 0, cy - d / 2 + u * d,
             np.where(side == 1, cy - d / 2 + u * d,
              np.where(side == 2, cy - d / 2, cy + d / 2)))
        pts.append(np.column_stack([x, y, z]))
    # poles
    for _ in range(n_buildings // 2):
        cx, cy = rng.uniform(-extent, extent, 2)
        z = rng.uniform(0, 4, 40)
        pts.append(np.column_stack([
            np.full(40, cx) + rng.normal(0, 0.02, 40),
            np.full(40, cy) + rng.normal(0, 0.02, 40), z]))
    return World(points=np.vstack(pts).astype(np.float32))


def figure_eight_trajectory(n_poses: int, radius: float = 60.0,
                            speed_noise: float = 0.0,
                            seed: int = 1) -> List[np.ndarray]:
    """Ground-truth sensor poses along a figure-eight (exercises loop
    closures: the crossing point is revisited)."""
    ts = np.linspace(0, 2 * np.pi, n_poses, endpoint=False)
    xs = radius * np.sin(ts)
    ys = radius * np.sin(ts) * np.cos(ts)
    poses = []
    for i in range(n_poses):
        # heading from derivative
        dx = radius * np.cos(ts[i])
        dy = radius * (np.cos(ts[i]) ** 2 - np.sin(ts[i]) ** 2)
        yaw = np.arctan2(dy, dx)
        R = np_se3.euler_to_matrix(np.array([0.0, 0.0, yaw]))
        t = np.array([xs[i], ys[i], 1.8])
        poses.append(np_se3.from_rt(R, t))
    return poses


def square_loop_trajectory(side_steps: int = 10, step: float = 1.0,
                           corner_steps: int = 12, overlap: int = 4
                           ) -> List[np.ndarray]:
    """Closed square loop returning to (and passing) the start — the
    loop-closure test trajectory."""
    poses = []
    x, y, yaw = 0.0, 0.0, 0.0
    total = 4 * (side_steps + corner_steps) + overlap
    leg = 0
    step_in_leg = 0
    for _ in range(total):
        R = np_se3.euler_to_matrix(np.array([0.0, 0.0, yaw]))
        poses.append(np_se3.from_rt(R, np.array([x, y, 1.8])))
        in_corner = step_in_leg >= side_steps
        if in_corner:
            yaw += (np.pi / 2) / corner_steps
        x += step * np.cos(yaw)
        y += step * np.sin(yaw)
        step_in_leg += 1
        if step_in_leg >= side_steps + corner_steps:
            step_in_leg = 0
            leg += 1
    return poses


def straight_trajectory(n_poses: int, step: float = 1.0,
                        yaw_rate: float = 0.0) -> List[np.ndarray]:
    poses = []
    x, y, yaw = 0.0, 0.0, 0.0
    for _ in range(n_poses):
        R = np_se3.euler_to_matrix(np.array([0.0, 0.0, yaw]))
        poses.append(np_se3.from_rt(R, np.array([x, y, 1.8])))
        x += step * np.cos(yaw)
        y += step * np.sin(yaw)
        yaw += yaw_rate
    return poses


def render_scan(world: World, pose: np.ndarray, max_range: float = 70.0,
                max_points: int = 20000, noise: float = 0.005,
                seed: int = 0, ground_fraction: float = 0.4,
                ground_range: float = 35.0) -> np.ndarray:
    """Points visible from ``pose``, in the sensor frame, with noise.

    Structure points come from the world (shared across scans); ground points
    are procedurally sampled fresh each scan in a near-field disc with a
    1/r-ish density profile — like a spinning LiDAR. (ICP matches surfaces,
    not identical points, so fresh ground samples are realistic.)
    (Simplified visibility: range cut + random subsample, no occlusion.)"""
    rng = np.random.default_rng(seed)
    n_ground = int(max_points * ground_fraction)
    n_struct = max_points - n_ground

    d = world.points - pose[:3, 3][None, :]
    r2 = np.sum(d * d, axis=1)
    sel = np.flatnonzero(r2 < max_range * max_range)
    if len(sel) > n_struct:
        sel = rng.choice(sel, size=n_struct, replace=False)
        sel.sort()
    pts_global = world.points[sel]

    # procedural ground: radius ~ sqrt-uniform biased near the sensor
    r = ground_range * rng.uniform(0.02, 1.0, n_ground) ** 0.7
    theta = rng.uniform(0, 2 * np.pi, n_ground)
    gx = pose[0, 3] + r * np.cos(theta)
    gy = pose[1, 3] + r * np.sin(theta)
    ground_global = np.column_stack([gx, gy, np.zeros(n_ground)])

    pts_global = np.vstack([pts_global, ground_global])
    Rinv = pose[:3, :3].T
    local = (pts_global - pose[:3, 3][None, :]) @ Rinv.T
    local = local + rng.normal(0, noise, local.shape)
    inten = rng.uniform(0, 1, (local.shape[0], 1)).astype(np.float32)
    out = np.concatenate([local.astype(np.float32), inten], axis=1)
    perm = rng.permutation(out.shape[0])
    return out[perm]


def make_sequence(n_scans: int = 50, seed: int = 0, trajectory: str = "straight",
                  step: float = 1.0, yaw_rate: float = 0.0,
                  max_points: int = 20000, max_range: float = 70.0
                  ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Returns (scans [each [N,4] sensor-frame], gt_poses)."""
    world = make_world(seed=seed)
    if trajectory == "straight":
        poses = straight_trajectory(n_scans, step=step, yaw_rate=yaw_rate)
    elif trajectory == "eight":
        poses = figure_eight_trajectory(n_scans)
    elif trajectory == "square":
        poses = square_loop_trajectory(step=step)[:n_scans] \
            if n_scans else square_loop_trajectory(step=step)
    else:
        raise ValueError(trajectory)
    scans = [render_scan(world, p, seed=seed + 17 * i, max_points=max_points,
                         max_range=max_range)
             for i, p in enumerate(poses)]
    return scans, poses
