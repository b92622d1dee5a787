"""NumPy mirror of :mod:`se3` for host-side bookkeeping (pose queues,
extrapolators, trajectory registries). Poses here are float64 like the
reference's ``Eigen::Matrix4d``; device code uses the f32 jnp version.

Quaternions are [w, x, y, z]; euler convention matches common/math.h
(roll=x, pitch=y, yaw=z; R = Rz Ry Rx).
"""
from __future__ import annotations

import numpy as np

_EPS = 1e-15


def quat_normalize(q):
    return q / max(np.linalg.norm(q), _EPS)


def quat_conj(q):
    return q * np.array([1.0, -1, -1, -1])


def quat_mul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_rotate(q, v):
    w, u = q[0], q[1:]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


def quat_to_matrix(q):
    q = quat_normalize(np.asarray(q, dtype=np.float64))
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def matrix_to_quat(m):
    m = np.asarray(m, dtype=np.float64)
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                      (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        q = np.array([(m[2, 1] - m[1, 2]) / s, 0.25 * s,
                      (m[0, 1] + m[1, 0]) / s, (m[0, 2] + m[2, 0]) / s])
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        q = np.array([(m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s,
                      0.25 * s, (m[1, 2] + m[2, 1]) / s])
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        q = np.array([(m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s,
                      (m[1, 2] + m[2, 1]) / s, 0.25 * s])
    if q[0] < 0:
        q = -q
    return quat_normalize(q)


def axis_angle_to_quat(w):
    w = np.asarray(w, dtype=np.float64)
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.array([1.0, 0, 0, 0])
    axis = w / theta
    return np.concatenate([[np.cos(theta / 2)], axis * np.sin(theta / 2)])


def quat_from_two_vectors(a, b):
    """Quaternion rotating a onto b (Eigen FromTwoVectors parity)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na < _EPS or nb < _EPS:
        return np.array([1.0, 0, 0, 0])
    a, b = a / na, b / nb
    d = np.dot(a, b)
    if d >= 1.0 - 1e-12:
        return np.array([1.0, 0, 0, 0])
    if d <= -1.0 + 1e-12:
        # 180°: any axis orthogonal to a
        axis = np.cross(a, np.array([1.0, 0, 0]))
        if np.linalg.norm(axis) < 1e-6:
            axis = np.cross(a, np.array([0.0, 1, 0]))
        axis /= np.linalg.norm(axis)
        return np.concatenate([[0.0], axis])
    axis = np.cross(a, b)
    s = np.sqrt(2.0 * (1.0 + d))
    return quat_normalize(np.concatenate([[s / 2.0], axis / s]))


def euler_to_quat(eulers):
    roll, pitch, yaw = eulers
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    return np.array([
        cy * cp * cr + sy * sp * sr,
        cy * cp * sr - sy * sp * cr,
        cy * sp * cr + sy * cp * sr,
        sy * cp * cr - cy * sp * sr,
    ])


def euler_to_matrix(eulers):
    return quat_to_matrix(euler_to_quat(eulers))


def matrix_to_euler(R):
    sy = np.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
    if sy > 1e-6:
        return np.array([np.arctan2(R[2, 1], R[2, 2]),
                         np.arctan2(-R[2, 0], sy),
                         np.arctan2(R[1, 0], R[0, 0])])
    return np.array([np.arctan2(-R[1, 2], R[1, 1]),
                     np.arctan2(-R[2, 0], sy), 0.0])


def from_rt(R, t):
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def inverse(T):
    R = T[:3, :3]
    t = T[:3, 3]
    return from_rt(R.T, -R.T @ t)


def normalize_rotation(T):
    out = T.copy()
    out[:3, :3] = quat_to_matrix(matrix_to_quat(T[:3, :3]))
    return out


def average_transforms(Ts):
    """Mean translation + normalized mean quaternion (sign-aligned) —
    common/math.h AverageTransforms parity."""
    ts = np.stack([T[:3, 3] for T in Ts])
    qs = np.stack([matrix_to_quat(T[:3, :3]) for T in Ts])
    q0 = qs[0]
    for i in range(1, len(qs)):
        if np.dot(qs[i], q0) < 0:
            qs[i] = -qs[i]
    q = quat_normalize(qs.mean(axis=0))
    return from_rt(quat_to_matrix(q), ts.mean(axis=0))


def translation_norm(T):
    return float(np.linalg.norm(T[:3, 3]))


def rotation_angles_abs_sum_deg(T):
    """Motion-filter angle measure: sum of |euler| in degrees
    (map_builder.cc:371-377)."""
    e = matrix_to_euler(T[:3, :3])
    return float(np.sum(np.abs(e)) * 180.0 / np.pi)
