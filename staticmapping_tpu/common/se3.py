"""SE(3) math on batched arrays — TPU-native parity with the reference's
``common/math.h`` (reference: common/math.h:107-246).

Poses are ``[..., 4, 4]`` homogeneous matrices (float32 by default; all ops
follow input dtype). Quaternions are ``[..., 4]`` in ``[w, x, y, z]`` order.
Euler angles follow the reference convention: ``(roll=x, pitch=y, yaw=z)``
with ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)`` (common/math.h:128-138).

Everything here is jit/vmap-friendly: no data-dependent Python control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


# ---------------------------------------------------------------------------
# quaternion primitives  (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(q1, q2):
    """Hamilton product, batched over leading dims."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vectors ``v [..., 3]`` by quaternions ``q [..., 4]``."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q):
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """Rotation matrix ``[..., 3, 3]`` → quaternion, branch-free (batched
    Shepperd's method: compute all four candidate quaternions, select by the
    largest diagonal combination)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # four candidates, each scaled by 4*q_i^2 (>=0)
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # candidate built from w
    sw = safe_sqrt(qw2) * 2.0
    cand_w = jnp.stack(
        [0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw],
        axis=-1)
    sx = safe_sqrt(qx2) * 2.0
    cand_x = jnp.stack(
        [(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx],
        axis=-1)
    sy = safe_sqrt(qy2) * 2.0
    cand_y = jnp.stack(
        [(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy],
        axis=-1)
    sz = safe_sqrt(qz2) * 2.0
    cand_z = jnp.stack(
        [(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz],
        axis=-1)

    scores = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


def quat_angular_distance(q1, q2):
    """Angle of the relative rotation (Eigen ``angularDistance`` parity)."""
    d = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    d = jnp.clip(d, 0.0, 1.0)
    return 2.0 * jnp.arccos(d)


def slerp(q0, q1, t):
    """Spherical interpolation (Eigen ``slerp`` parity, shortest path)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    # fall back to lerp for nearly parallel quaternions
    small = sin_theta < 1e-5
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# axis-angle
# ---------------------------------------------------------------------------

def _theta_safe(sq):
    """(small-mask, safe-theta) — the double-``where`` guard that
    keeps both primal AND autodiff tangents finite at theta = 0 (the naive
    ``norm``/division forms produce NaN Jacobians, which poisons the
    pose-graph autodiff factor linearization).

    The switch point is theta < 0.1 (sq < 1e-2) — far larger than the usual
    ~1e-5 guard because these run in f32: terms like ``1 − cos(theta)``
    underflow f32 for theta < ~1e-3 (1−c ≈ 5e-7 at theta=1e-3, i.e. only a
    few ulps), turning the exact quotient forms into garbage.  At theta=0.1
    the 3-term Taylor series below are accurate to ~1e-10 — better than the
    exact forms in f32 — so the wide switch loses nothing."""
    small = sq < 1e-2
    theta = jnp.sqrt(jnp.where(small, 1.0, sq))
    return small, theta


def axis_angle_to_matrix(w):
    """Rodrigues: rotation vector ``[..., 3]`` → matrix.

    Written as R = I + a·S + b·S² with S = skew(w) (no axis normalization)
    so it is autodiff-safe at theta = 0."""
    sq = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    small, theta = _theta_safe(sq)
    s, c = jnp.sin(theta), jnp.cos(theta)
    a = jnp.where(small, 1.0 - sq / 6.0 + sq * sq / 120.0, s / theta)
    b = jnp.where(small, 0.5 - sq / 24.0 + sq * sq / 720.0, (1.0 - c) / sq)
    S = skew(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), S.shape)
    return eye + a * S + b * (S @ S)


def matrix_to_axis_angle(R):
    q = matrix_to_quat(R)
    w = q[..., :1]
    v = q[..., 1:]
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    small, n = _theta_safe(sq)
    # angle/|v| = 2·atan2(|v|, w)/|v|; for small |v| use the atan series
    # 2/w · (1 − x²/3 + x⁴/5), x = |v|/w  (w ≥ 0.995 inside the guard)
    ws = jnp.maximum(w, 0.5)
    x2 = sq / (ws * ws)
    scale = jnp.where(small,
                      (2.0 / ws) * (1.0 - x2 / 3.0 + x2 * x2 / 5.0),
                      2.0 * jnp.arctan2(n, w) / n)
    return v * scale


def skew(v):
    """``[..., 3] → [..., 3, 3]`` cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# euler (roll, pitch, yaw) — reference convention math.h:106-139
# ---------------------------------------------------------------------------

def euler_to_quat(eulers):
    roll, pitch, yaw = eulers[..., 0], eulers[..., 1], eulers[..., 2]
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    # q = qz(yaw) * qy(pitch) * qx(roll)
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def euler_to_matrix(eulers):
    return quat_to_matrix(euler_to_quat(eulers))


def matrix_to_euler(R):
    """ZYX extraction, parity with RotationMatrixToEulerAngles
    (common/math.h:106-126) including the singular branch."""
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    x = jnp.where(singular,
                  jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
                  jnp.arctan2(R[..., 2, 1], R[..., 2, 2]))
    y = jnp.arctan2(-R[..., 2, 0], sy)
    z = jnp.where(singular, jnp.zeros_like(sy),
                  jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return jnp.stack([x, y, z], axis=-1)


def quat_to_euler(q):
    return matrix_to_euler(quat_to_matrix(q))


# ---------------------------------------------------------------------------
# rigid transforms [..., 4, 4]
# ---------------------------------------------------------------------------

def identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def from_rt(R, t):
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), batch + (4, 4))
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T


def rotation(T):
    return T[..., :3, :3]


def translation(T):
    return T[..., :3, 3]


def inverse(T):
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(*Ts):
    out = Ts[0]
    for T in Ts[1:]:
        out = out @ T
    return out


def apply(T, pts):
    """Apply ``[..., 4, 4]`` to points ``[..., N, 3]``."""
    R = rotation(T)
    t = translation(T)
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def transform_to_vector6(T):
    """``[tx, ty, tz, roll, pitch, yaw]`` (math.h:157-166)."""
    return jnp.concatenate([translation(T), matrix_to_euler(rotation(T))], axis=-1)


def vector6_to_transform(v):
    return from_rt(euler_to_matrix(v[..., 3:]), v[..., :3])


def interpolate(T1, T2, factor):
    """slerp rotation + lerp translation (common/math.h:198-211)."""
    factor = jnp.asarray(factor, dtype=T1.dtype)
    q = slerp(matrix_to_quat(rotation(T1)), matrix_to_quat(rotation(T2)),
              factor[..., None] if factor.ndim else factor)
    t = translation(T1) + (translation(T2) - translation(T1)) * (
        factor[..., None] if factor.ndim else factor)
    return from_rt(quat_to_matrix(q), t)


def average_transforms(Ts, weights=None):
    """Mean translation + chordal-mean rotation over axis 0
    (parity goal: common/math.h AverageTransforms)."""
    if weights is None:
        t = jnp.mean(translation(Ts), axis=0)
        qs = matrix_to_quat(rotation(Ts))
        q0 = qs[0]
        qs = jnp.where(jnp.sum(qs * q0, axis=-1, keepdims=True) < 0, -qs, qs)
        q = quat_normalize(jnp.mean(qs, axis=0))
    else:
        w = weights / jnp.maximum(jnp.sum(weights), _EPS)
        t = jnp.sum(translation(Ts) * w[:, None], axis=0)
        qs = matrix_to_quat(rotation(Ts))
        q0 = qs[0]
        qs = jnp.where(jnp.sum(qs * q0, axis=-1, keepdims=True) < 0, -qs, qs)
        q = quat_normalize(jnp.sum(qs * w[:, None], axis=0))
    return from_rt(quat_to_matrix(q), t)


def normalize_rotation(T):
    """Re-orthonormalize the rotation block (math.h NormalizeRotation)."""
    q = matrix_to_quat(rotation(T))
    return from_rt(quat_to_matrix(q), translation(T))


# ---------------------------------------------------------------------------
# se(3) exp/log for the pose-graph optimizer
# ---------------------------------------------------------------------------

def exp_se3(xi):
    """``xi = [rho(3), phi(3)] → [..., 4, 4]`` (full SE(3) exponential).

    V = I + b·S + c·S² with S = skew(phi); autodiff-safe at theta = 0."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = axis_angle_to_matrix(phi)
    sq = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    small, theta = _theta_safe(sq)
    s, c = jnp.sin(theta), jnp.cos(theta)
    b = jnp.where(small, 0.5 - sq / 24.0 + sq * sq / 720.0, (1.0 - c) / sq)
    cc = jnp.where(small, 1.0 / 6.0 - sq / 120.0 + sq * sq / 5040.0,
                   (theta - s) / (sq * theta))
    S = skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b * S + cc * (S @ S)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return from_rt(R, t)


def log_se3(T):
    """V⁻¹ = I − S/2 + e·S² with S = skew(phi); autodiff-safe at 0."""
    phi = matrix_to_axis_angle(rotation(T))
    sq = jnp.sum(phi * phi, axis=-1, keepdims=True)[..., None]
    small, theta = _theta_safe(sq)
    s, c = jnp.sin(theta), jnp.cos(theta)
    e = jnp.where(
        small, 1.0 / 12.0 + sq / 720.0 + sq * sq / 30240.0,
        (1.0 - 0.5 * theta * s / jnp.maximum(1.0 - c, _EPS)) / sq)
    S = skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), S.shape)
    Vinv = eye - 0.5 * S + e * (S @ S)
    rho = jnp.einsum("...ij,...j->...i", Vinv, translation(T))
    return jnp.concatenate([rho, phi], axis=-1)
