"""Spatial-split normal estimation + surface-aware downsampling.

TPU-native re-expression of the reference's ``EigenPointCloud::CalculateNormals``
(builder/data/cloud_types.cc:73-144, 347-368): the reference recursively
median-splits the cloud along its widest dimension down to leaves of <= 7
points (``BuildNormals``), then per leaf computes ONE representative point
(the mean) whose normal comes from unconstrained least squares
``(Σ d dᵀ) n = Σ d`` ("Fast and Accurate Computation of Surface Normals from
Range Images", Badino et al., method cited at cloud_types.cc:68-71). The
output cloud is therefore also downsampled ~leaf-size×.

Two spatial groupings:

* ``kdsplit`` (default): faithful median-split — ``log2`` rounds of
  segment-wise multi-operand sorts (one fused ``lax.sort`` per round),
  matching the reference's recursion shape exactly. Adaptive splits along
  the widest dimension isolate surfaces, so leaf normals are clean.
* ``morton``: ONE ``lax.sort`` by 30-bit Morton code — leaves are
  consecutive Z-order runs. ~12× fewer sorts, but on sparse outdoor scans
  Z-order runs can mix points from different surfaces, which measurably
  degrades downstream ICP odometry (r02 regression: e2e ATE 2.1 m with
  morton vs 0.26 m with kdsplit) — only use where normal quality is not
  load-bearing.

Either way the leaf solves are one batched 3×3 solve + eigendecomposition —
fully static shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..data.cloud import PointCloud, NormalCloud, PAD_COORD

import numpy as np

_INF = np.float32(np.inf)  # plain host scalar: no device alloc at import
_MORTON_BITS = 10  # 10 bits/axis → 30-bit code


def _morton_interleave(q: jax.Array) -> jax.Array:
    """[N, 3] int32 in [0, 1024) → [N] int32 Morton code (bit-interleaved)."""
    def spread(v):
        # spread 10 bits to every 3rd position (classic magic numbers)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def _sym3_eigvals(A: jax.Array) -> jax.Array:
    """Closed-form eigenvalues of batched symmetric 3×3 matrices, descending
    ``[..., 3]`` (Cardano trigonometric form — batched ``eigvalsh`` lowers
    to scalar loops on TPU, this is pure VPU)."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    p2 = ((a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    # degenerate (near-isotropic) case: p2 ~ 0 → all eigenvalues = q
    iso = p2 < 1e-24
    e1 = jnp.where(iso, q, e1)
    e2 = jnp.where(iso, q, e2)
    e3 = jnp.where(iso, q, e3)
    return jnp.stack([e1, e2, e3], axis=-1)


def smallest_eigvec3(A: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of batched symmetric 3×3
    matrices ``[..., 3, 3] → [..., 3]`` (pure VPU, no iterative eigensolve):
    with λ₃ = min eigenvalue from the Cardano form, rows of ``A − λ₃I`` span
    the plane orthogonal to the eigenvector, so the best-conditioned cross
    product of two rows IS the eigenvector."""
    lam3 = _sym3_eigvals(A)[..., 2]
    B = A - lam3[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    stack = jnp.stack([c01, c02, c12], axis=-2)            # [..., 3, 3]
    norms = jnp.stack([n01, n02, n12], axis=-1)            # [..., 3]
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(stack, best[..., None, None].astype(jnp.int32)
                            .repeat(3, axis=-1), axis=-2)[..., 0, :]
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # degenerate (isotropic) → fall back to +z
    fallback = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], dtype=A.dtype), v.shape)
    return jnp.where(nrm > 1e-20, v / jnp.maximum(nrm, 1e-20), fallback)


def _solve3(A: jax.Array, b: jax.Array):
    """Batched 3×3 solve by adjugate/Cramer (pure VPU). Returns (x, det)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) * inv_det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) * inv_det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1), det


def _leaf_normals(x, y, z, mask, leaf_size):
    """Shared per-leaf mean + unconstrained-LS normal solve
    (cloud_types.cc:73-103)."""
    n = x.shape[0]
    m_leaves = n // leaf_size
    pts = jnp.stack([x, y, z], axis=1).reshape(m_leaves, leaf_size, 3)
    lm = mask.reshape(m_leaves, leaf_size)
    w = lm.astype(jnp.float32)[..., None]                # [M, L, 1]
    count = jnp.sum(lm, axis=1)                          # [M]
    denom = jnp.maximum(count, 1)[:, None].astype(jnp.float32)

    d = pts * w                                          # zero out invalid
    b_wave = jnp.sum(d, axis=1)                          # [M, 3]
    mean = b_wave / denom
    # M̃ = Σ d dᵀ over valid points (raw, uncentered — reference parity)
    M_wave = jnp.einsum("mli,mlj->mij", d, pts * w)      # [M, 3, 3]
    # rank check on the centered covariance (cloud_types.cc:86-91).
    # rank >= 2 ⇔ second eigenvalue significant ⇔ second invariant
    # I2 = e1e2+e1e3+e2e3 = Σ 2×2 principal minors ≫ 0. The minor form is
    # computed directly from C (no eigensolve) and is numerically robust:
    # for a line I2/tr² ~ f32 noise (≈1e-7), for a plane ≈ (e2/e1).
    centered = (pts - mean[:, None, :]) * w
    C = jnp.einsum("mli,mlj->mij", centered, centered)
    c00, c11, c22 = C[:, 0, 0], C[:, 1, 1], C[:, 2, 2]
    c01, c02, c12 = C[:, 0, 1], C[:, 0, 2], C[:, 1, 2]
    i2 = ((c00 * c11 - c01 * c01) + (c00 * c22 - c02 * c02)
          + (c11 * c22 - c12 * c12))
    tr = c00 + c11 + c22
    rank_ok = i2 > 1e-5 * jnp.maximum(tr * tr, 1e-20)

    # Jacobi-preconditioned 3x3 Cramer solve in f32
    diag = jnp.diagonal(M_wave, axis1=1, axis2=2)
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-12))
    A = M_wave * s[:, :, None] * s[:, None, :]
    A = A + 1e-7 * jnp.eye(3, dtype=A.dtype)
    rhs = b_wave * s
    sol, det = _solve3(A, rhs)
    sol = sol * s
    norm = jnp.linalg.norm(sol, axis=1, keepdims=True)
    normal = sol / jnp.maximum(norm, 1e-12)

    valid = ((count >= 3) & rank_ok & (jnp.abs(det) > 1e-30)
             & jnp.isfinite(normal).all(axis=1))
    out_xyz = jnp.where(valid[:, None], mean,
                        jnp.full_like(mean, PAD_COORD))
    out_normal = jnp.where(valid[:, None], normal, 0.0)
    return NormalCloud(xyz=out_xyz, normals=out_normal, mask=valid)


@partial(jax.jit, static_argnames=("leaf_size", "method"))
def estimate_normals(cloud: PointCloud, leaf_size: int = 8,
                     method: str = "kdsplit") -> NormalCloud:
    """Split-to-leaves normal estimation.

    Args:
      cloud: capacity must be a multiple of ``leaf_size`` (power of two for
        ``method='kdsplit'``).
      leaf_size: points per leaf (reference stops splitting at <= 7,
        cloud_types.cc:111-115; 8 is the power-of-two equivalent).
      method: ``'morton'`` (one Z-order sort) or ``'kdsplit'`` (faithful
        median splits).

    Returns:
      NormalCloud of capacity ``N / leaf_size``: per-leaf mean point +
      unit normal. Leaves with < 3 valid points or degenerate geometry
      (rank < 2 — reference check at cloud_types.cc:89-91) are masked out.
    """
    n = cloud.capacity
    if leaf_size & (leaf_size - 1) or leaf_size < 2:
        raise ValueError("leaf_size must be a power of two >= 2")
    if n % leaf_size:
        raise ValueError(f"capacity {n} not a multiple of leaf {leaf_size}")

    if method == "morton":
        x = cloud.xyz[:, 0]
        y = cloud.xyz[:, 1]
        z = cloud.xyz[:, 2]
        mask = cloud.mask
        # quantize valid points into a 1024³ lattice over their bbox
        fill_lo = jnp.where(mask[:, None], cloud.xyz, _INF)
        fill_hi = jnp.where(mask[:, None], cloud.xyz, -_INF)
        lo = jnp.min(fill_lo, axis=0)
        hi = jnp.max(fill_hi, axis=0)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
        scale = ((1 << _MORTON_BITS) - 1) / jnp.maximum(hi - lo, 1e-6)
        qpts = jnp.clip(((cloud.xyz - lo) * scale).astype(jnp.int32),
                        0, (1 << _MORTON_BITS) - 1)
        key = _morton_interleave(qpts)
        key = jnp.where(mask, key, jnp.int32(0x7FFFFFFF))  # invalid → end
        key, x, y, z, mask = lax.sort((key, x, y, z, mask),
                                      dimension=0, is_stable=True,
                                      num_keys=1)
        return _leaf_normals(x, y, z, mask, leaf_size)

    if method != "kdsplit":
        raise ValueError(f"unknown method {method!r}")
    if n & (n - 1):
        raise ValueError(f"capacity {n} must be a power of two for kdsplit")

    c = cloud.compact()
    x = c.xyz[:, 0]
    y = c.xyz[:, 1]
    z = c.xyz[:, 2]
    mask = c.mask

    seg = 1
    while n // seg > leaf_size:
        L = n // seg
        xs = x.reshape(seg, L)
        ys = y.reshape(seg, L)
        zs = z.reshape(seg, L)
        ms = mask.reshape(seg, L)
        # widest valid dimension per segment
        stack = jnp.stack([xs, ys, zs], axis=1)          # [S, 3, L]
        big = jnp.where(ms[:, None, :], stack, -_INF)
        small = jnp.where(ms[:, None, :], stack, _INF)
        extent = jnp.max(big, axis=2) - jnp.min(small, axis=2)   # [S, 3]
        extent = jnp.where(jnp.isfinite(extent), extent, 0.0)
        cut_dim = jnp.argmax(extent, axis=1)             # [S]
        cut_vals = jnp.take_along_axis(
            stack, cut_dim[:, None, None], axis=1)[:, 0, :]      # [S, L]
        keys = jnp.where(ms, cut_vals, _INF)  # invalid sorts to segment end
        keys, xs, ys, zs, ms = lax.sort(
            (keys, xs, ys, zs, ms), dimension=1, is_stable=True, num_keys=1)
        x, y, z, mask = (xs.reshape(n), ys.reshape(n), zs.reshape(n),
                         ms.reshape(n))
        seg *= 2

    return _leaf_normals(x, y, z, mask, leaf_size)
