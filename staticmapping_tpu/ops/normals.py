"""kd-split normal estimation + surface-aware downsampling.

TPU-native re-expression of the reference's ``EigenPointCloud::CalculateNormals``
(builder/data/cloud_types.cc:73-144, 347-368): the reference recursively
median-splits the cloud along its widest dimension down to leaves of <= 7
points (``BuildNormals``), then per leaf computes ONE representative point
(the mean) whose normal comes from unconstrained least squares
``(Σ d dᵀ) n = Σ d`` ("Fast and Accurate Computation of Surface Normals from
Range Images", Badino et al., method cited at cloud_types.cc:68-71). The
output cloud is therefore also downsampled ~leaf-size×.

Here the recursion becomes ``log2`` rounds of segment-wise multi-operand
sorts (one fused ``lax.sort`` per round), and the leaf solves become one
batched 3×3 solve + eigendecomposition — fully static shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..data.cloud import PointCloud, NormalCloud, PAD_COORD

_INF = jnp.float32(jnp.inf)


@partial(jax.jit, static_argnames=("leaf_size",))
def estimate_normals(cloud: PointCloud, leaf_size: int = 8) -> NormalCloud:
    """Split-to-leaves normal estimation.

    Args:
      cloud: capacity must be a power of two and >= leaf_size.
      leaf_size: points per leaf (reference stops splitting at <= 7,
        cloud_types.cc:111-115; 8 is the power-of-two equivalent).

    Returns:
      NormalCloud of capacity ``N / leaf_size``: per-leaf mean point +
      unit normal. Leaves with < 3 valid points or degenerate geometry
      (rank < 2 — reference check at cloud_types.cc:89-91) are masked out.
    """
    n = cloud.capacity
    if n & (n - 1):
        raise ValueError(f"capacity {n} must be a power of two")
    if leaf_size & (leaf_size - 1) or leaf_size < 2:
        raise ValueError("leaf_size must be a power of two >= 2")

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

    # leaves: [M, leaf_size]
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
    # rank check on the centered covariance (cloud_types.cc:86-91)
    centered = (pts - mean[:, None, :]) * w
    C = jnp.einsum("mli,mlj->mij", centered, centered)
    eigvals = jnp.linalg.eigvalsh(C)                     # ascending
    # rank >= 2: second eigenvalue must be non-negligible vs largest
    rank_ok = eigvals[:, 1] > 1e-5 * jnp.maximum(eigvals[:, 2], 1e-12)

    # Jacobi-preconditioned 3x3 solve in f32
    diag = jnp.diagonal(M_wave, axis1=1, axis2=2)
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-12))
    A = M_wave * s[:, :, None] * s[:, None, :]
    A = A + 1e-7 * jnp.eye(3, dtype=A.dtype)
    rhs = b_wave * s
    sol = jnp.linalg.solve(A, rhs[..., None])[..., 0] * s
    norm = jnp.linalg.norm(sol, axis=1, keepdims=True)
    normal = sol / jnp.maximum(norm, 1e-12)

    valid = (count >= 3) & rank_ok & jnp.isfinite(normal).all(axis=1)
    out_xyz = jnp.where(valid[:, None], mean,
                        jnp.full_like(mean, PAD_COORD))
    out_normal = jnp.where(valid[:, None], normal, 0.0)
    return NormalCloud(xyz=out_xyz, normals=out_normal, mask=valid)
