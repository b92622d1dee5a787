"""M2DP global cloud descriptor for loop detection.

TPU-native re-expression of the reference implementation
(descriptor/m2dp.{h,cc}; paper "M2DP: A Novel 3D Point Cloud Descriptor and
Its Application in Loop Closure Detection", He et al., cited README.md:161).

Pipeline parity (m2dp.cc:45-148):
  1. PCA-align the cloud (center + rotate into principal axes)
  2. drop points beyond ``max_distance``
  3. for p×q view directions m(θ,φ): project points onto the plane ⊥ m and
     histogram into l×t polar bins. NOTE the reference's quirk of using
     |p·axis| for both plane coordinates (m2dp.cc:100-103) — kept, since
     both sides of a match must bin identically.
  4. stack rows → signature A [p·q, l·t]; SVD; descriptor = [u1; v1]
  5. match score = |Pearson correlation| (m2dp.cc:151-169)

All views are computed batched (one einsum + one scatter-add); the SVD is a
single small [64, 512] decomposition.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cloud import PointCloud

# defaults: m2dp.h:48-49
R_BIN = 0.1
MAX_DISTANCE = 100.0
T_BINS = 16
P_VIEWS = 4
Q_VIEWS = 16


def _view_axes(p_views: int, q_views: int):
    """Per-view projection axes (host, static)."""
    theta_step = np.pi / p_views
    phi_step = (np.pi / 2) / q_views
    axes_x, axes_y = [], []
    for p in range(p_views):
        for q in range(q_views):
            theta, phi = p * theta_step, q * phi_step
            m = np.array([np.cos(theta) * np.cos(phi),
                          np.cos(theta) * np.sin(phi),
                          np.sin(theta)])
            # projected_x_axis = x̂ − |x̂·m|·m  (m2dp.cc:79-82)
            px = np.array([1.0, 0, 0]) - abs(m[0]) * m
            py = np.cross(m, px)
            axes_x.append(px)
            axes_y.append(py)
    return (np.stack(axes_x).astype(np.float32),
            np.stack(axes_y).astype(np.float32))


@partial(jax.jit, static_argnames=("r", "max_distance", "t", "p", "q"))
def compute_descriptor(cloud: PointCloud, r: float = R_BIN,
                       max_distance: float = MAX_DISTANCE,
                       t: int = T_BINS, p: int = P_VIEWS,
                       q: int = Q_VIEWS) -> jax.Array:
    """Returns the descriptor ``[p*q + l*t]`` (f32)."""
    l = int(np.ceil(np.sqrt(max_distance / r)))
    n_views = p * q
    n_bins = l * t

    xyz = cloud.xyz
    mask = cloud.mask
    n_valid = jnp.maximum(jnp.sum(mask), 1)

    # --- PCA alignment (m2dp.cc preProcess) ---
    mean = jnp.sum(jnp.where(mask[:, None], xyz, 0.0), axis=0) / n_valid
    centered = jnp.where(mask[:, None], xyz - mean, 0.0)
    cov = (centered.T @ centered) / n_valid
    eigvals, eigvecs = jnp.linalg.eigh(cov)      # ascending
    # descending order like PCL PCA
    E = eigvecs[:, ::-1]
    # deterministic sign: positive skew of the projections (stable across
    # similar clouds; PCL's sign is arbitrary — this removes that flakiness)
    proj = centered @ E                          # [N, 3]
    skew = jnp.sum(jnp.where(mask[:, None], proj ** 3, 0.0), axis=0)
    E = E * jnp.where(skew < 0, -1.0, 1.0)[None, :]
    pts = centered @ E

    d = jnp.linalg.norm(pts, axis=1)
    keep = mask & (d <= max_distance)

    ax, ay = _view_axes(p, q)
    ax = jnp.asarray(ax)                         # [V, 3]
    ay = jnp.asarray(ay)

    # [V, N] plane coordinates — reference takes abs of both (cc:100-103)
    u = jnp.abs(jnp.einsum("vk,nk->vn", ax, pts))
    v = jnp.abs(jnp.einsum("vk,nk->vn", ay, pts))
    length = jnp.sqrt(u * u + v * v)
    angle = jnp.arctan2(v, u)                    # ∈ [0, π/2] given abs coords
    angle = jnp.where(angle < 0, angle + 2 * np.pi, angle)

    l_index = jnp.clip(jnp.floor(jnp.sqrt(length / r)).astype(jnp.int32),
                       0, l - 1)
    t_index = jnp.clip(jnp.floor(angle / (2 * np.pi / t)).astype(jnp.int32),
                       0, t - 1)
    bin_index = l_index * t + t_index            # [V, N]
    view_index = jnp.broadcast_to(
        jnp.arange(n_views, dtype=jnp.int32)[:, None], bin_index.shape)
    flat = (view_index * n_bins + bin_index).reshape(-1)
    w = jnp.broadcast_to(keep[None, :], bin_index.shape).reshape(-1)
    A = jnp.zeros((n_views * n_bins,), dtype=jnp.float32).at[flat].add(
        w.astype(jnp.float32))
    A = A.reshape(n_views, n_bins)

    # --- SVD → [u1; v1] (m2dp.cc:140-148) ---
    U, S, Vt = jnp.linalg.svd(A, full_matrices=False)
    u1 = U[:, 0]
    v1 = Vt[0, :]
    # SVD sign ambiguity: fix so the first singular pair has non-negative sum
    sgn = jnp.where(jnp.sum(v1) < 0, -1.0, 1.0)
    return jnp.concatenate([u1 * sgn, v1 * sgn])


def match_descriptors(a: jax.Array, b: jax.Array) -> jax.Array:
    """|Pearson correlation| of two descriptors (m2dp.cc:151-169)."""
    n = a.shape[-1]
    num = n * jnp.sum(a * b, axis=-1) - jnp.sum(a, axis=-1) * jnp.sum(b, axis=-1)
    den = jnp.sqrt(
        (n * jnp.sum(a * a, axis=-1) - jnp.sum(a, axis=-1) ** 2) *
        (n * jnp.sum(b * b, axis=-1) - jnp.sum(b, axis=-1) ** 2))
    return jnp.abs(num / jnp.maximum(den, 1e-12))


@jax.jit
def match_many(query: jax.Array, bank: jax.Array) -> jax.Array:
    """Score one descriptor against a bank ``[M, D]`` in one shot (the MXU
    fit called out in SURVEY §7.1: descriptor matching is a matmul)."""
    return jax.vmap(lambda d: match_descriptors(query, d))(bank)
