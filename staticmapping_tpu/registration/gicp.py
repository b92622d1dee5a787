"""Generalized ICP (plane-to-plane) — the GICP half of the reference's
"type 3" matcher (registrators/ndt_gicp.cc:96-102 wraps
``pcl::GeneralizedIterativeClosestPoint``; option parity: rotation epsilon
1e-3, 35 iterations, ndt_gicp.cc:51-52).

TPU-native re-design (NOT a port of PCL's BFGS scheme):

* per-point disk covariances: k-NN neighborhoods (``ops.nn_search.knn``,
  MXU-tiled) → batched 3×3 covariance → unit normal via the closed-form
  smallest-eigenvector (``ops.normals.smallest_eigvec3``).  Segal's
  regularized covariance ``R·diag(1,1,ε)·Rᵀ`` collapses to
  ``I − (1−ε)·n nᵀ`` — only the normal is needed, no per-point eigenbasis.
* per-iteration: 1-NN correspondences (same kernel as IcpFast), combined
  information ``W = (C_B + R C_A Rᵀ)⁻¹`` by batched adjugate inverse,
  Gauss-Newton on the Mahalanobis point residuals with the standard
  left-perturbation Jacobian ``J = [−[p]ₓ | I]`` — one 6×6 MXU reduce.
* convergence on update norm < rotation_epsilon, ≤ max_iteration.

``score`` = exp(−mean matched distance), the same fitness semantics as the
other matchers (interface.h:61; the reference maps PCL's fitness through
exp(−·) at ndt_gicp.cc:104).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..common import se3
from ..data.cloud import PointCloud
from ..ops import nn_search
from ..ops.normals import smallest_eigvec3

_EPS_DISK = 1e-3   # Segal's ε: covariance thickness along the normal


class GicpCloud(NamedTuple):
    """Points + per-point unit normals defining disk covariances."""

    xyz: jax.Array      # [N, 3]
    normals: jax.Array  # [N, 3]
    mask: jax.Array     # [N] bool


@partial(jax.jit, static_argnames=("k",))
def compute_point_normals(cloud: PointCloud, k: int = 20) -> GicpCloud:
    """Per-point normals from k-NN covariances (full resolution — unlike the
    leaf-downsampled ``ops.normals.estimate_normals``)."""
    pts = cloud.masked_xyz()
    d2, idx = nn_search.knn(pts, pts, cloud.mask, k=k,
                            tile=min(1024, cloud.capacity))
    nbrs = pts[idx]                                     # [N, k, 3]
    valid_nbr = cloud.mask[idx] & jnp.isfinite(d2)      # [N, k]
    w = valid_nbr.astype(jnp.float32)[..., None]
    count = jnp.maximum(jnp.sum(valid_nbr, axis=1), 1)[:, None]
    mean = jnp.sum(nbrs * w, axis=1) / count
    centered = (nbrs - mean[:, None, :]) * w
    C = jnp.einsum("nki,nkj->nij", centered, centered)
    normals = smallest_eigvec3(C)
    ok = cloud.mask & (jnp.sum(valid_nbr, axis=1) >= 3)
    return GicpCloud(xyz=cloud.xyz, normals=normals, mask=ok)


def _disk_cov_sum_inv(n_a_rot: jax.Array, n_b: jax.Array) -> jax.Array:
    """(C_B + R C_A Rᵀ)⁻¹ with disk covariances: M = 2I − (1−ε)(mmᵀ + nnᵀ),
    m = R·n_A. Batched adjugate inverse (pure VPU)."""
    one_m_eps = 1.0 - _EPS_DISK
    eye = jnp.eye(3, dtype=jnp.float32)
    M = (2.0 * eye
         - one_m_eps * (n_a_rot[..., :, None] * n_a_rot[..., None, :]
                        + n_b[..., :, None] * n_b[..., None, :]))
    a00, a01, a02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    a11, a12, a22 = M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    row0 = jnp.stack([c00, c01, c02], axis=-1)
    row1 = jnp.stack([c01, c11, c12], axis=-1)
    row2 = jnp.stack([c02, c12, c22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


class _GicpState(NamedTuple):
    T_iter: jax.Array
    it: jax.Array
    converged: jax.Array
    score: jax.Array
    best_T: jax.Array       # iterate with the best fitness seen so far
    best_obj: jax.Array
    best_score: jax.Array


@partial(jax.jit, static_argnames=("max_iteration",))
def align_gicp(source: GicpCloud, target: GicpCloud, guess: jax.Array,
               max_correspondence_dist: float = 1.0e3,
               rotation_epsilon: float = 1e-3,
               max_iteration: int = 35):
    """Align ``source`` onto ``target``; returns ``(T [4,4], score)``.

    ``T`` maps source-frame points into the target frame (Align contract,
    registrators/interface.h:84-89)."""
    f32 = jnp.float32
    guess = guess.astype(f32)

    tgt_pts = jnp.where(target.mask[:, None], target.xyz,
                        jnp.full_like(target.xyz, nn_search._FAR))
    tgt_payload = jnp.concatenate([tgt_pts, target.normals], axis=1)
    src0 = source.xyz
    src_mask = source.mask
    max_d2 = f32(max_correspondence_dist ** 2)

    def body(state: _GicpState) -> _GicpState:
        T = state.T_iter @ guess
        R = se3.rotation(T)
        pts = se3.apply(T, src0)
        n_a_rot = jnp.einsum("ij,nj->ni", R, source.normals)

        d2, idx, sel = nn_search.nearest_select(pts, tgt_pts, target.mask,
                                                tgt_payload)
        q = sel[:, :3]
        n_b = sel[:, 3:6]
        keep = (src_mask & (d2 <= max_d2)).astype(f32)

        W = _disk_cov_sum_inv(n_a_rot, n_b) * keep[:, None, None]
        d = pts - q                                     # [N, 3]
        Wd = jnp.einsum("nij,nj->ni", W, d)
        # objective of the CURRENT iterate: the fitness score with a
        # match-count floor (tracked so the answer is the best-seen pose —
        # plain GN without PCL's line search can step OFF a near-perfect
        # guess and re-lock ~1 m away; observed r05 on square-corner
        # pairs: 0.13 m guess error → 0.83 m "converged".  The mean
        # WEIGHTED residual cannot arbitrate across poses — the trimmed
        # correspondence set changes with the pose — but the plain
        # avg-distance fitness ranks the true pose above the aliased one:
        # 0.62 vs 0.49 measured on the failing pair).
        kept_n = jnp.maximum(jnp.sum(keep), 1.0)
        obj_here = jnp.exp(
            -jnp.sum(jnp.sqrt(jnp.maximum(d2, 0.0)) * keep) / kept_n) \
            - 10.0 * (kept_n < 32)

        # J = [−[p]ₓ | I]; JᵀWd rotation block = p × Wd
        rot_g = jnp.cross(pts, Wd)
        b_vec = -jnp.concatenate([
            jnp.sum(rot_g, axis=0), jnp.sum(Wd, axis=0)])

        Jrot = -_hat(pts)                               # [N, 3, 3]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=f32),
                               (pts.shape[0], 3, 3))
        J = jnp.concatenate([Jrot, eye], axis=2)        # [N, 3, 6]
        JT_W = jnp.einsum("nij,nik->njk", J, W)         # [N, 6, 3]
        A = jnp.einsum("njk,nkl->jl", JT_W, J)          # [6, 6]
        A = A + 1e-6 * jnp.eye(6, dtype=f32)
        dx = jnp.linalg.solve(A, b_vec[:, None])[:, 0]
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        dT = se3.from_rt(se3.axis_angle_to_matrix(dx[:3]), dx[3:])
        T_new = dT @ state.T_iter

        converged = jnp.linalg.norm(dx) < rotation_epsilon
        kept = jnp.maximum(jnp.sum(keep), 1.0)
        avg_d = jnp.sum(jnp.sqrt(jnp.maximum(d2, 0.0)) * keep) / kept
        score = jnp.exp(-avg_d)
        better = obj_here > state.best_obj
        best_T = jnp.where(better, state.T_iter, state.best_T)
        best_obj = jnp.where(better, obj_here, state.best_obj)
        best_score = jnp.where(better, score, state.best_score)
        return _GicpState(T_new, state.it + 1, converged, score,
                          best_T, best_obj, best_score)

    def cond(state):
        return (~state.converged) & (state.it < max_iteration)

    def eval_pose(T_iter):
        T = T_iter @ guess
        pts = se3.apply(T, src0)
        d2, idx, sel = nn_search.nearest_select(pts, tgt_pts, target.mask,
                                                tgt_payload)
        keep = (src_mask & (d2 <= max_d2)).astype(f32)
        kept_n = jnp.maximum(jnp.sum(keep), 1.0)
        avg_d = jnp.sum(jnp.sqrt(jnp.maximum(d2, 0.0)) * keep) / kept_n
        score = jnp.exp(-avg_d)
        return score - 10.0 * (kept_n < 32), score

    eye4 = jnp.eye(4, dtype=f32)
    init = _GicpState(eye4, jnp.int32(0), jnp.array(False), f32(0.0),
                      eye4, f32(-jnp.inf), f32(0.0))
    final = lax.while_loop(cond, body, init)
    # evaluate the last iterate too, then return the best-seen pose
    obj_f, score_f = eval_pose(final.T_iter)
    last_wins = obj_f > final.best_obj
    T_best = jnp.where(last_wins, final.T_iter, final.best_T)
    s_best = jnp.where(last_wins, score_f, final.best_score)
    return T_best @ guess, s_best


def _hat(v: jax.Array) -> jax.Array:
    z = jnp.zeros_like(v[:, 0])
    return jnp.stack([
        jnp.stack([z, -v[:, 2], v[:, 1]], axis=1),
        jnp.stack([v[:, 2], z, -v[:, 0]], axis=1),
        jnp.stack([-v[:, 1], v[:, 0], z], axis=1),
    ], axis=1)


@dataclasses.dataclass
class Gicp:
    """Stateful plane-to-plane matcher (PCL GICP role in type 3)."""

    knn: int = 20
    # PCL's Registration default is effectively unlimited (the reference
    # never calls setMaxCorrespondenceDistance, ndt_gicp.cc:46-52); a
    # tight gate rejects exactly the far-field matches whose leverage
    # corrects a rotated initial guess (r05: corner scans locked 0.65 m
    # off with a 2 m gate, exact with this one)
    max_correspondence_dist: float = 1.0e3
    rotation_epsilon: float = 1e-3
    max_iteration: int = 35

    _source: GicpCloud = None
    _target: GicpCloud = None
    final_score: float = 0.0

    def set_input_source(self, cloud: PointCloud):
        self._source = compute_point_normals(cloud, k=self.knn)

    def set_input_target(self, target: PointCloud):
        self._target = compute_point_normals(target, k=self.knn)

    def align(self, guess: jax.Array):
        assert self._source is not None and self._target is not None
        T, score = align_gicp(
            self._source, self._target, guess,
            max_correspondence_dist=self.max_correspondence_dist,
            rotation_epsilon=self.rotation_epsilon,
            max_iteration=self.max_iteration)
        self.final_score = score
        return T, score
