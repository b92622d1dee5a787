"""Batched SE(3) pose-graph Gauss-Newton solver.

The TPU-native replacement for the reference's GTSAM iSAM2 back end
(back_end/isam_optimizer.{h,cc}). Instead of an incremental Bayes tree we
linearize ALL factors in one batched vmap and solve the dense(-block) normal
equations on the MXU — at SLAM pose-graph sizes (10²–10⁴ nodes) a full
re-solve on TPU is faster than incremental bookkeeping on CPU, and it
parallelizes over a device mesh by sharding factor linearization + psum of
H/b (SURVEY §5.8).

Factor model parity (isam_optimizer.cc:78-94, 140-173):
  * prior on node 0 (gauge) — sigma 1e-6
  * between factors (sequential submap matches + loop closures) with
    per-factor 6-vector sigmas; residual r = log(T_meas⁻¹ · T_i⁻¹ · T_j)
Tangent order here is (rho=trans, phi=rot) — sigma vectors are given in the
same order (note gtsam's Pose3 order is (rot, trans); conversion happens at
the options layer).

Jacobians: right perturbation T·exp(ξ);
  J_j = Jr⁻¹(r),  J_i = −Jr⁻¹(r) · Ad(T_j⁻¹ T_i)
with the usual series  Jr⁻¹(r) ≈ I + ½ad(r) + 1/12 ad(r)².
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..common import se3


def _ad_se3(xi: jax.Array) -> jax.Array:
    """ad(xi) for order (rho, phi): [[S(phi), S(rho)], [0, S(phi)]]."""
    rho, phi = xi[..., :3], xi[..., 3:]
    Sp = se3.skew(phi)
    Sr = se3.skew(rho)
    top = jnp.concatenate([Sp, Sr], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(Sp), Sp], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _adjoint(T: jax.Array) -> jax.Array:
    """Ad(T) for order (rho, phi): [[R, S(t)R], [0, R]]."""
    R = se3.rotation(T)
    t = se3.translation(T)
    StR = se3.skew(t) @ R
    top = jnp.concatenate([R, StR], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _jr_inv(r: jax.Array) -> jax.Array:
    ad = _ad_se3(r)
    eye = jnp.eye(6, dtype=r.dtype)
    return eye + 0.5 * ad + (1.0 / 12.0) * (ad @ ad)


@dataclasses.dataclass
class FactorBatch:
    """Host-side factor container with fixed-capacity device export."""

    i: list
    j: list
    T_meas: list          # 4x4 np
    sigmas: list          # [6] np (rho, phi)

    @classmethod
    def empty(cls):
        return cls([], [], [], [])

    def add(self, i: int, j: int, T_meas: np.ndarray, sigmas: np.ndarray):
        self.i.append(i)
        self.j.append(j)
        self.T_meas.append(np.asarray(T_meas, dtype=np.float64))
        self.sigmas.append(np.asarray(sigmas, dtype=np.float64))

    def __len__(self):
        return len(self.i)

    def device_arrays(self, capacity: int):
        f = len(self.i)
        assert f <= capacity
        fi = np.zeros(capacity, dtype=np.int32)
        fj = np.zeros(capacity, dtype=np.int32)
        Tm = np.tile(np.eye(4, dtype=np.float32), (capacity, 1, 1))
        si = np.ones((capacity, 6), dtype=np.float32)
        mask = np.zeros(capacity, dtype=bool)
        if f:
            fi[:f] = self.i
            fj[:f] = self.j
            Tm[:f] = np.stack(self.T_meas).astype(np.float32)
            si[:f] = np.stack(self.sigmas).astype(np.float32)
            mask[:f] = True
        return (jnp.asarray(fi), jnp.asarray(fj), jnp.asarray(Tm),
                jnp.asarray(1.0 / si), jnp.asarray(mask))


@partial(jax.jit, static_argnames=("num_iters",))
def gauss_newton(poses: jax.Array, node_mask: jax.Array,
                 fi: jax.Array, fj: jax.Array, T_meas: jax.Array,
                 inv_sigmas: jax.Array, fmask: jax.Array,
                 num_iters: int = 8, damping: float = 1e-6,
                 gauge_weight: float = 1e8):
    """Run ``num_iters`` GN iterations. Returns (poses, final_chi2).

    poses: [N, 4, 4] f32; node 0 is gauge-fixed by a heavy diagonal prior.
    Factors are padded to capacity F with ``fmask``.
    """
    n = poses.shape[0]
    n6 = n * 6
    f32 = jnp.float32

    def linearize_one(T_i, T_j, Tm, w, valid):
        M = se3.inverse(Tm) @ se3.inverse(T_i) @ T_j
        r = se3.log_se3(M)
        Jri = _jr_inv(r)
        Jj = Jri
        Ji = -Jri @ _adjoint(se3.inverse(T_j) @ T_i)
        w = w * valid
        # weighted; HIGHEST precision — bf16 MXU default corrupts the tiny
        # 6x6 normal-equation blocks
        hi = jax.lax.Precision.HIGHEST
        Wr = r * w
        JiW = Ji * w[:, None]
        JjW = Jj * w[:, None]
        H_ii = jnp.matmul(JiW.T, JiW, precision=hi)
        H_ij = jnp.matmul(JiW.T, JjW, precision=hi)
        H_jj = jnp.matmul(JjW.T, JjW, precision=hi)
        b_i = jnp.matmul(JiW.T, Wr, precision=hi)
        b_j = jnp.matmul(JjW.T, Wr, precision=hi)
        chi2 = jnp.sum(Wr * Wr)
        return H_ii, H_ij, H_jj, b_i, b_j, chi2

    rows6 = jnp.arange(6, dtype=jnp.int32)

    def gn_step(_, poses):
        T_i = poses[fi]
        T_j = poses[fj]
        H_ii, H_ij, H_jj, b_i, b_j, chi2 = jax.vmap(linearize_one)(
            T_i, T_j, T_meas, inv_sigmas, fmask.astype(f32)[:, None])

        H = jnp.zeros((n6, n6), dtype=f32)
        b = jnp.zeros((n6,), dtype=f32)
        ri = fi[:, None] * 6 + rows6[None, :]     # [F, 6]
        rj = fj[:, None] * 6 + rows6[None, :]
        H = H.at[ri[:, :, None], ri[:, None, :]].add(H_ii)
        H = H.at[ri[:, :, None], rj[:, None, :]].add(H_ij)
        H = H.at[rj[:, :, None], ri[:, None, :]].add(
            jnp.swapaxes(H_ij, 1, 2))
        H = H.at[rj[:, :, None], rj[:, None, :]].add(H_jj)
        b = b.at[ri].add(b_i)
        b = b.at[rj].add(b_j)

        # gauge prior on node 0 + damping + inactive-node regularization
        diag = jnp.ones((n6,), dtype=f32) * damping
        diag = diag.at[:6].add(gauge_weight)
        inactive = ~node_mask
        diag = diag + jnp.repeat(inactive.astype(f32), 6) * 1.0
        H = H + jnp.diag(diag)

        # Jacobi-preconditioned solve: the gauge weight makes κ(H) ~ 1e8,
        # beyond f32 — scaling by 1/sqrt(diag) restores conditioning
        d = jnp.diagonal(H)
        s = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-12))
        Hs = H * s[:, None] * s[None, :]
        dx = jnp.linalg.solve(Hs, -(b * s)) * s
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        # trust region: cap the per-node step to keep f32 GN stable
        dx = jnp.clip(dx, -1.0, 1.0)
        dxi = dx.reshape(n, 6)
        new_poses = poses @ se3.exp_se3(dxi)
        new_poses = jnp.where(node_mask[:, None, None], new_poses, poses)
        return new_poses

    poses = jax.lax.fori_loop(0, num_iters, gn_step, poses)

    # final chi2 for reporting
    T_i = poses[fi]
    T_j = poses[fj]
    def chi_one(T_i, T_j, Tm, w, valid):
        r = se3.log_se3(se3.inverse(Tm) @ se3.inverse(T_i) @ T_j)
        wr = r * w * valid
        return jnp.sum(wr * wr)
    chi2 = jnp.sum(jax.vmap(chi_one)(
        T_i, T_j, T_meas, inv_sigmas, fmask.astype(f32)[:, None]))
    return poses, chi2


class PoseGraph:
    """Host wrapper: collect factors, optimize with capacity bucketing.

    Capacities round up to powers of two so jit caches stay warm as the
    graph grows.
    """

    def __init__(self):
        self.factors = FactorBatch.empty()
        self.num_nodes = 0

    def add_node(self) -> int:
        idx = self.num_nodes
        self.num_nodes += 1
        return idx

    def add_between(self, i: int, j: int, T_ij: np.ndarray,
                    sigmas=(0.15, 0.15, 0.15, 0.1, 0.1, 0.1)):
        """sigmas order (trans xyz, rot xyz) — defaults are the reference's
        frame-match noise (isam_optimizer.cc:81-83, converted order)."""
        self.factors.add(i, j, T_ij, np.asarray(sigmas))

    def optimize(self, poses_np: np.ndarray, num_iters: int = 8
                 ) -> np.ndarray:
        """poses_np [n, 4, 4] f64 → optimized [n, 4, 4] f64."""
        n = self.num_nodes
        assert poses_np.shape[0] == n
        ncap = max(8, 1 << (n - 1).bit_length())
        fcap = max(16, 1 << (max(len(self.factors), 1) - 1).bit_length())

        poses = np.tile(np.eye(4, dtype=np.float32), (ncap, 1, 1))
        poses[:n] = poses_np.astype(np.float32)
        node_mask = np.zeros(ncap, dtype=bool)
        node_mask[:n] = True
        fi, fj, Tm, inv_s, fmask = self.factors.device_arrays(fcap)
        out, chi2 = gauss_newton(
            jnp.asarray(poses), jnp.asarray(node_mask),
            fi, fj, Tm, inv_s, fmask, num_iters=num_iters)
        self.last_chi2 = float(chi2)
        out = np.asarray(out, dtype=np.float64)[:n]
        # re-orthonormalize after f32 accumulation
        from ..common import np_se3
        return np.stack([np_se3.normalize_rotation(T) for T in out])
