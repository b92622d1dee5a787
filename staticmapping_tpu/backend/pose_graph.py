"""Batched SE(3) pose-graph Gauss-Newton solver.

The TPU-native replacement for the reference's GTSAM iSAM2 back end
(back_end/isam_optimizer.{h,cc}). Instead of an incremental Bayes tree we
linearize ALL factors in one batched vmap and solve the dense(-block) normal
equations on the MXU — at SLAM pose-graph sizes (10²–10⁴ nodes) a full
re-solve on TPU is faster than incremental bookkeeping on CPU, and it
parallelizes over a device mesh by sharding factor linearization + psum of
H/b (SURVEY §5.8).

Factor model parity (isam_optimizer.cc:78-94, 127-288):
  * prior on node 0 (gauge) — heavy diagonal
  * between factors (sequential submap matches + loop closures) with
    per-factor 6-vector sigmas; residual r = log(T_meas⁻¹ · T_i⁻¹ · T_j)
  * GPS-ENU point factors: (T_coord · T_i) ∘ (p_tracking_gps + tf_err) = enu
    with shared special nodes GPS_COORD (SE3) and GPS_CALIB (translation
    only, used when extrinsic calibration is enabled) —
    isam_optimizer.cc:238-262
  * odometry extrinsic-calibration factors: calib⁻¹ · T_i · calib = T_odom
    on the shared ODOM_CALIB node, Huber(k=1)-robustified —
    isam_optimizer.cc:92-94, 209-224
  * SE(3) priors on the special nodes (odom_tf_noise / gps coord prior)

Tangent order here is (rho=trans, phi=rot) — sigma vectors are given in the
same order (note gtsam's Pose3 order is (rot, trans); conversion happens at
the options layer).

Between-factor Jacobians are analytic (right perturbation T·exp(ξ)):
  J_j = Jr⁻¹(r),  J_i = −Jr⁻¹(r) · Ad(T_j⁻¹ T_i)
with the series  Jr⁻¹(r) ≈ I + ½ad(r) + 1/12 ad(r)². The low-count factor
types (GPS / odom / prior) linearize by forward-mode autodiff of the residual
at ξ=0 — identical math, simpler code.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..common import se3

# special shared nodes appended after the regular pose nodes
NUM_SPECIAL_NODES = 3
SPECIAL_GPS_COORD = 0   # map origin expressed in the ENU/GPS frame
SPECIAL_ODOM_CALIB = 1  # lidar→odom extrinsic
SPECIAL_GPS_CALIB = 2   # tracking→gps translation error (translation only)


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


# --------------------------------------------------------------------------
# residuals for the autodiff-linearized factor types
# --------------------------------------------------------------------------

def _gps_residual(xi, T_i, T_c, T_e, p_tg, enu, use_err):
    """xi = concat(ξ_i, ξ_c, ξ_e). r = (T_c·T_i)∘(p_tg + err) − enu."""
    Ti = T_i @ se3.exp_se3(xi[0:6])
    Tc = T_c @ se3.exp_se3(xi[6:12])
    Te = T_e @ se3.exp_se3(xi[12:18])
    offset = p_tg + use_err * se3.translation(Te)
    p_map = se3.rotation(Ti) @ offset + se3.translation(Ti)
    return se3.rotation(Tc) @ p_map + se3.translation(Tc) - enu


def _odom_residual(xi, T_i, T_k, T_odom):
    """xi = concat(ξ_i, ξ_k). r = log(T_odom⁻¹ · K⁻¹·T_i·K)."""
    Ti = T_i @ se3.exp_se3(xi[0:6])
    Tk = T_k @ se3.exp_se3(xi[6:12])
    return se3.log_se3(se3.inverse(T_odom) @ se3.inverse(Tk) @ Ti @ Tk)


def _prior_residual(xi, T, T_prior):
    return se3.log_se3(se3.inverse(T_prior) @ (T @ se3.exp_se3(xi)))


# --------------------------------------------------------------------------
# host-side factor containers with fixed-capacity device export
# --------------------------------------------------------------------------

def _pad_pow2(n: int, floor: int) -> int:
    return max(floor, 1 << (max(n, 1) - 1).bit_length())


@dataclasses.dataclass
class FactorBatch:
    """Between factors."""

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


@dataclasses.dataclass
class GpsFactorBatch:
    i: list          # pose node index
    enu: list        # [3]
    p_tg: list       # [3] tracking→gps translation
    sigmas: list     # [3]
    use_err: list    # bool — include the GPS_CALIB translation error

    @classmethod
    def empty(cls):
        return cls([], [], [], [], [])

    def add(self, i, enu, p_tg, sigmas, use_err=False):
        self.i.append(i)
        self.enu.append(np.asarray(enu, dtype=np.float64))
        self.p_tg.append(np.asarray(p_tg, dtype=np.float64))
        self.sigmas.append(np.asarray(sigmas, dtype=np.float64))
        self.use_err.append(bool(use_err))

    def __len__(self):
        return len(self.i)

    def device_arrays(self, capacity: int):
        f = len(self.i)
        gi = np.zeros(capacity, dtype=np.int32)
        enu = np.zeros((capacity, 3), dtype=np.float32)
        ptg = np.zeros((capacity, 3), dtype=np.float32)
        si = np.ones((capacity, 3), dtype=np.float32)
        ue = np.zeros(capacity, dtype=np.float32)
        mask = np.zeros(capacity, dtype=bool)
        if f:
            gi[:f] = self.i
            enu[:f] = np.stack(self.enu).astype(np.float32)
            ptg[:f] = np.stack(self.p_tg).astype(np.float32)
            si[:f] = np.stack(self.sigmas).astype(np.float32)
            ue[:f] = np.asarray(self.use_err, dtype=np.float32)
            mask[:f] = True
        return (jnp.asarray(gi), jnp.asarray(enu), jnp.asarray(ptg),
                jnp.asarray(1.0 / si), jnp.asarray(ue), jnp.asarray(mask))


@dataclasses.dataclass
class OdomFactorBatch:
    i: list
    T_odom: list
    sigmas: list      # [6] (rho, phi)

    @classmethod
    def empty(cls):
        return cls([], [], [])

    def add(self, i, T_odom, sigmas):
        self.i.append(i)
        self.T_odom.append(np.asarray(T_odom, dtype=np.float64))
        self.sigmas.append(np.asarray(sigmas, dtype=np.float64))

    def __len__(self):
        return len(self.i)

    def device_arrays(self, capacity: int):
        f = len(self.i)
        oi = np.zeros(capacity, dtype=np.int32)
        To = np.tile(np.eye(4, dtype=np.float32), (capacity, 1, 1))
        si = np.ones((capacity, 6), dtype=np.float32)
        mask = np.zeros(capacity, dtype=bool)
        if f:
            oi[:f] = self.i
            To[:f] = np.stack(self.T_odom).astype(np.float32)
            si[:f] = np.stack(self.sigmas).astype(np.float32)
            mask[:f] = True
        return (jnp.asarray(oi), jnp.asarray(To), jnp.asarray(1.0 / si),
                jnp.asarray(mask))


@dataclasses.dataclass
class PriorFactorBatch:
    i: list
    T_prior: list
    sigmas: list      # [6]

    @classmethod
    def empty(cls):
        return cls([], [], [])

    def add(self, i, T_prior, sigmas):
        self.i.append(i)
        self.T_prior.append(np.asarray(T_prior, dtype=np.float64))
        self.sigmas.append(np.asarray(sigmas, dtype=np.float64))

    def __len__(self):
        return len(self.i)

    def device_arrays(self, capacity: int):
        f = len(self.i)
        pi = np.zeros(capacity, dtype=np.int32)
        Tp = np.tile(np.eye(4, dtype=np.float32), (capacity, 1, 1))
        si = np.ones((capacity, 6), dtype=np.float32)
        mask = np.zeros(capacity, dtype=bool)
        if f:
            pi[:f] = self.i
            Tp[:f] = np.stack(self.T_prior).astype(np.float32)
            si[:f] = np.stack(self.sigmas).astype(np.float32)
            mask[:f] = True
        return (jnp.asarray(pi), jnp.asarray(Tp), jnp.asarray(1.0 / si),
                jnp.asarray(mask))


# --------------------------------------------------------------------------
# shared per-factor linearizations (used by the dense and the PCG solver)
# --------------------------------------------------------------------------

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST


def _lin_between(T_i, T_j, Tm, w, valid):
    M = se3.inverse(Tm) @ se3.inverse(T_i) @ T_j
    r = se3.log_se3(M)
    Jri = _jr_inv(r)
    Jj = Jri
    Ji = -Jri @ _adjoint(se3.inverse(T_j) @ T_i)
    w = w * valid
    Wr = r * w
    JiW = Ji * w[:, None]
    JjW = Jj * w[:, None]
    H_ii = jnp.matmul(JiW.T, JiW, precision=_HI)
    H_ij = jnp.matmul(JiW.T, JjW, precision=_HI)
    H_jj = jnp.matmul(JjW.T, JjW, precision=_HI)
    b_i = jnp.matmul(JiW.T, Wr, precision=_HI)
    b_j = jnp.matmul(JjW.T, Wr, precision=_HI)
    return H_ii, H_ij, H_jj, b_i, b_j


def _lin_gps(T_i, T_c, T_e, ptg, enu, use_err, w3, valid):
    xi0 = jnp.zeros((18,), dtype=_F32)
    r = _gps_residual(xi0, T_i, T_c, T_e, ptg, enu, use_err)
    J = jax.jacfwd(_gps_residual)(xi0, T_i, T_c, T_e, ptg, enu, use_err)
    w = w3 * valid
    Wr = r * w
    JW = J * w[:, None]            # [3, 18]
    H = jnp.matmul(JW.T, JW, precision=_HI)   # [18, 18]
    b = jnp.matmul(JW.T, Wr, precision=_HI)   # [18]
    return H, b


def _lin_odom(T_i, T_k, To, w6, valid, k):
    xi0 = jnp.zeros((12,), dtype=_F32)
    r = _odom_residual(xi0, T_i, T_k, To)
    J = jax.jacfwd(_odom_residual)(xi0, T_i, T_k, To)
    # Huber(k) IRLS weight on the whitened residual
    # (NM::Robust Huber(1), isam_optimizer.cc:92)
    rw = r * w6
    norm = jnp.sqrt(jnp.maximum(jnp.sum(rw * rw), 1e-12))
    wh = jnp.sqrt(jnp.minimum(1.0, k / norm))
    w = w6 * valid * wh
    Wr = r * w
    JW = J * w[:, None]            # [6, 12]
    H = jnp.matmul(JW.T, JW, precision=_HI)
    b = jnp.matmul(JW.T, Wr, precision=_HI)
    return H, b


def _lin_prior(T, Tp, w6, valid):
    xi0 = jnp.zeros((6,), dtype=_F32)
    r = _prior_residual(xi0, T, Tp)
    J = jax.jacfwd(_prior_residual)(xi0, T, Tp)
    w = w6 * valid
    Wr = r * w
    JW = J * w[:, None]
    return (jnp.matmul(JW.T, JW, precision=_HI),
            jnp.matmul(JW.T, Wr, precision=_HI))


def _make_total_cost(fi, fj, T_meas, inv_sigmas, fmask,
                     gi, g_enu, g_ptg, g_inv_s, g_use_err, gmask,
                     gps_coord_idx, gps_calib_idx,
                     oi, o_T, o_inv_s, omask, odom_calib_idx, huber_k,
                     pi, p_T, p_inv_s, pmask):
    """Weighted SSE over every factor type (for LM accept/reject).
    Huber on the odom factors is applied as its IRLS weight."""
    f32 = _F32

    def total_cost(poses):
        def between_one(T_i, T_j, Tm, w, valid):
            r = se3.log_se3(se3.inverse(Tm) @ se3.inverse(T_i) @ T_j)
            wr = r * w * valid
            return jnp.sum(wr * wr)
        c = jnp.sum(jax.vmap(between_one)(
            poses[fi], poses[fj], T_meas, inv_sigmas,
            fmask.astype(f32)[:, None]))

        def gps_one(T_i, T_c, T_e, ptg, enu, use_err, w3, valid):
            r = _gps_residual(jnp.zeros((18,), f32), T_i, T_c, T_e,
                              ptg, enu, use_err)
            wr = r * w3 * valid
            return jnp.sum(wr * wr)
        c += jnp.sum(jax.vmap(gps_one)(
            poses[gi],
            jnp.broadcast_to(poses[gps_coord_idx], (gi.shape[0], 4, 4)),
            jnp.broadcast_to(poses[gps_calib_idx], (gi.shape[0], 4, 4)),
            g_ptg, g_enu, g_use_err, g_inv_s, gmask.astype(f32)[:, None]))

        def odom_one(T_i, T_k, To, w6, valid):
            r = _odom_residual(jnp.zeros((12,), f32), T_i, T_k, To)
            rw = r * w6
            norm = jnp.sqrt(jnp.maximum(jnp.sum(rw * rw), 1e-12))
            wh = jnp.sqrt(jnp.minimum(1.0, huber_k / norm))
            wr = rw * wh * valid
            return jnp.sum(wr * wr)
        c += jnp.sum(jax.vmap(odom_one)(
            poses[oi],
            jnp.broadcast_to(poses[odom_calib_idx], (oi.shape[0], 4, 4)),
            o_T, o_inv_s, omask.astype(f32)[:, None]))

        def prior_one(T, Tp, w6, valid):
            r = _prior_residual(jnp.zeros((6,), f32), T, Tp)
            wr = r * w6 * valid
            return jnp.sum(wr * wr)
        c += jnp.sum(jax.vmap(prior_one)(
            poses[pi], p_T, p_inv_s, pmask.astype(f32)[:, None]))
        return c

    return total_cost


# --------------------------------------------------------------------------
# the jitted dense solver (small graphs — one MXU solve)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_iters",))
def gauss_newton(poses, node_mask,
                 fi, fj, T_meas, inv_sigmas, fmask,
                 gi, g_enu, g_ptg, g_inv_s, g_use_err, gmask,
                 gps_coord_idx, gps_calib_idx,
                 oi, o_T, o_inv_s, omask, odom_calib_idx, huber_k,
                 pi, p_T, p_inv_s, pmask,
                 num_iters: int = 8, damping: float = 1e-6,
                 gauge_weight: float = 1e8):
    """Run ``num_iters`` GN iterations over all factor types.

    poses: [N, 4, 4] f32 (regular nodes + special nodes, see node indices
    passed as data). Node 0 is gauge-fixed by a heavy diagonal prior.
    All factor arrays are padded to capacity with masks.
    """
    n = poses.shape[0]
    n6 = n * 6
    f32 = jnp.float32
    rows6 = jnp.arange(6, dtype=jnp.int32)

    linearize_between = _lin_between
    linearize_gps = _lin_gps
    linearize_odom = _lin_odom
    linearize_prior = _lin_prior
    total_cost = _make_total_cost(
        fi, fj, T_meas, inv_sigmas, fmask,
        gi, g_enu, g_ptg, g_inv_s, g_use_err, gmask,
        gps_coord_idx, gps_calib_idx,
        oi, o_T, o_inv_s, omask, odom_calib_idx, huber_k,
        pi, p_T, p_inv_s, pmask)

    def gn_step(carry, _):
        poses, lam = carry
        H = jnp.zeros((n6, n6), dtype=f32)
        b = jnp.zeros((n6,), dtype=f32)

        # ---- between ----
        T_i = poses[fi]
        T_j = poses[fj]
        H_ii, H_ij, H_jj, b_i, b_j = jax.vmap(linearize_between)(
            T_i, T_j, T_meas, inv_sigmas, fmask.astype(f32)[:, None])
        ri = fi[:, None] * 6 + rows6[None, :]     # [F, 6]
        rj = fj[:, None] * 6 + rows6[None, :]
        H = H.at[ri[:, :, None], ri[:, None, :]].add(H_ii)
        H = H.at[ri[:, :, None], rj[:, None, :]].add(H_ij)
        H = H.at[rj[:, :, None], ri[:, None, :]].add(
            jnp.swapaxes(H_ij, 1, 2))
        H = H.at[rj[:, :, None], rj[:, None, :]].add(H_jj)
        b = b.at[ri].add(b_i)
        b = b.at[rj].add(b_j)

        # ---- gps enu ----
        Hg, bg = jax.vmap(linearize_gps)(
            poses[gi], jnp.broadcast_to(poses[gps_coord_idx],
                                        (gi.shape[0], 4, 4)),
            jnp.broadcast_to(poses[gps_calib_idx], (gi.shape[0], 4, 4)),
            g_ptg, g_enu, g_use_err, g_inv_s,
            gmask.astype(f32)[:, None])
        gidx = jnp.concatenate([
            gi[:, None] * 6 + rows6[None, :],
            jnp.broadcast_to(gps_coord_idx * 6 + rows6, (gi.shape[0], 6)),
            jnp.broadcast_to(gps_calib_idx * 6 + rows6, (gi.shape[0], 6)),
        ], axis=1)                                 # [G, 18]
        H = H.at[gidx[:, :, None], gidx[:, None, :]].add(Hg)
        b = b.at[gidx].add(bg)

        # ---- odom calib ----
        Ho, bo = jax.vmap(linearize_odom, in_axes=(0, 0, 0, 0, 0, None))(
            poses[oi], jnp.broadcast_to(poses[odom_calib_idx],
                                        (oi.shape[0], 4, 4)),
            o_T, o_inv_s, omask.astype(f32)[:, None], huber_k)
        oidx = jnp.concatenate([
            oi[:, None] * 6 + rows6[None, :],
            jnp.broadcast_to(odom_calib_idx * 6 + rows6, (oi.shape[0], 6)),
        ], axis=1)                                 # [O, 12]
        H = H.at[oidx[:, :, None], oidx[:, None, :]].add(Ho)
        b = b.at[oidx].add(bo)

        # ---- priors ----
        Hp, bp = jax.vmap(linearize_prior)(
            poses[pi], p_T, p_inv_s, pmask.astype(f32)[:, None])
        pidx = pi[:, None] * 6 + rows6[None, :]
        H = H.at[pidx[:, :, None], pidx[:, None, :]].add(Hp)
        b = b.at[pidx].add(bp)

        # gauge prior on node 0 + inactive-node regularization
        diag0 = jnp.ones((n6,), dtype=f32) * damping
        diag0 = diag0.at[:6].add(gauge_weight)
        inactive = ~node_mask
        diag0 = diag0 + jnp.repeat(inactive.astype(f32), 6) * 1.0
        H = H + jnp.diag(diag0)

        # Levenberg-Marquardt: multiplicative damping bounds the step along
        # weakly observable directions (e.g. an extrinsic-calib DoF barely
        # excited by the motion); plain GN oscillates there.
        d = jnp.diagonal(H)
        H = H + jnp.diag(lam * jnp.maximum(d, 1e-6))

        # Jacobi-preconditioned solve: the gauge weight makes κ(H) ~ 1e8,
        # beyond f32 — scaling by 1/sqrt(diag) restores conditioning
        d = jnp.diagonal(H)
        s = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-12))
        Hs = H * s[:, None] * s[None, :]
        dx = jnp.linalg.solve(Hs, -(b * s)) * s
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        dxi = dx.reshape(n, 6)
        cand = poses @ se3.exp_se3(dxi)
        cand = jnp.where(node_mask[:, None, None], cand, poses)

        # accept/reject on the true cost
        c_cand = total_cost(cand)
        c_cur = total_cost(poses)
        accept = c_cand < c_cur
        new_poses = jnp.where(accept, cand, poses)
        new_lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7), lam * 8.0)
        return (new_poses, new_lam), (c_cur, c_cand, lam)

    (poses, _), trace = jax.lax.scan(gn_step, (poses, jnp.float32(1e-4)),
                                     None, length=num_iters)

    # final chi2 for reporting (between factors only — the graph backbone)
    T_i = poses[fi]
    T_j = poses[fj]

    def chi_one(T_i, T_j, Tm, w, valid):
        r = se3.log_se3(se3.inverse(Tm) @ se3.inverse(T_i) @ T_j)
        wr = r * w * valid
        return jnp.sum(wr * wr)
    chi2 = jnp.sum(jax.vmap(chi_one)(
        T_i, T_j, T_meas, inv_sigmas, fmask.astype(f32)[:, None]))
    return poses, chi2, trace


class PoseGraph:
    """Host wrapper: collect factors, optimize with capacity bucketing.

    Capacities round up to powers of two so jit caches stay warm as the
    graph grows. The state carries NUM_SPECIAL_NODES shared calibration
    nodes after the regular pose nodes (GPS coord transform, odom
    extrinsic, GPS translation error).
    """

    def __init__(self):
        self.factors = FactorBatch.empty()
        self.gps_factors = GpsFactorBatch.empty()
        self.odom_factors = OdomFactorBatch.empty()
        self.prior_factors = PriorFactorBatch.empty()  # special-node priors
        self.num_nodes = 0
        # special node values (host f64), updated by optimize()
        self.special_values = [np.eye(4) for _ in range(NUM_SPECIAL_NODES)]
        self.last_chi2 = 0.0

    def add_node(self) -> int:
        idx = self.num_nodes
        self.num_nodes += 1
        return idx

    def add_between(self, i: int, j: int, T_ij: np.ndarray,
                    sigmas=(0.15, 0.15, 0.15, 0.1, 0.1, 0.1)):
        """sigmas order (trans xyz, rot xyz) — defaults are the reference's
        frame-match noise (isam_optimizer.cc:81-83, converted order)."""
        self.factors.add(i, j, T_ij, np.asarray(sigmas))

    def add_gps(self, i: int, enu, p_tracking_gps=(0.0, 0.0, 0.0),
                sigma: float = 0.15, use_calib_error: bool = False):
        """GPS-ENU point factor (gps_noise iso 0.15, isam_optimizer.cc:79)."""
        self.gps_factors.add(i, enu, p_tracking_gps,
                             np.full(3, sigma), use_calib_error)

    def add_odom(self, i: int, T_odom,
                 sigmas=(1.5, 1.5, 2.0, 0.2, 0.2, 0.2)):
        """Odom extrinsic-calibration factor (odom_noise Huber(1) over
        rot(0.2)/trans(1.5,1.5,2), isam_optimizer.cc:92-94; order converted
        to (trans, rot))."""
        self.odom_factors.add(i, T_odom, np.asarray(sigmas))

    def add_special_prior(self, which: int, T_prior, sigmas):
        """Prior on a special node (which ∈ {SPECIAL_GPS_COORD,
        SPECIAL_ODOM_CALIB, SPECIAL_GPS_CALIB}); index resolved at solve
        time. sigmas order (trans, rot)."""
        self.prior_factors.add(-(which + 1), T_prior, np.asarray(sigmas))

    def set_special_value(self, which: int, T: np.ndarray):
        self.special_values[which] = np.asarray(T, dtype=np.float64)

    def get_special_value(self, which: int) -> np.ndarray:
        return self.special_values[which]

    @property
    def has_aux_factors(self) -> bool:
        return (len(self.gps_factors) + len(self.odom_factors)
                + len(self.prior_factors)) > 0

    # past this node count the dense [6n, 6n] solve is replaced by the
    # matrix-free block-sparse PCG solver (pose_graph_sparse.py)
    DENSE_NODE_LIMIT = 192

    def solver_args(self, poses_np: np.ndarray, min_fcap: int = 16):
        """Build the full solver argument tuple ``(poses, node_mask, fi, fj,
        T_meas, inv_sigmas, fmask, …)`` shared by every solver backend
        (dense / PCG / sharded / multi-host — parallel/multihost.py slices
        the between-factor arrays [2:7] into per-process shards)."""
        n = self.num_nodes
        assert poses_np.shape[0] == n
        ncap = _pad_pow2(n + NUM_SPECIAL_NODES, 8)
        fcap = _pad_pow2(len(self.factors), min_fcap)
        gcap = _pad_pow2(len(self.gps_factors), 4)
        ocap = _pad_pow2(len(self.odom_factors), 4)
        pcap = _pad_pow2(len(self.prior_factors), 4)

        # special nodes live at indices n .. n+2
        sp_base = n
        gps_coord_idx = sp_base + SPECIAL_GPS_COORD
        odom_calib_idx = sp_base + SPECIAL_ODOM_CALIB
        gps_calib_idx = sp_base + SPECIAL_GPS_CALIB

        poses = np.tile(np.eye(4, dtype=np.float32), (ncap, 1, 1))
        poses[:n] = poses_np.astype(np.float32)
        for k in range(NUM_SPECIAL_NODES):
            poses[sp_base + k] = self.special_values[k].astype(np.float32)
        node_mask = np.zeros(ncap, dtype=bool)
        node_mask[:n] = True
        node_mask[sp_base + SPECIAL_GPS_COORD] = len(self.gps_factors) > 0
        node_mask[sp_base + SPECIAL_ODOM_CALIB] = len(self.odom_factors) > 0
        node_mask[sp_base + SPECIAL_GPS_CALIB] = any(
            self.gps_factors.use_err) if len(self.gps_factors) else False

        fi, fj, Tm, inv_s, fmask = self.factors.device_arrays(fcap)
        gi, g_enu, g_ptg, g_inv_s, g_ue, gmask = \
            self.gps_factors.device_arrays(gcap)
        oi, o_T, o_inv_s, omask = self.odom_factors.device_arrays(ocap)
        # resolve special-node references (stored as -(which+1))
        pf = PriorFactorBatch(
            [sp_base + (-(i) - 1) if i < 0 else i
             for i in self.prior_factors.i],
            self.prior_factors.T_prior, self.prior_factors.sigmas)
        pi, p_T, p_inv_s, pmask = pf.device_arrays(pcap)

        args = (jnp.asarray(poses), jnp.asarray(node_mask),
                fi, fj, Tm, inv_s, fmask,
                gi, g_enu, g_ptg, g_inv_s, g_ue, gmask,
                jnp.int32(gps_coord_idx), jnp.int32(gps_calib_idx),
                oi, o_T, o_inv_s, omask, jnp.int32(odom_calib_idx),
                jnp.float32(1.0),
                pi, p_T, p_inv_s, pmask)
        return args, ncap, sp_base

    def finish_optimize(self, out, chi2, sp_base, node_mask) -> np.ndarray:
        """Common post-solve bookkeeping: record chi², pull special-node
        estimates, re-orthonormalize after f32 accumulation."""
        from ..common import np_se3
        n = self.num_nodes
        self.last_chi2 = float(chi2)
        out = np.asarray(out, dtype=np.float64)
        for k in range(NUM_SPECIAL_NODES):
            if node_mask[sp_base + k]:
                self.special_values[k] = np_se3.normalize_rotation(
                    out[sp_base + k])
        return np.stack([np_se3.normalize_rotation(T) for T in out[:n]])

    def optimize(self, poses_np: np.ndarray, num_iters: int = 8,
                 solver: str = "auto", mesh=None) -> np.ndarray:
        """poses_np [n, 4, 4] f64 → optimized [n, 4, 4] f64. Special-node
        estimates are updated in ``self.special_values``.

        solver: "dense" (one MXU ``linalg.solve`` — small graphs),
        "pcg" (matrix-free block-sparse GN+PCG — scales to 10⁴+ nodes), or
        "auto" (pick by node count).  ``mesh`` switches the PCG path to the
        sharded-linearization solver (between factors sharded + psum)."""
        args, ncap, sp_base = self.solver_args(poses_np)
        if solver == "auto":
            solver = "dense" if ncap <= self.DENSE_NODE_LIMIT else "pcg"
        if solver == "dense":
            out, chi2, self.last_trace = gauss_newton(
                *args, num_iters=num_iters)
        elif mesh is not None:
            from . import pose_graph_sparse
            out, chi2, self.last_trace = pose_graph_sparse.solve_sharded(
                mesh, *args, num_iters=num_iters)
        else:
            from . import pose_graph_sparse
            out, chi2, self.last_trace = pose_graph_sparse.gauss_newton_pcg(
                *args, num_iters=num_iters)
        return self.finish_optimize(out, chi2, sp_base,
                                    np.asarray(args[1]))
