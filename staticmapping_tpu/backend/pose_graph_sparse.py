"""Block-sparse SE(3) pose-graph solver: Gauss-Newton + preconditioned CG.

The dense solver in :mod:`pose_graph` materializes an ``[6n, 6n]`` normal
matrix — unusable past ~10³ nodes (at 10⁴ nodes that is a 14 GB f32 matrix).
This module solves the same factor model (between / GPS-ENU / odom-extrinsic /
prior — isam_optimizer.cc:127-288 parity) without ever building H:

* Linearization produces only the nonzero 6×6 (between), 18×18 (GPS),
  12×12 (odom) and 6×6 (prior) blocks — one ``vmap`` per factor type.
* The Newton system ``H dx = −b`` is solved by conjugate gradients where
  ``H·v`` is computed matrix-free: gather the per-factor slices of ``v``,
  multiply by the cached blocks, scatter-add — O(F·36) FLOPs per matvec,
  all MXU-friendly batched small matmuls.
* Preconditioner: block-Jacobi — the [n, 6, 6] diagonal blocks of H
  (including LM damping and the gauge prior), inverted once per GN
  iteration with a batched 6×6 solve.
* Levenberg-Marquardt accept/reject on the true cost, identical to the
  dense path.

Distribution (SURVEY §5.8): ``gauss_newton_pcg`` takes an optional
``axis_name``.  When run inside ``shard_map`` with the *between-factor axis*
sharded over a mesh, every device linearizes its factor shard and the
matvec/gradient/diagonal partial sums are combined with ``psum`` — the PCG
state (x, r, p, z) stays replicated.  ``solve_sharded`` wraps this for a
1-D mesh.  The small factor types (GPS/odom/prior) are replicated and
scaled by 1/D so the psum does not double-count them.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..common import se3
from .pose_graph import (_lin_between, _lin_gps, _lin_odom, _lin_prior,
                         _make_total_cost)

_F32 = jnp.float32


def _bmv(B, v):
    """Batched block(6x6-ish) · vector: [F,a,b] · [F,b] → [F,a]."""
    return jnp.einsum("fab,fb->fa", B, v,
                      precision=jax.lax.Precision.HIGHEST)


def _pcg_core(poses, node_mask,
              fi, fj, T_meas, inv_sigmas, fmask,
              gi, g_enu, g_ptg, g_inv_s, g_use_err, gmask,
              gps_coord_idx, gps_calib_idx,
              oi, o_T, o_inv_s, omask, odom_calib_idx, huber_k,
              pi, p_T, p_inv_s, pmask,
              num_iters, cg_iters, damping, gauge_weight, cg_tol,
              axis_name: Optional[str]):
    n = poses.shape[0]
    f32 = _F32

    def psum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    # replicated-factor scale: small factor types are computed identically on
    # every device; divide by the device count so psum restores the true sum.
    if axis_name:
        inv_d = 1.0 / jax.lax.psum(1, axis_name)
    else:
        inv_d = 1.0

    total_cost_local = _make_total_cost(
        fi, fj, T_meas, inv_sigmas, fmask,
        gi, g_enu, g_ptg, g_inv_s, g_use_err, gmask,
        gps_coord_idx, gps_calib_idx,
        oi, o_T, o_inv_s, omask, odom_calib_idx, huber_k,
        pi, p_T, p_inv_s, pmask)

    def total_cost(poses):
        # between factors are sharded; the rest replicated (scale by inv_d)
        def between_one(T_i, T_j, Tm, w, valid):
            r = se3.log_se3(se3.inverse(Tm) @ se3.inverse(T_i) @ T_j)
            wr = r * w * valid
            return jnp.sum(wr * wr)
        c_btw = jnp.sum(jax.vmap(between_one)(
            poses[fi], poses[fj], T_meas, inv_sigmas,
            fmask.astype(f32)[:, None]))
        c_rest = (total_cost_local(poses) - c_btw) * inv_d
        return psum(c_btw + c_rest)

    def gn_step(carry, _):
        poses, lam = carry

        # ---- linearize all factor types → blocks ----
        H_ii, H_ij, H_jj, b_i, b_j = jax.vmap(_lin_between)(
            poses[fi], poses[fj], T_meas, inv_sigmas,
            fmask.astype(f32)[:, None])
        G = gi.shape[0]
        Hg, bg = jax.vmap(_lin_gps)(
            poses[gi], jnp.broadcast_to(poses[gps_coord_idx], (G, 4, 4)),
            jnp.broadcast_to(poses[gps_calib_idx], (G, 4, 4)),
            g_ptg, g_enu, g_use_err, g_inv_s, gmask.astype(f32)[:, None])
        O = oi.shape[0]
        Ho, bo = jax.vmap(_lin_odom, in_axes=(0, 0, 0, 0, 0, None))(
            poses[oi], jnp.broadcast_to(poses[odom_calib_idx], (O, 4, 4)),
            o_T, o_inv_s, omask.astype(f32)[:, None], huber_k)
        Hp, bp = jax.vmap(_lin_prior)(
            poses[pi], p_T, p_inv_s, pmask.astype(f32)[:, None])

        # ---- gradient b [n, 6] (psum over factor shards) ----
        b = jnp.zeros((n, 6), dtype=f32)
        b = b.at[fi].add(b_i)
        b = b.at[fj].add(b_j)
        b_small = jnp.zeros((n, 6), dtype=f32)
        b_small = b_small.at[gi].add(bg[:, 0:6])
        b_small = b_small.at[gps_coord_idx].add(jnp.sum(bg[:, 6:12], axis=0))
        b_small = b_small.at[gps_calib_idx].add(jnp.sum(bg[:, 12:18], axis=0))
        b_small = b_small.at[oi].add(bo[:, 0:6])
        b_small = b_small.at[odom_calib_idx].add(jnp.sum(bo[:, 6:12], axis=0))
        b_small = b_small.at[pi].add(bp)
        b = psum(b + b_small * inv_d)

        # ---- block-diagonal of H [n, 6, 6] ----
        D = jnp.zeros((n, 6, 6), dtype=f32)
        D = D.at[fi].add(H_ii)
        D = D.at[fj].add(H_jj)
        D_small = jnp.zeros((n, 6, 6), dtype=f32)
        D_small = D_small.at[gi].add(Hg[:, 0:6, 0:6])
        D_small = D_small.at[gps_coord_idx].add(
            jnp.sum(Hg[:, 6:12, 6:12], axis=0))
        D_small = D_small.at[gps_calib_idx].add(
            jnp.sum(Hg[:, 12:18, 12:18], axis=0))
        D_small = D_small.at[oi].add(Ho[:, 0:6, 0:6])
        D_small = D_small.at[odom_calib_idx].add(
            jnp.sum(Ho[:, 6:12, 6:12], axis=0))
        D_small = D_small.at[pi].add(Hp)
        D = psum(D + D_small * inv_d)

        # ---- scalar diagonal additions: base damping, gauge, inactive,
        #      LM multiplicative damping on the H diagonal ----
        diag_h = jnp.diagonal(D, axis1=1, axis2=2)        # [n, 6]
        extra = jnp.full((n, 6), damping, dtype=f32)
        extra = extra.at[0].add(gauge_weight)
        extra = extra + (~node_mask).astype(f32)[:, None] * 1.0
        extra = extra + lam * jnp.maximum(diag_h, 1e-6)

        eye6 = jnp.eye(6, dtype=f32)
        D_pre = D + extra[:, :, None] * eye6[None]        # precond blocks
        # invert the block-Jacobi preconditioner ONCE per GN step (a CG
        # apply is then a batched 6×6 matvec, not a batched factorization)
        D_inv = jnp.linalg.inv(D_pre)
        D_inv = jnp.where(jnp.isfinite(D_inv), D_inv, 0.0)

        def matvec(v):
            """H·v [n,6] — matrix-free, psum over the factor shards."""
            vi = v[fi]
            vj = v[fj]
            u = jnp.zeros((n, 6), dtype=f32)
            u = u.at[fi].add(_bmv(H_ii, vi) + _bmv(H_ij, vj))
            u = u.at[fj].add(_bmv(jnp.swapaxes(H_ij, 1, 2), vi)
                             + _bmv(H_jj, vj))
            u_s = jnp.zeros((n, 6), dtype=f32)
            vg = jnp.concatenate([
                v[gi], jnp.broadcast_to(v[gps_coord_idx], (G, 6)),
                jnp.broadcast_to(v[gps_calib_idx], (G, 6))], axis=1)
            ug = _bmv(Hg, vg)
            u_s = u_s.at[gi].add(ug[:, 0:6])
            u_s = u_s.at[gps_coord_idx].add(jnp.sum(ug[:, 6:12], axis=0))
            u_s = u_s.at[gps_calib_idx].add(jnp.sum(ug[:, 12:18], axis=0))
            vo = jnp.concatenate([
                v[oi], jnp.broadcast_to(v[odom_calib_idx], (O, 6))], axis=1)
            uo = _bmv(Ho, vo)
            u_s = u_s.at[oi].add(uo[:, 0:6])
            u_s = u_s.at[odom_calib_idx].add(jnp.sum(uo[:, 6:12], axis=0))
            u_s = u_s.at[pi].add(_bmv(Hp, v[pi]))
            return psum(u + u_s * inv_d) + extra * v

        def precond(r):
            return _bmv(D_inv, r)

        # ---- PCG on H dx = −b ----
        rhs = -b
        rhs_norm = jnp.sqrt(jnp.sum(rhs * rhs))
        x0 = jnp.zeros((n, 6), dtype=f32)
        r0 = rhs
        z0 = precond(r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def cg_cond(state):
            k, x, r, p, rz = state
            rn = jnp.sqrt(jnp.sum(r * r))
            return jnp.logical_and(k < cg_iters,
                                   rn > cg_tol * rhs_norm)

        def cg_body(state):
            k, x, r, p, rz = state
            Hp_ = matvec(p)
            denom = jnp.sum(p * Hp_)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * p
            r = r - alpha * Hp_
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return k + 1, x, r, p, rz_new

        _, dx, _, _, _ = jax.lax.while_loop(
            cg_cond, cg_body, (jnp.int32(0), x0, r0, p0, rz0))
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

        cand = poses @ se3.exp_se3(dx)
        cand = jnp.where(node_mask[:, None, None], cand, poses)

        c_cand = total_cost(cand)
        c_cur = total_cost(poses)
        accept = c_cand < c_cur
        new_poses = jnp.where(accept, cand, poses)
        new_lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-7), lam * 8.0)
        return (new_poses, new_lam), (c_cur, c_cand, lam)

    (poses, _), trace = jax.lax.scan(gn_step, (poses, jnp.float32(1e-4)),
                                     None, length=num_iters)

    # final chi2 over between factors (graph backbone), globally reduced
    def chi_one(T_i, T_j, Tm, w, valid):
        r = se3.log_se3(se3.inverse(Tm) @ se3.inverse(T_i) @ T_j)
        wr = r * w * valid
        return jnp.sum(wr * wr)
    chi2 = psum(jnp.sum(jax.vmap(chi_one)(
        poses[fi], poses[fj], T_meas, inv_sigmas,
        fmask.astype(f32)[:, None])))
    return poses, chi2, trace


@partial(jax.jit, static_argnames=("num_iters", "cg_iters"))
def gauss_newton_pcg(poses, node_mask,
                     fi, fj, T_meas, inv_sigmas, fmask,
                     gi, g_enu, g_ptg, g_inv_s, g_use_err, gmask,
                     gps_coord_idx, gps_calib_idx,
                     oi, o_T, o_inv_s, omask, odom_calib_idx, huber_k,
                     pi, p_T, p_inv_s, pmask,
                     num_iters: int = 8, cg_iters: int = 250,
                     damping: float = 1e-6, gauge_weight: float = 1e8,
                     cg_tol: float = 1e-8):
    """Single-device matrix-free GN/LM + PCG (same signature family as
    :func:`pose_graph.gauss_newton`)."""
    return _pcg_core(poses, node_mask,
                     fi, fj, T_meas, inv_sigmas, fmask,
                     gi, g_enu, g_ptg, g_inv_s, g_use_err, gmask,
                     gps_coord_idx, gps_calib_idx,
                     oi, o_T, o_inv_s, omask, odom_calib_idx, huber_k,
                     pi, p_T, p_inv_s, pmask,
                     num_iters, cg_iters, damping, gauge_weight, cg_tol,
                     axis_name=None)


def solve_sharded(mesh: Mesh, poses, node_mask,
                  fi, fj, T_meas, inv_sigmas, fmask,
                  gi, g_enu, g_ptg, g_inv_s, g_use_err, gmask,
                  gps_coord_idx, gps_calib_idx,
                  oi, o_T, o_inv_s, omask, odom_calib_idx, huber_k,
                  pi, p_T, p_inv_s, pmask,
                  num_iters: int = 8, cg_iters: int = 250,
                  damping: float = 1e-6, gauge_weight: float = 1e8,
                  cg_tol: float = 1e-8):
    """Distributed solve: shard the between-factor axis over the mesh's
    first axis; each device linearizes its shard and the partial H·v / b /
    diag sums are ``psum``-combined (SURVEY §5.8).  The between-factor
    capacity must be divisible by the mesh size (pad with masked factors).
    """
    axis = mesh.axis_names[0]
    fspec = P(axis)
    rep = P()

    body = partial(_pcg_core, num_iters=num_iters, cg_iters=cg_iters,
                   damping=damping, gauge_weight=gauge_weight,
                   cg_tol=cg_tol, axis_name=axis)

    fn = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep,
                  fspec, fspec, fspec, fspec, fspec,
                  rep, rep, rep, rep, rep, rep,
                  rep, rep,
                  rep, rep, rep, rep, rep, rep,
                  rep, rep, rep, rep),
        out_specs=(rep, rep, rep), check_vma=False))
    return fn(poses, node_mask,
              fi, fj, T_meas, inv_sigmas, fmask,
              gi, g_enu, g_ptg, g_inv_s, g_use_err, gmask,
              gps_coord_idx, gps_calib_idx,
              oi, o_T, o_inv_s, omask, odom_calib_idx, huber_k,
              pi, p_T, p_inv_s, pmask)
