"""Microbench NN-kernel variants at the front-end shape (16384 x 2048).

Each variant runs R sequential calls inside one jit (carry-perturbed to
defeat CSE) so per-call device time is measured without dispatch overhead.

Run: python tools/bench_nn_variants.py
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from staticmapping_tpu.ops import nn_search

R = 50


def measure(fn, q, t, label):
    """fn(q8t, t8t, shift_scalar) -> (d, i); loops R times inside jit."""
    @jax.jit
    def loop(q8t, t8t):
        def body(k, acc):
            d, i = fn(q8t + acc * 1e-12, t8t)
            return acc + d[0] * 0.0 + 1.0
        return lax.fori_loop(0, R, body, jnp.float32(0.0))

    loop(q, t)
    np.asarray(loop(q, t))
    t0 = time.perf_counter()
    np.asarray(loop(q, t))
    dt = (time.perf_counter() - t0) / R
    print(f"{label:30s}: {dt*1e6:8.1f} us/call")
    return dt


# ---- variant C: packed min (single reduction) ----
def _nn_kernel_packed(qc: int, tc: int, idx_bits: int, q_ref, t_ref,
                      d_ref, i_ref):
    m = q_ref.shape[1]
    n = t_ref.shape[1]
    n_tc = n // tc
    mask_low = (1 << idx_bits) - 1

    def qbody(c, _):
        q = q_ref[:, pl.ds(c * qc, qc)]
        q2 = jnp.sum(q * q, axis=0)[:, None]

        def tbody(t_i, best):
            t = t_ref[:, pl.ds(t_i * tc, tc)]
            d2 = (q2 + jnp.sum(t * t, axis=0)[None, :]
                  - 2.0 * lax.dot_general(
                      q, t, (((0,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST))
            d2 = jnp.maximum(d2, 0.0)
            bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
            col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) \
                + t_i * tc
            key = (bits & ~mask_low) | (col & mask_low)
            return jnp.minimum(best, jnp.min(key, axis=1))

        init = jnp.full((qc,), 2**31 - 1, dtype=jnp.int32)
        best = lax.fori_loop(0, n_tc, tbody, init)
        d = jax.lax.bitcast_convert_type(best & ~mask_low, jnp.float32)
        i = best & mask_low
        r = qc // 128
        d_ref[pl.ds(c * r, r), :] = d.reshape(r, 128)
        i_ref[pl.ds(c * r, r), :] = i.reshape(r, 128)

    lax.fori_loop(0, m // qc, qbody, None)


@partial(jax.jit, static_argnames=("qc", "tc", "idx_bits"))
def nearest_packed(q8t, t8t, qc, tc, idx_bits):
    m = q8t.shape[1]
    d, i = pl.pallas_call(
        partial(_nn_kernel_packed, qc, tc, idx_bits),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((m // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((m // 128, 128), jnp.int32),
        ],
    )(q8t, t8t)
    return d.reshape(m), i.reshape(m)


# ---- variant D: augmented matmul (d2 comes straight off the MXU) ----
def _aug_q(q):   # [M, 3] -> [8, M]: rows -2x -2y -2z |q|^2 1 0 0 0
    m = q.shape[0]
    out = jnp.zeros((8, m), dtype=jnp.float32)
    out = out.at[0:3].set(-2.0 * q.T)
    out = out.at[3].set(jnp.sum(q * q, axis=1))
    out = out.at[4].set(1.0)
    return out


def _aug_t(t):   # [N, 3] -> [8, N]: rows x y z 1 |t|^2 0 0 0
    n = t.shape[0]
    out = jnp.zeros((8, n), dtype=jnp.float32)
    out = out.at[0:3].set(t.T)
    out = out.at[3].set(1.0)
    out = out.at[4].set(jnp.sum(t * t, axis=1))
    return out


def _nn_kernel_aug(qc: int, tc: int, packed: bool, q_ref, t_ref,
                   d_ref, i_ref):
    m = q_ref.shape[1]
    n = t_ref.shape[1]
    n_tc = n // tc
    mask_low = (1 << 11) - 1

    def qbody(c, _):
        q = q_ref[:, pl.ds(c * qc, qc)]

        if packed:
            def tbody(t_i, best):
                t = t_ref[:, pl.ds(t_i * tc, tc)]
                d2 = lax.dot_general(q, t, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=lax.Precision.HIGHEST)
                bits = jax.lax.bitcast_convert_type(
                    jnp.maximum(d2, 0.0), jnp.int32)
                col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) \
                    + t_i * tc
                key = (bits & ~mask_low) | (col & mask_low)
                return jnp.minimum(best, jnp.min(key, axis=1))

            best = lax.fori_loop(0, n_tc, tbody,
                                 jnp.full((qc,), 2**31 - 1, jnp.int32))
            d = jax.lax.bitcast_convert_type(best & ~mask_low, jnp.float32)
            i = best & mask_low
        else:
            def tbody(t_i, carry):
                bd, bi = carry
                t = t_ref[:, pl.ds(t_i * tc, tc)]
                d2 = lax.dot_general(q, t, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=lax.Precision.HIGHEST)
                cd = jnp.min(d2, axis=1)
                ci = jnp.argmin(d2, axis=1).astype(jnp.int32) + t_i * tc
                take = cd < bd
                return (jnp.where(take, cd, bd), jnp.where(take, ci, bi))

            d, i = lax.fori_loop(
                0, n_tc, tbody,
                (jnp.full((qc,), jnp.inf, jnp.float32),
                 jnp.zeros((qc,), jnp.int32)))
            d = jnp.maximum(d, 0.0)
        r = qc // 128
        d_ref[pl.ds(c * r, r), :] = d.reshape(r, 128)
        i_ref[pl.ds(c * r, r), :] = i.reshape(r, 128)

    lax.fori_loop(0, m // qc, qbody, None)


@partial(jax.jit, static_argnames=("qc", "tc", "packed"))
def nearest_aug(q8t, t8t, qc, tc, packed):
    m = q8t.shape[1]
    d, i = pl.pallas_call(
        partial(_nn_kernel_aug, qc, tc, packed),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((m // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((m // 128, 128), jnp.int32),
        ],
    )(q8t, t8t)
    return d.reshape(m), i.reshape(m)


def main():
    rng = np.random.default_rng(0)
    m, n = 16384, 2048
    q = jnp.asarray(rng.uniform(-30, 30, (m, 3)), dtype=jnp.float32)
    t = jnp.asarray(rng.uniform(-30, 30, (n, 3)), dtype=jnp.float32)
    q8 = nn_search._pad8(q)
    t8 = nn_search._pad8(t)

    for qc in (256, 512, 1024, 2048):
        measure(lambda a, b, qc=qc: nn_search._nearest_pallas(a, b, qc, n),
                q8, t8, f"current qc={qc} tc={n}")
    for qc in (512, 1024, 2048, 4096):
        measure(lambda a, b, qc=qc: nearest_packed(a, b, qc, n, 11),
                q8, t8, f"packed qc={qc} tc={n}")

    qa = jax.jit(_aug_q)(q)
    ta = jax.jit(_aug_t)(t)
    for qc in (512, 1024, 2048):
        measure(lambda a, b, qc=qc: nearest_aug(a, b, qc, n, False),
                qa, ta, f"aug-matmul qc={qc}")
    for qc in (512, 1024, 2048):
        measure(lambda a, b, qc=qc: nearest_aug(a, b, qc, n, True),
                qa, ta, f"aug-matmul packed qc={qc}")

    da, ia = nearest_aug(qa, ta, 512, n, False)
    dp, ip = nearest_aug(qa, ta, 512, n, True)

    # XLA scan fallback for comparison
    mask = jnp.ones((n,), dtype=bool)
    measure(lambda a, b: nn_search._nearest_scan(q, t, mask, tile=1024),
            q8, t8, "xla scan tile=1024")

    # correctness of packed vs current
    d0, i0 = nn_search._nearest_pallas(q8, t8, 512, n)
    d1, i1 = nearest_packed(q8, t8, 512, n, 11)
    agree = float(np.mean(np.asarray(i0) == np.asarray(i1)))
    derr = float(np.max(np.abs(np.asarray(d0) - np.asarray(d1))))
    print(f"packed vs current: idx agree {agree:.5f}, max d2 err {derr:.2e}")
    for nm, (dv, iv) in (("aug", (da, ia)), ("aug-packed", (dp, ip))):
        agree = float(np.mean(np.asarray(i0) == np.asarray(iv)))
        derr = float(np.max(np.abs(np.asarray(d0) - np.asarray(dv))))
        print(f"{nm} vs current: idx agree {agree:.5f}, max d2 err {derr:.2e}")


if __name__ == "__main__":
    main()
