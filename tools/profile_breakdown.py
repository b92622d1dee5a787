"""Per-stage TPU timing breakdown of the front-end pipeline.

Times each device program in isolation on the real TPU (axon tunnel):
NN kernel per ICP iteration, full ICP align (+iteration count), normal
estimation, chunk dispatch, submap merge.  All timings force a readback
(np.asarray) because block_until_ready is a no-op on this backend.

Run:  python tools/profile_breakdown.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timeit(fn, n=20, warm=3):
    """fn must return a device array; we read one leaf back to sync."""
    for _ in range(warm):
        out = fn()
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf)
    return (time.perf_counter() - t0) / n


def main():
    from staticmapping_tpu.data import cloud as cloud_lib
    from staticmapping_tpu.io import synthetic
    from staticmapping_tpu.ops import nn_search
    from staticmapping_tpu.ops.normals import estimate_normals
    from staticmapping_tpu.registration.icp_fast import align_point_to_plane

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    scans, gt = synthetic.make_sequence(
        n_scans=4, seed=3, trajectory="straight", step=0.5,
        max_points=15000, max_range=60.0)
    cap = 16384
    c0 = cloud_lib.from_numpy(scans[0], capacity=cap)
    c1 = cloud_lib.from_numpy(scans[1], capacity=cap)

    # ---- target normals (per keyframe switch) ----
    tgt = estimate_normals(c0.compact(), leaf_size=8)
    t_norm = timeit(lambda: estimate_normals(c0.compact(), leaf_size=8))
    print(f"normals 16384 leaf8 (per keyframe): {t_norm*1e3:.2f} ms")

    # ---- NN kernel alone at the front-end ICP shape ----
    q = c1.xyz
    t_nn = timeit(lambda: nn_search.nearest_1(q, tgt.xyz, tgt.mask))
    print(f"nn 16384x2048 (per ICP iteration): {t_nn*1e3:.2f} ms")

    # ---- full ICP align + iteration count ----
    guess = jnp.eye(4, dtype=jnp.float32)
    T, score, iters = align_point_to_plane(
        c1, tgt, guess, max_iteration=100, return_aux=True)
    n_it = int(iters)
    t_icp = timeit(lambda: align_point_to_plane(
        c1, tgt, guess, max_iteration=100, return_aux=True))
    print(f"icp align 16384x2048: {t_icp*1e3:.2f} ms over {n_it} iters "
          f"-> {t_icp/max(n_it,1)*1e3:.3f} ms/iter  score={float(score):.3f}")

    # ---- ICP pinned to exactly n_it iterations split: how much is NN? ----
    # time a single-iteration ICP to get fixed overhead
    t_icp1 = timeit(lambda: align_point_to_plane(
        c1, tgt, guess, max_iteration=1, return_aux=True))
    print(f"icp align 1 iter: {t_icp1*1e3:.2f} ms")

    # ---- quantile_fast alone ----
    d2 = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (cap,)))
    mask = c1.mask
    qf = jax.jit(lambda d, m: nn_search.masked_quantile_fast(d, m, 0.7))
    t_q = timeit(lambda: qf(d2, mask))
    print(f"quantile_fast 16384 (per iter): {t_q*1e3:.2f} ms")

    # ---- submap-pair shape NN (32768 src x 4096 tgt after leaf8) ----
    c32 = cloud_lib.from_numpy(
        np.concatenate([scans[0], scans[1]]), capacity=32768)
    tgt32 = estimate_normals(c32.compact(), leaf_size=8)
    t_nn32 = timeit(lambda: nn_search.nearest_1(
        c32.xyz, tgt32.xyz, tgt32.mask))
    print(f"nn 32768x4096 (pair-match iter): {t_nn32*1e3:.2f} ms")

    t_icp32 = timeit(lambda: align_point_to_plane(
        c32, tgt32, guess, max_iteration=100, return_aux=True), n=10)
    _, s32, it32 = align_point_to_plane(
        c32, tgt32, guess, max_iteration=100, return_aux=True)
    print(f"icp align 32768x4096: {t_icp32*1e3:.2f} ms over {int(it32)} "
          f"iters")

    # ---- batched normals at flush shape (16 x 32768) ----
    cb = jax.tree.map(lambda x: jnp.broadcast_to(x[None],
                                                 (16,) + x.shape), c32)
    bn = jax.jit(jax.vmap(lambda c: estimate_normals(c, leaf_size=8)))
    t_bn = timeit(lambda: bn(cb), n=5)
    print(f"batched normals 16x32768 (per flush): {t_bn*1e3:.2f} ms")

    # ---- chunk dispatch (32 scans) ----
    from staticmapping_tpu.builder.frontend import FrontEndOptions
    from staticmapping_tpu.builder.pipeline import DeviceFrontEnd

    scans300, _ = synthetic.make_sequence(
        n_scans=100, seed=3, trajectory="straight", step=0.5,
        max_points=15000, max_range=60.0)
    fe = DeviceFrontEnd(
        FrontEndOptions(scan_capacity=cap, nn_tile=1024),
        chunk_size=32, queue_depth=1)
    for i, pts in enumerate(scans300[:66]):
        fe.process(i * 0.1, pts)
    # steady state now; time one more chunk end to end
    t0 = time.perf_counter()
    for i, pts in enumerate(scans300[66:98]):
        fe.process((66 + i) * 0.1, pts)
    t_chunk = time.perf_counter() - t0
    print(f"front-end chunk of 32 (incl. host pack): {t_chunk*1e3:.1f} ms "
          f"-> {32/t_chunk:.1f} scans/s front-end-only")


if __name__ == "__main__":
    main()
