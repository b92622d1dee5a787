"""Dissect the ~218 ms/chunk floor of the device front end.

Times: (a) host pack alone, (b) H2D alone, (c) _run_chunk device program
alone on pre-staged device inputs, (d) harvest readback alone.

Run: python tools/profile_floor.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    from staticmapping_tpu.builder.frontend import (FrontEndOptions,
                                                    MotionFilterOptions)
    from staticmapping_tpu.builder.pipeline import DeviceFrontEnd
    from staticmapping_tpu.io import synthetic

    scans, _ = synthetic.make_sequence(
        n_scans=70, seed=3, trajectory="straight", step=0.5,
        max_points=15000, max_range=60.0)

    K, cap = 32, 16384
    opts = FrontEndOptions(scan_capacity=cap, nn_tile=1024,
                           max_iteration=1,
                           motion_filter=MotionFilterOptions(
                               translation_range=1e9, angle_range=0.0))
    fe = DeviceFrontEnd(opts, chunk_size=K, queue_depth=1)
    for i, pts in enumerate(scans[:66]):
        fe.process(i * 0.1, pts)

    # ---- (a) host pack alone ----
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        stamps = np.zeros((K,), dtype=np.float32)
        xyz = np.full((K, cap, 3), -1e6, dtype=np.float32)
        inten = np.zeros((K, cap), dtype=np.float32)
        mask = np.zeros((K, cap), dtype=bool)
        for i in range(K):
            pts = scans[i % 60]
            n = min(len(pts), cap)
            xyz[i, :n] = pts[:n, :3]
            if pts.shape[1] > 3:
                inten[i, :n] = pts[:n, 3]
            mask[i, :n] = True
    t_pack = (time.perf_counter() - t0) / reps
    print(f"host pack 32x16384: {t_pack*1e3:.1f} ms")

    # ---- (b) H2D alone ----
    t0 = time.perf_counter()
    for _ in range(reps):
        dx = jnp.asarray(xyz)
        di = jnp.asarray(inten)
        dm = jnp.asarray(mask)
        np.asarray(dx[0, 0, 0])   # sync
    t_h2d = (time.perf_counter() - t0) / reps
    print(f"H2D 32x16384 (~8 MB): {t_h2d*1e3:.1f} ms")

    # ---- (c) chunk device program alone ----
    state = fe.state
    dstamps = jnp.asarray(np.arange(K, dtype=np.float32) * 0.1 + 6.6)
    dvalid = jnp.asarray(np.ones((K,), bool))
    new_state, outs = fe._run_chunk(state, dstamps, dx, di, dm, dvalid)
    np.asarray(outs[1])  # warm sync
    t0 = time.perf_counter()
    for _ in range(reps):
        new_state, outs = fe._run_chunk(state, dstamps, dx, di, dm, dvalid)
        np.asarray(outs[1])
    t_dev = (time.perf_counter() - t0) / reps
    print(f"_run_chunk device program (icp1+nokf): {t_dev*1e3:.1f} ms")

    # ---- (d) readback of the per-chunk outputs ----
    poses, scores, kf, sources = outs
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(poses)
        np.asarray(scores)
        np.asarray(kf)
    t_rb = (time.perf_counter() - t0) / reps
    print(f"readback poses+scores+kf: {t_rb*1e3:.1f} ms")

    # ---- (c2) same but max_iteration=100 / real motion filter ----
    opts2 = FrontEndOptions(scan_capacity=cap, nn_tile=1024)
    fe2 = DeviceFrontEnd(opts2, chunk_size=K, queue_depth=1)
    for i, pts in enumerate(scans[:66]):
        fe2.process(i * 0.1, pts)
    new_state, outs = fe2._run_chunk(fe2.state, dstamps, dx, di, dm, dvalid)
    np.asarray(outs[1])
    t0 = time.perf_counter()
    for _ in range(reps):
        new_state, outs = fe2._run_chunk(fe2.state, dstamps, dx, di, dm,
                                         dvalid)
        np.asarray(outs[1])
    t_dev2 = (time.perf_counter() - t0) / reps
    print(f"_run_chunk device program (full): {t_dev2*1e3:.1f} ms")


if __name__ == "__main__":
    main()
