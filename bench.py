"""Benchmark: registered scans/sec on one chip (front-end hot path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); its front end is
single-threaded FastICP with a libnabo kd-tree — typical published timings
for this class of pipeline on a desktop CPU are ~10 scans/s (100 ms/frame;
the reference's own offline replay runs at ~10x real time on pre-recorded
bags, static_mapping_node.cpp:418-421, i.e. ~10 Hz processing of 10 Hz
data). vs_baseline = scans_per_sec / 10.
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SCANS_PER_SEC = 10.0


def main():
    import jax
    import jax.numpy as jnp
    from staticmapping_tpu.data import cloud as cloud_lib
    from staticmapping_tpu.ops.normals import estimate_normals
    from staticmapping_tpu.registration.icp_fast import align_point_to_plane
    from staticmapping_tpu.io import synthetic

    capacity = 32768
    leaf = 8

    scans, gt = synthetic.make_sequence(
        n_scans=12, seed=0, trajectory="straight", step=0.5,
        max_points=20000)

    clouds = [cloud_lib.from_numpy(s, capacity=capacity) for s in scans]

    # warm up / compile both stages
    tgt = estimate_normals(clouds[0].compact(), leaf_size=leaf)
    guess = jnp.eye(4, dtype=jnp.float32)
    T, score = align_point_to_plane(clouds[1], tgt, guess, tile=1024)
    jax.block_until_ready((tgt, T, score))

    # timed loop: normals(target) + align per scan — the per-keyframe work
    # of the front end (map_builder.cc ScanMatchProcessing hot path)
    n_iter = 10
    t0 = time.perf_counter()
    for i in range(n_iter):
        src = clouds[1 + (i % (len(clouds) - 2))]
        tgt_i = estimate_normals(clouds[i % (len(clouds) - 2)].compact(),
                                 leaf_size=leaf)
        T, score = align_point_to_plane(src, tgt_i, guess, tile=1024)
    jax.block_until_ready((T, score))
    dt = time.perf_counter() - t0

    scans_per_sec = n_iter / dt
    print(json.dumps({
        "metric": "registered_scans_per_sec_per_chip",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / REFERENCE_SCANS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
