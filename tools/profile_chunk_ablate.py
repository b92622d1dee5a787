"""Ablation timing of the device front-end chunk: which stage costs what.

Runs the same 32-scan chunk with stages disabled one at a time:
  base          — full step (motion comp, ICP<=100, keyframe normals)
  icp1          — max_iteration=1 (isolates ICP iterations)
  nokf          — motion filter huge -> no keyframe switch, no normals
  nocomp        — motion_compensation off
  icp1+nokf     — floor: everything but ICP iters + normals

Run: python tools/profile_chunk_ablate.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_variant(name, scans, **fe_kwargs):
    from staticmapping_tpu.builder.frontend import (FrontEndOptions,
                                                    MotionFilterOptions)
    from staticmapping_tpu.builder.pipeline import DeviceFrontEnd

    opts = FrontEndOptions(scan_capacity=16384, nn_tile=1024, **fe_kwargs)
    fe = DeviceFrontEnd(opts, chunk_size=32, queue_depth=1)
    for i, pts in enumerate(scans[:66]):
        fe.process(i * 0.1, pts)
    t0 = time.perf_counter()
    for i, pts in enumerate(scans[66:130]):
        fe.process((66 + i) * 0.1, pts)
    dt = (time.perf_counter() - t0) / 2
    print(f"{name:14s}: {dt*1e3:7.1f} ms/chunk32  ({32/dt:6.1f} scans/s)")
    return dt


def main():
    from staticmapping_tpu.builder.frontend import MotionFilterOptions
    from staticmapping_tpu.io import synthetic

    scans, _ = synthetic.make_sequence(
        n_scans=130, seed=3, trajectory="straight", step=0.5,
        max_points=15000, max_range=60.0)

    nokf = MotionFilterOptions(translation_range=1e9, angle_range=0.0)
    run_variant("base", scans)
    run_variant("icp1", scans, max_iteration=1)
    run_variant("nokf", scans, motion_filter=nokf)
    run_variant("nocomp", scans, motion_compensation=False)
    run_variant("icp1+nokf", scans, max_iteration=1, motion_filter=nokf)
    run_variant("icp1+nokf+nc", scans, max_iteration=1, motion_filter=nokf,
                motion_compensation=False)


if __name__ == "__main__":
    main()
