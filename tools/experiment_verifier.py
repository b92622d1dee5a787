"""Loop-verifier false-accept experiment (VERDICT r03 #6 / r04 #5).

Question: the loop detector verifies candidates with the SAME
point-to-plane solver family the front end uses (different sampling /
iteration knobs — registration/icp_pm.py); the reference uses a different
library entirely (back_end/loop_detector.cc:304).  Does sharing the
solver family inflate the false-accept rate, and would an
independent-family verifier (NDT or GICP — both in registration/) do
better?

Protocol:
  * TRUE pairs — submap-scale clouds rendered at poses that genuinely
    overlap (loop revisits), presented with a drift-perturbed guess
    (0.5-3 m translation + up to 6° yaw: the drift regime a detector
    actually sees, SURVEY §7.3).
  * FALSE pairs — clouds rendered ≥ 60 m apart (no overlap), presented
    with a plausible guess as a mis-gated candidate would be.
  * Every verifier scores every pair; accept = score > 0.75 with the
    density-normalized fitness (config/synthetic.xml thresholds).

Metrics per verifier: true-accept rate (higher better), mean pose error
of accepted true pairs, false-accept rate (lower better).

Run:  python tools/experiment_verifier.py       (writes JSON to stdout)
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from staticmapping_tpu.common import np_se3
from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.io import synthetic
from staticmapping_tpu.builder.frontend import _target_normals
from staticmapping_tpu.registration.icp_fast import align_point_to_plane
from staticmapping_tpu.registration.ndt import build_ndt_map, align_ndt
from staticmapping_tpu.registration.gicp import (align_gicp,
                                                 compute_point_normals)

ACCEPT = 0.75
SPACING_REF = 0.35
CAP = 16384
LEAF = 8


def _cloud_at(world_pose, seed):
    pts = synthetic.render_scan(synthetic.make_world(seed=7), world_pose,
                                seed=seed, max_points=15000, max_range=60.0)
    return cloud_lib.from_numpy(pts, capacity=CAP)


def _pose(x, y, yaw):
    T = np.eye(4)
    T[:3, :3] = np_se3.euler_to_matrix(np.array([0.0, 0.0, yaw]))
    T[:3, 3] = (x, y, 1.8)
    return T


def _pairs(rng, n, far):
    """Yield (src_cloud, tgt_cloud, guess, T_true|None)."""
    out = []
    for k in range(n):
        x, y = rng.uniform(-30, 30, 2)
        yaw = rng.uniform(-np.pi, np.pi)
        A = _pose(x, y, yaw)
        if far:
            # disjoint area: ≥60 m away
            ang = rng.uniform(0, 2 * np.pi)
            B = _pose(x + 75 * np.cos(ang), y + 75 * np.sin(ang),
                      rng.uniform(-np.pi, np.pi))
        else:
            # genuine revisit: within 4 m / 20°
            B = _pose(x + rng.uniform(-4, 4), y + rng.uniform(-4, 4),
                      yaw + rng.uniform(-0.35, 0.35))
        src = _cloud_at(B, seed=100 + 2 * k)
        tgt = _cloud_at(A, seed=101 + 2 * k)
        T_true = np.linalg.solve(A, B)
        # detector-style drifted guess (z zeroed like loop_detector)
        drift = _pose(rng.uniform(-3, 3), rng.uniform(-3, 3),
                      rng.uniform(-0.1, 0.1))
        drift[:3, 3][2] = 0.0
        guess = T_true @ drift if not far else np.eye(4)
        out.append((src, tgt, guess.astype(np.float32),
                    None if far else T_true))
    return out


def _verify_icp_pm(src, tgt_nc, guess):
    T, s = align_point_to_plane(src, tgt_nc, jnp.asarray(guess),
                                max_iteration=60,
                                score_spacing_ref=SPACING_REF)
    return np.asarray(T, dtype=np.float64), float(s)


def _verify_ndt(src, tgt, guess):
    m = build_ndt_map(tgt.compact(), 1.0, min_points=4)
    T, s = align_ndt(src, m, jnp.asarray(guess), max_iteration=35)
    return np.asarray(T, dtype=np.float64), float(s)


def _verify_gicp(src_g, tgt_g, guess):
    """PRODUCTION-parity gate scoring (backend/loop_detector.py
    _independent_gate): 4x-thinned clouds, k=20 disk normals, 8 refinement
    iterations at the candidate pose, and the spacing-normalized fitness
    (score ** (ref/spacing)) so the threshold is density-portable."""
    from staticmapping_tpu.registration.icp_fast import target_spacing
    T, s = align_gicp(src_g, tgt_g, jnp.asarray(guess), max_iteration=8,
                      max_correspondence_dist=2.0)
    sp = jnp.maximum(target_spacing(tgt_g), 1e-3)
    s = s ** (SPACING_REF / sp)
    return np.asarray(T, dtype=np.float64), float(s)


def main():
    rng = np.random.default_rng(42)
    true_pairs = _pairs(rng, 12, far=False)
    false_pairs = _pairs(rng, 12, far=True)

    def score_pair(name, src, tgt, guess):
        if name == "icp_pm":
            return _verify_icp_pm(src, _target_normals(tgt, LEAF), guess)
        if name == "ndt":
            return _verify_ndt(src, tgt, guess)
        thin = lambda c: jax.tree.map(lambda x: x[::4], c)
        return _verify_gicp(compute_point_normals(thin(src), k=20),
                            compute_point_normals(thin(tgt), k=20), guess)

    results = {}
    for name in ("icp_pm", "ndt", "gicp"):
        trues = [(score_pair(name, s_, t_, g)) + (Tt,)
                 for s_, t_, g, Tt in true_pairs]
        falses = [score_pair(name, s_, t_, g)[1]
                  for s_, t_, g, _ in false_pairs]
        # NDT/GICP scores follow their own fitness laws — calibrate each
        # family's acceptance the same way the production threshold was
        # (0.85 × that family's median true-pair score); icp_pm keeps the
        # production 0.75 density-normalized threshold.
        thr = ACCEPT if name == "icp_pm" else \
            0.85 * float(np.median([s for _, s, _ in trues]))
        ta = sum(1 for _, s, _ in trues if s > thr)
        fa = sum(1 for s in falses if s > thr)
        pose_err = [float(np.linalg.norm(np.linalg.solve(Tt, T)[:3, 3]))
                    for T, s, Tt in trues if s > thr]
        results[name] = {
            "threshold": round(thr, 3),
            "true_accept": f"{ta}/{len(true_pairs)}",
            "false_accept": f"{fa}/{len(false_pairs)}",
            "max_false_score": round(max(falses), 3),
            "min_true_score": round(min(s for _, s, _ in trues), 3),
            "accepted_pose_err_mean_m": round(float(np.mean(pose_err)), 3)
            if pose_err else None,
        }
        print(f"[exp] {name}: {results[name]}", file=sys.stderr, flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
