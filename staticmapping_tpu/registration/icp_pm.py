"""IcpUsingPointMatcher-equivalent — "type 1" matcher, the reference's
hard-coded loop-closure verifier (back_end/loop_detector.cc:304).

The reference wraps libpointmatcher with its default pipeline
(registrators/icp_pointmatcher.cc:166-247):
  RandomSampling(prob 0.9) on the reading, SamplingSurfaceNormal(knn 7,
  ratio 0.1) on the reference, KDTreeMatcher(knn 1, ε 3.16),
  TrimmedDist(0.7), PointToPlane minimizer, Counter(150) +
  Differential(rot 0.001 / trans 0.01, smooth 4) checkers; final score =
  exp(−mean matched distance), accept iff ≥ 0.6 (cc:139-148).

TPU-native: the pipeline collapses onto the same batched point-to-plane
kernel as IcpFast (identical trim ratio, convergence constants and score
law) with the PM-specific pre-steps re-expressed as masked ops:
  * reading random sampling → deterministic per-point hash thinning
    (keep probability 0.9) — no host RNG state, same distributional effect
  * reference SamplingSurfaceNormal(knn 7, ratio 0.1) → the leaf-split
    normal estimator at leaf_size 8 (≈ knn 7 + ~10× downsample)
  * Counter(150) → max_iteration 150.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..data.cloud import PointCloud
from ..ops.normals import estimate_normals
from .icp_fast import align_point_to_plane


import functools


@functools.partial(jax.jit, static_argnames=("keep_prob",))
def _hash_thin(cloud: PointCloud, keep_prob: float) -> PointCloud:
    """Deterministic ~keep_prob thinning by integer hash of the point index
    (RandomSamplingDataPointsFilter role, prob=0.9).  Jitted: callers hit
    this per loop candidate, and eager ops over a remote-TPU tunnel cost a
    dispatch each."""
    n = cloud.capacity
    idx = jnp.arange(n, dtype=jnp.uint32)
    h = idx * jnp.uint32(2654435761)
    h ^= h >> 16
    keep = (h % jnp.uint32(1000)) < jnp.uint32(int(keep_prob * 1000))
    return cloud.with_mask(keep)


@dataclasses.dataclass
class IcpPointMatcher:
    """Stateful matcher with the PM default-pipeline knobs."""

    reading_sample_prob: float = 0.9
    normal_leaf_size: int = 8
    dist_outlier_ratio: float = 0.7   # TrimmedDistOutlierFilter ratio
    max_iteration: int = 150          # CounterTransformationChecker
    accept_min_score: float = 0.6     # icp_pointmatcher.cc:145-147

    TYPE = 1  # registrator::Type::kIcpPM (interface.h:41-50)

    _source: PointCloud = None
    _target = None
    final_score: float = 0.0

    def set_input_source(self, cloud: PointCloud):
        self._source = _hash_thin(cloud, self.reading_sample_prob)

    def set_input_target(self, target: PointCloud):
        self._target = estimate_normals(target.compact(),
                                        leaf_size=self.normal_leaf_size)

    def align(self, guess: jax.Array):
        assert self._source is not None and self._target is not None
        T, score = align_point_to_plane(
            self._source, self._target,
            jnp.asarray(guess, dtype=jnp.float32),
            dist_outlier_ratio=self.dist_outlier_ratio,
            max_iteration=self.max_iteration)
        self.final_score = score
        return T, score
