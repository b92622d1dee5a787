"""Plane detection + plane-aware random sampling.

Parity with pre_processors/plane_detector.h:43-171 and
random_sample_with_plane_detect.h:43-110 (present in the reference but
disabled in Submap — submap.cc:134-142 keeps it commented out; here it is
finished and usable as a registered filter):

  * voxelize at ``leaf_size``; voxels with ≥ ``min_point_num_in_voxel``
    points participate;
  * voxels at or below the sensor plane (z-index ≤ 0): the flat test —
    all points are "plane" when the voxel's z-extent ≤ threshold
    (plane_detector.h:109-126);
  * voxels above: a plane fit with ≥ 85% inliers at 0.1 m marks the
    inliers as plane (plane_detector.h:128-149).  The reference runs PCL
    RANSAC per voxel; at voxel scale with ≥85% inlier dominance a
    least-squares PCA plane is the same answer, and it is batched —
    one ``eigh`` over all voxels instead of per-voxel RANSAC loops;
  * the sampler KEEPS plane points and random-samples the rest at
    ``sampling_rate`` (random_sample_with_plane_detect.h:80-105 —
    planes compress well under voxel filters later, the sparse
    structure is what registration needs).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import ClassVar, Dict, Tuple

import jax
import jax.numpy as jnp

from ..data.cloud import PointCloud
from .filters import Filter

_BIG = 1.0e9


@partial(jax.jit, static_argnames=())
def _plane_mask(xyz, mask, leaf_size, min_points, dist_threshold,
                ransac_dist, inlier_rate):
    n = xyz.shape[0]
    key = jnp.floor(xyz / leaf_size).astype(jnp.int32)
    kx = jnp.where(mask, key[:, 0], jnp.int32(2**30))
    ky = jnp.where(mask, key[:, 1], jnp.int32(2**30))
    kz = jnp.where(mask, key[:, 2], jnp.int32(2**30))

    order = jnp.lexsort((kz, ky, kx))
    sx, sy, sz = kx[order], ky[order], kz[order]
    pts = xyz[order]
    pm = mask[order]

    new_seg = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        ((sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1])
         | (sz[1:] != sz[:-1])).astype(jnp.int32)])
    seg = jnp.cumsum(new_seg) - 1                       # [N] segment ids

    w = pm.astype(jnp.float32)
    cnt = jax.ops.segment_sum(w, seg, num_segments=n)
    mean = jax.ops.segment_sum(pts * w[:, None], seg, num_segments=n) \
        / jnp.maximum(cnt, 1.0)[:, None]
    d = (pts - mean[seg]) * w[:, None]
    cov = jax.ops.segment_sum(
        d[:, :, None] * d[:, None, :], seg, num_segments=n) \
        / jnp.maximum(cnt, 1.0)[:, None, None]
    zmin = jnp.full((n,), _BIG).at[seg].min(jnp.where(pm, pts[:, 2], _BIG))
    zmax = jnp.full((n,), -_BIG).at[seg].max(
        jnp.where(pm, pts[:, 2], -_BIG))

    # smallest-eigenvector normal per voxel (batched PCA)
    evals, evecs = jnp.linalg.eigh(cov)
    normal = evecs[:, :, 0]                              # [N, 3]

    # per-point residual to its voxel plane
    resid = jnp.abs(jnp.sum((pts - mean[seg]) * normal[seg], axis=1))
    inl = (resid <= ransac_dist) & pm
    inl_cnt = jax.ops.segment_sum(inl.astype(jnp.float32), seg,
                                  num_segments=n)
    voxel_inlier_rate = inl_cnt / jnp.maximum(cnt, 1.0)

    enough = cnt[seg] >= min_points
    low = sz <= 0
    flat = (zmax[seg] - zmin[seg]) <= dist_threshold
    plane_low = low & flat & enough & pm
    plane_high = (~low) & (cnt[seg] >= 2 * min_points) \
        & (voxel_inlier_rate[seg] > inlier_rate) & inl & pm
    plane_sorted = plane_low | plane_high

    inv = jnp.zeros((n,), dtype=jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return plane_sorted[inv]


@dataclasses.dataclass
class PlaneDetector:
    """Detect(ground_indices) role (plane_detector.h:92-155)."""

    leaf_size: float = 0.8
    min_point_num_in_voxel: int = 10
    distance_threshold: float = 0.2
    ransac_distance: float = 0.1
    inlier_rate: float = 0.85

    def plane_mask(self, cloud: PointCloud):
        return _plane_mask(cloud.xyz, cloud.mask,
                           jnp.float32(self.leaf_size),
                           jnp.float32(self.min_point_num_in_voxel),
                           jnp.float32(self.distance_threshold),
                           jnp.float32(self.ransac_distance),
                           jnp.float32(self.inlier_rate))


@dataclasses.dataclass
class RandomSampleWithPlaneDetectFilter(Filter):
    """Keep plane points, sample the rest at ``sampling_rate``
    (random_sample_with_plane_detect.h:80-105)."""

    sampling_rate: float = 1.0
    ground_height_threshold: float = 0.2
    leaf_size: float = 0.8
    min_point_num_in_voxel: int = 10
    seed: int = 0

    NAME: ClassVar[str] = "RandomSamplerWithPlaneDetect"
    PARAMS: ClassVar[Dict[str, Tuple[str, type]]] = {
        "sampling_rate": ("sampling_rate", float),
        "ground_height_threshold": ("ground_height_threshold", float),
        "leaf_size": ("leaf_size", float),
        "min_point_num_in_voxel": ("min_point_num_in_voxel", int),
    }

    def configs_valid(self) -> bool:
        return 1e-6 <= self.sampling_rate <= 1.0 and self.leaf_size > 0

    def __call__(self, cloud: PointCloud) -> PointCloud:
        if self.sampling_rate > 0.999999:
            return cloud
        det = PlaneDetector(
            leaf_size=self.leaf_size,
            min_point_num_in_voxel=self.min_point_num_in_voxel,
            distance_threshold=self.ground_height_threshold)
        plane = det.plane_mask(cloud)
        u = jax.random.uniform(jax.random.key(self.seed), cloud.mask.shape)
        keep = plane | (u < self.sampling_rate)
        return cloud.with_mask(keep)
