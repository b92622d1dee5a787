"""Point-cloud pre-processing filters.

Parity with the reference's filter chain (pre_processors/, registry
filter_factory.cc:43-52). Each filter is a configured callable
``PointCloud → PointCloud``; point *removal* clears mask bits (capacity is
unchanged), so chains stay fixed-shape and jit-friendly. Param names match
the reference XML names exactly (INIT_*_PARAM tables in each filter .cc).
"""
from __future__ import annotations

import dataclasses
from typing import ClassVar, Dict, Tuple

import jax
import jax.numpy as jnp

from ..data.cloud import PointCloud
from ..ops import nn_search, voxel as voxel_ops


class Filter:
    """Base: subclasses define PARAMS {xml_name: (py_field, type)} and
    implement __call__(cloud) -> cloud."""

    NAME: ClassVar[str] = ""
    PARAMS: ClassVar[Dict[str, Tuple[str, type]]] = {}

    def configs_valid(self) -> bool:
        return True

    def __call__(self, cloud: PointCloud) -> PointCloud:  # pragma: no cover
        raise NotImplementedError


@dataclasses.dataclass
class RangeFilter(Filter):
    """Keep points with min_range <= |p| <= max_range
    (pre_processors/filter_range.cc:59-66)."""

    min_range: float = 0.0
    max_range: float = 3.4e38

    NAME = "Range"
    PARAMS = {"min_range": ("min_range", float), "max_range": ("max_range", float)}

    def configs_valid(self) -> bool:
        return 0.0 <= self.min_range < self.max_range

    def __call__(self, cloud: PointCloud) -> PointCloud:
        r = jnp.linalg.norm(cloud.xyz, axis=-1)
        return cloud.with_mask((r >= self.min_range) & (r <= self.max_range))


@dataclasses.dataclass
class AxisRangeFilter(Filter):
    """Keep points with axis value in [min, max]
    (pre_processors/filter_axis_range.h:37,56-60; axis x:0 y:1 z:2)."""

    min: float = -3.4e38
    max: float = 3.4e38
    axis_index: int = 2

    NAME = "AxisRange"
    PARAMS = {"min": ("min", float), "max": ("max", float),
              "axis_index": ("axis_index", int)}

    def configs_valid(self) -> bool:
        return self.axis_index in (0, 1, 2) and self.min < self.max

    def __call__(self, cloud: PointCloud) -> PointCloud:
        v = cloud.xyz[..., self.axis_index]
        return cloud.with_mask((v >= self.min) & (v <= self.max))


@dataclasses.dataclass
class BoundingBoxRemovalFilter(Filter):
    """Remove points inside the axis-aligned box (e.g. the ego vehicle)
    (pre_processors/filter_bounding_box.h:53-58)."""

    min_x: float = -3.4e38
    min_y: float = -3.4e38
    min_z: float = -3.4e38
    max_x: float = 3.4e38
    max_y: float = 3.4e38
    max_z: float = 3.4e38

    NAME = "BoundingBoxRemoval"
    PARAMS = {n: (n, float)
              for n in ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z")}

    def configs_valid(self) -> bool:
        return (self.min_x < self.max_x and self.min_y < self.max_y
                and self.min_z < self.max_z)

    def __call__(self, cloud: PointCloud) -> PointCloud:
        x, y, z = cloud.xyz[..., 0], cloud.xyz[..., 1], cloud.xyz[..., 2]
        inside = ((x >= self.min_x) & (x <= self.max_x)
                  & (y >= self.min_y) & (y <= self.max_y)
                  & (z >= self.min_z) & (z <= self.max_z))
        return cloud.with_mask(~inside)


@dataclasses.dataclass
class RandomSamplerFilter(Filter):
    """Keep each point with probability sampling_rate
    (pre_processors/filter_random_sample.h:53). Deterministic per seed."""

    sampling_rate: float = 1.0
    seed: int = 0

    NAME = "RandomSampler"
    PARAMS = {"sampling_rate": ("sampling_rate", float)}

    def configs_valid(self) -> bool:
        return 0.0 < self.sampling_rate <= 1.0

    def __call__(self, cloud: PointCloud) -> PointCloud:
        key = jax.random.key(self.seed)
        u = jax.random.uniform(key, cloud.mask.shape)
        return cloud.with_mask(u < self.sampling_rate)


@dataclasses.dataclass
class VoxelGridFilter(Filter):
    """Centroid per voxel; voxel index is lround(p / voxel_size)
    (pre_processors/filter_voxel_grid.cc:38-80)."""

    voxel_size: float = 0.1

    NAME = "VoxelGrid"
    PARAMS = {"voxel_size": ("voxel_size", float)}

    def configs_valid(self) -> bool:
        return self.voxel_size > 1.0e-6

    def __call__(self, cloud: PointCloud) -> PointCloud:
        return voxel_ops.voxel_downsample(cloud, self.voxel_size, mode="round")


@dataclasses.dataclass
class StatisticRemovalFilter(Filter):
    """Statistical outlier removal: per-point mean distance to its
    ``point_num_meank`` nearest neighbors; remove points whose mean distance
    exceeds global_mean + std_mul * global_std (PCL semantics; reference
    wraps pcl::StatisticalOutlierRemoval, filter_statistic_removal.h:49-50).
    """

    point_num_meank: int = 10
    std_mul: float = 1.0
    tile: int = 1024

    NAME = "StatisticRemoval"
    PARAMS = {"point_num_meank": ("point_num_meank", int),
              "std_mul": ("std_mul", float)}

    def configs_valid(self) -> bool:
        return self.point_num_meank > 0 and self.std_mul > 0

    def __call__(self, cloud: PointCloud) -> PointCloud:
        # k+1 because the point itself is its own 0-distance neighbor.
        d2, _ = nn_search.knn(cloud.xyz, cloud.xyz, cloud.mask,
                              k=self.point_num_meank + 1, tile=self.tile)
        d = jnp.sqrt(jnp.maximum(d2[:, 1:], 0.0))
        mean_d = jnp.mean(d, axis=1)
        valid = cloud.mask
        n = jnp.maximum(jnp.sum(valid), 1)
        g_mean = jnp.sum(jnp.where(valid, mean_d, 0.0)) / n
        g_var = jnp.sum(jnp.where(valid, (mean_d - g_mean) ** 2, 0.0)) / n
        thresh = g_mean + self.std_mul * jnp.sqrt(g_var)
        return cloud.with_mask(mean_d <= thresh)


@dataclasses.dataclass
class GroundRemovalFilter(Filter):
    """Voxel height-histogram ground removal
    (pre_processors/filter_ground_removal.cc:47-105): bucket points into
    ``leaf_size`` voxels (truncating index cast); voxels with fewer than
    ``min_point_num_in_voxel`` points are dropped entirely; voxels with
    z-index <= 0 whose z-extent <= height_threshold are ground and removed.
    """

    min_point_num_in_voxel: int = 10
    leaf_size: float = 0.5
    height_threshold: float = 0.1

    NAME = "GroundRemoval"
    PARAMS = {"min_point_num_in_voxel": ("min_point_num_in_voxel", int),
              "leaf_size": ("leaf_size", float),
              "height_threshold": ("height_threshold", float)}

    def configs_valid(self) -> bool:
        return (self.min_point_num_in_voxel > 0 and self.leaf_size > 0
                and self.height_threshold > 0)

    def __call__(self, cloud: PointCloud) -> PointCloud:
        n = cloud.capacity
        keys = voxel_ops.voxel_indices(cloud.xyz, self.leaf_size, mode="trunc")
        point_idx = jnp.arange(n, dtype=jnp.int32)
        _, smask, (sz, skz, sidx), seg_id = voxel_ops._sort_by_voxel(
            keys, cloud.mask,
            (cloud.xyz[:, 2], keys[:, 2].astype(jnp.float32), point_idx))
        w = smask.astype(jnp.float32)
        count = jax.ops.segment_sum(w, seg_id, num_segments=n)
        zmax = jax.ops.segment_max(jnp.where(smask, sz, -jnp.inf), seg_id,
                                   num_segments=n)
        zmin = jax.ops.segment_min(jnp.where(smask, sz, jnp.inf), seg_id,
                                   num_segments=n)
        # z-index of the voxel (same for all its points)
        z_index = jax.ops.segment_max(
            jnp.where(smask, skz, -jnp.float32(2**30)), seg_id, num_segments=n)
        delta = zmax - zmin
        is_ground = (z_index <= 0) & (delta >= 0) & (delta <= self.height_threshold)
        voxel_keep = (count >= self.min_point_num_in_voxel) & ~is_ground
        keep_sorted = voxel_keep[seg_id] & smask
        # scatter decisions back to original point order
        keep = jnp.zeros((n,), dtype=bool).at[sidx].set(keep_sorted)
        return cloud.with_mask(keep)


# ---------------------------------------------------------------------------
# factory — name registry parity with filter_factory.cc:43-52
# ---------------------------------------------------------------------------

FILTER_REGISTRY: Dict[str, type] = {
    c.NAME: c
    for c in (RangeFilter, AxisRangeFilter, BoundingBoxRemovalFilter,
              RandomSamplerFilter, VoxelGridFilter, StatisticRemovalFilter,
              GroundRemovalFilter)
}


def create_filter(name: str, params: dict | None = None) -> Filter:
    """Instantiate a filter by its reference XML name with reference param
    names (dispatch parity: filter_factory.cc:63-80)."""
    if name not in FILTER_REGISTRY:
        raise KeyError(f"unknown filter: {name!r}; known: {sorted(FILTER_REGISTRY)}")
    cls = FILTER_REGISTRY[name]
    kwargs = {}
    for xml_name, value in (params or {}).items():
        if xml_name not in cls.PARAMS:
            raise KeyError(f"filter {name!r} has no param {xml_name!r}")
        field, typ = cls.PARAMS[xml_name]
        kwargs[field] = typ(value)
    f = cls(**kwargs)
    if not f.configs_valid():
        raise ValueError(f"invalid config for filter {name!r}: {f}")
    return f


@dataclasses.dataclass
class FilterChain:
    """Ordered filter chain (FilterFactory parity,
    filter_factory.cc:84-107)."""

    filters: list

    def __call__(self, cloud: PointCloud) -> PointCloud:
        for f in self.filters:
            cloud = f(cloud)
        return cloud
