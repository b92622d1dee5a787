"""Voxel-grid operations via multi-key sort + segment reductions.

TPU-native replacement for the reference's hash-map voxel grids
(pre_processors/filter_voxel_grid.cc:38-80, builder voxel maps). Instead of a
``std::unordered_map`` we sort points lexicographically by their integer voxel
index (one fused ``lax.sort`` with 3 integer keys — no 64-bit packing needed)
and reduce per-segment with ``segment_sum``. Everything is fixed-shape.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..data.cloud import PointCloud, PAD_COORD

# host scalar, NOT jnp: a module-level jnp.int32 would allocate on device
# at import time and break jax.distributed.initialize-before-first-JAX-call
# (parallel/multihost.py)
_INVALID_KEY = np.int32(2**31 - 1)


def voxel_indices(xyz: jax.Array, voxel_size: float, mode: str = "round"):
    """Integer voxel index per point. ``mode='round'`` matches
    ``std::lround(p/voxel)`` (filter_voxel_grid.cc:47-49); ``'floor'``
    matches plain C truncation-toward-zero is NOT floor — the reference's
    GroundRemoval uses ``static_cast<int>`` (truncation), so ``mode='trunc'``
    is provided for that parity (filter_ground_removal.cc:59-61)."""
    scaled = xyz / voxel_size
    if mode == "round":
        idx = jnp.round(scaled)
    elif mode == "floor":
        idx = jnp.floor(scaled)
    elif mode == "trunc":
        idx = jnp.trunc(scaled)
    else:
        raise ValueError(mode)
    return idx.astype(jnp.int32)


def _sort_by_voxel(keys: jax.Array, mask: jax.Array, payload: tuple):
    """Lexicographic stable sort by (kx, ky, kz); invalid points sort last.

    Returns sorted keys ``[N, 3]``, sorted mask, sorted payload tuple, and
    ``segment_id [N]`` (0-based, contiguous; invalid points share trailing
    segments that the caller masks out).
    """
    kx = jnp.where(mask, keys[:, 0], _INVALID_KEY)
    ky = jnp.where(mask, keys[:, 1], _INVALID_KEY)
    kz = jnp.where(mask, keys[:, 2], _INVALID_KEY)
    operands = (kx, ky, kz, mask) + payload
    sorted_ops = lax.sort(operands, dimension=0, is_stable=True, num_keys=3)
    skx, sky, skz, smask = sorted_ops[:4]
    spayload = sorted_ops[4:]
    new_seg = jnp.concatenate([
        jnp.ones((1,), dtype=jnp.int32),
        ((skx[1:] != skx[:-1]) | (sky[1:] != sky[:-1])
         | (skz[1:] != skz[:-1])).astype(jnp.int32),
    ])
    seg_id = jnp.cumsum(new_seg) - 1
    return jnp.stack([skx, sky, skz], axis=1), smask, spayload, seg_id


@partial(jax.jit, static_argnames=("mode",))
def voxel_downsample(cloud: PointCloud, voxel_size, mode: str = "round"
                     ) -> PointCloud:
    """Replace each voxel's points by their centroid (x, y, z, intensity all
    averaged — parity with filter_voxel_grid.cc get_average_point). Output
    keeps the input capacity; valid slots are compacted to the front."""
    n = cloud.capacity
    keys = voxel_indices(cloud.xyz, voxel_size, mode)
    _, smask, (sx, sy, sz, si, sf), seg_id = _sort_by_voxel(
        keys, cloud.mask,
        (cloud.xyz[:, 0], cloud.xyz[:, 1], cloud.xyz[:, 2],
         cloud.intensity, cloud.factor))
    w = smask.astype(jnp.float32)
    count = jax.ops.segment_sum(w, seg_id, num_segments=n)
    sums = jax.ops.segment_sum(
        jnp.stack([sx, sy, sz, si, sf], axis=1) * w[:, None],
        seg_id, num_segments=n)
    denom = jnp.maximum(count, 1.0)[:, None]
    mean = sums / denom
    valid = count > 0
    xyz = jnp.where(valid[:, None], mean[:, :3],
                    jnp.full((n, 3), PAD_COORD, dtype=jnp.float32))
    # already compacted: seg_id is a 0-based contiguous cumsum over the
    # sorted order and every invalid point sorts to ONE trailing segment,
    # so occupied-voxel slots are exactly 0..k-1 — a final compact() would
    # be a redundant second sort cascade
    return PointCloud(xyz=xyz, intensity=mean[:, 3] * valid,
                      factor=mean[:, 4] * valid, mask=valid)


@partial(jax.jit, static_argnames=("mode",))
def voxel_stats(cloud: PointCloud, voxel_size, mode: str = "round",
                origin=None):
    """Per-voxel Gaussian statistics (count, mean, covariance) — the
    building block for NDT (parity goal: pclomp VoxelGridCovariance).

    ``origin`` (optional ``[3]``) shifts the lattice so indices are relative
    to it (pclomp anchors its grid at the cloud min bound).

    Returns a dict of arrays with one slot per input point capacity:
      count [N], mean [N, 3], cov [N, 3, 3], valid [N] (count > 0),
      voxel_key [N, 3] (lattice index of each occupied voxel slot).
    """
    n = cloud.capacity
    xyz = cloud.xyz if origin is None else cloud.xyz - origin
    keys = voxel_indices(xyz, voxel_size, mode)
    skeys, smask, (sx, sy, sz), seg_id = _sort_by_voxel(
        keys, cloud.mask, (cloud.xyz[:, 0], cloud.xyz[:, 1], cloud.xyz[:, 2]))
    pts = jnp.stack([sx, sy, sz], axis=1)
    w = smask.astype(jnp.float32)
    count = jax.ops.segment_sum(w, seg_id, num_segments=n)
    mean = jax.ops.segment_sum(pts * w[:, None], seg_id, num_segments=n)
    mean = mean / jnp.maximum(count, 1.0)[:, None]
    # second moment
    outer = pts[:, :, None] * pts[:, None, :] * w[:, None, None]
    m2 = jax.ops.segment_sum(outer, seg_id, num_segments=n)
    m2 = m2 / jnp.maximum(count, 1.0)[:, None, None]
    cov = m2 - mean[:, :, None] * mean[:, None, :]
    return {
        "count": count,
        "mean": mean,
        "cov": cov,
        "valid": count > 0,
        "voxel_key": jax.ops.segment_max(
            jnp.where(smask[:, None], skeys, _INVALID_KEY), seg_id,
            num_segments=n),
    }


def voxel_stats_floor(cloud: PointCloud, voxel_size, origin):
    """Floor-lattice voxel Gaussians anchored at ``origin`` — the exact
    binning pclomp's ``VoxelGridCovariance`` uses (leaf index =
    floor((p − min_bound)/leaf_size)). Consumed by
    :mod:`..registration.ndt`."""
    return voxel_stats(cloud, voxel_size, mode="floor", origin=origin)
