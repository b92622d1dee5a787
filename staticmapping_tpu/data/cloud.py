"""Fixed-capacity masked point-cloud types — the TPU-native replacement for
the reference's ``InnerCloudType`` / ``EigenPointCloud``
(reference: builder/data/cloud_types.h:46-160).

Clouds on TPU are padded, statically-shaped arrays plus a validity mask:

  * ``xyz``       ``[N, 3] float32``  point coordinates
  * ``intensity`` ``[N]  float32``
  * ``factor``    ``[N]  float32``  per-point motion-compensation factor in
                  [0, 1) — mirrors ``InnerPointType::factor``
                  (cloud_types.h:51) stamped at accumulation time
                  (data_collector.h:170-204)
  * ``mask``      ``[N]  bool``     True for real points, False for padding

All ops are pure functions; filters produce new masks rather than resizing.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import se3

# Padding coordinate pushed far away so padded points never match anything.
PAD_COORD = 1.0e6


def pad_capacity(n: int, multiple: int = 2048) -> int:
    """Round up to a capacity bucket so recompiles stay rare."""
    if n <= 0:
        return multiple
    return ((n + multiple - 1) // multiple) * multiple


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PointCloud:
    """Padded cloud. Leading batch dims are allowed on every leaf."""

    xyz: jax.Array        # [..., N, 3]
    intensity: jax.Array  # [..., N]
    factor: jax.Array     # [..., N]
    mask: jax.Array       # [..., N] bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.mask, axis=-1)

    def with_mask(self, mask: jax.Array) -> "PointCloud":
        return dataclasses.replace(self, mask=mask & self.mask)

    def transform(self, T: jax.Array) -> "PointCloud":
        """Rigid transform of all points (cloud_types.cc ApplyTransform)."""
        return dataclasses.replace(self, xyz=se3.apply(T, self.xyz))

    def motion_compensate(self, T: jax.Array) -> "PointCloud":
        """Per-point pose interpolation between identity and ``T`` by
        ``factor`` (parity: cloud_types.cc:306-321 ApplyMotionCompensation —
        slerp rotation, lerp translation, per point)."""
        q = se3.matrix_to_quat(se3.rotation(T))
        qi = jnp.broadcast_to(se3.quat_identity(q.dtype), q.shape)
        f = self.factor[..., None]  # [..., N, 1]
        q_per_point = se3.slerp(qi[..., None, :], q[..., None, :], f)
        t_per_point = se3.translation(T)[..., None, :] * f
        new_xyz = se3.quat_rotate(q_per_point, self.xyz) + t_per_point
        return dataclasses.replace(self, xyz=new_xyz)

    def masked_xyz(self, fill: float = PAD_COORD) -> jax.Array:
        """xyz with padded points moved to ``fill`` (so reductions/NN ignore
        them without extra masking)."""
        return jnp.where(self.mask[..., None], self.xyz,
                         jnp.full_like(self.xyz, fill))

    def centroid(self) -> jax.Array:
        n = jnp.maximum(self.num_valid(), 1)
        s = jnp.sum(jnp.where(self.mask[..., None], self.xyz, 0.0), axis=-2)
        return s / n[..., None]

    def compact(self) -> "PointCloud":
        """Stable-sort valid points to the front (keeps relative order, so the
        per-point ``factor`` time ordering survives)."""
        order = jnp.argsort(~self.mask, axis=-1, stable=True)
        return PointCloud(
            xyz=jnp.take_along_axis(self.xyz, order[..., None], axis=-2),
            intensity=jnp.take_along_axis(self.intensity, order, axis=-1),
            factor=jnp.take_along_axis(self.factor, order, axis=-1),
            mask=jnp.take_along_axis(self.mask, order, axis=-1),
        )


def from_numpy(points: np.ndarray,
               intensity: Optional[np.ndarray] = None,
               capacity: Optional[int] = None,
               stamp_factors: bool = True) -> PointCloud:
    """Build a padded ``PointCloud`` from host arrays.

    ``stamp_factors`` mirrors DataCollector accumulation: factor_i = i / N
    (data_collector.h:170-204, cloud_types.cc FromPointCloud factors[i]=i/size).
    """
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    cap = capacity if capacity is not None else pad_capacity(n)
    if n > cap:
        raise ValueError(f"cloud of {n} points exceeds capacity {cap}")
    xyz = np.full((cap, 3), PAD_COORD, dtype=np.float32)
    xyz[:n] = points[:, :3]
    inten = np.zeros((cap,), dtype=np.float32)
    if intensity is not None:
        inten[:n] = np.asarray(intensity, dtype=np.float32)[:n]
    elif points.shape[1] > 3:
        inten[:n] = points[:n, 3]
    factor = np.zeros((cap,), dtype=np.float32)
    if stamp_factors and n > 0:
        factor[:n] = np.arange(n, dtype=np.float32) / float(n)
    mask = np.zeros((cap,), dtype=bool)
    mask[:n] = True
    return PointCloud(xyz=jnp.asarray(xyz), intensity=jnp.asarray(inten),
                      factor=jnp.asarray(factor), mask=jnp.asarray(mask))


def to_numpy(cloud: PointCloud) -> np.ndarray:
    """Return ``[n_valid, 4]`` (x, y, z, intensity) on host."""
    mask = np.asarray(cloud.mask)
    xyz = np.asarray(cloud.xyz)[mask]
    inten = np.asarray(cloud.intensity)[mask]
    return np.concatenate([xyz, inten[:, None]], axis=1)


def empty(capacity: int) -> PointCloud:
    return PointCloud(
        xyz=jnp.full((capacity, 3), PAD_COORD, dtype=jnp.float32),
        intensity=jnp.zeros((capacity,), dtype=jnp.float32),
        factor=jnp.zeros((capacity,), dtype=jnp.float32),
        mask=jnp.zeros((capacity,), dtype=bool),
    )


def concat(a: PointCloud, b: PointCloud, capacity: Optional[int] = None) -> PointCloud:
    """Concatenate along the point axis (then compact into ``capacity``)."""
    out = PointCloud(
        xyz=jnp.concatenate([a.xyz, b.xyz], axis=-2),
        intensity=jnp.concatenate([a.intensity, b.intensity], axis=-1),
        factor=jnp.concatenate([a.factor, b.factor], axis=-1),
        mask=jnp.concatenate([a.mask, b.mask], axis=-1),
    ).compact()
    if capacity is not None:
        out = PointCloud(
            xyz=out.xyz[..., :capacity, :],
            intensity=out.intensity[..., :capacity],
            factor=out.factor[..., :capacity],
            mask=out.mask[..., :capacity],
        )
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NormalCloud:
    """Downsampled cloud with per-point normals — the output of the kd-split
    normal estimator (parity: EigenPointCloud with normals,
    cloud_types.cc:347-368)."""

    xyz: jax.Array      # [..., M, 3]
    normals: jax.Array  # [..., M, 3]
    mask: jax.Array     # [..., M] bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def num_valid(self) -> jax.Array:
        return jnp.sum(self.mask, axis=-1)

    def transform(self, T: jax.Array) -> "NormalCloud":
        R = se3.rotation(T)
        return dataclasses.replace(
            self,
            xyz=se3.apply(T, self.xyz),
            normals=jnp.einsum("...ij,...nj->...ni", R, self.normals),
        )

    def masked_xyz(self, fill: float = PAD_COORD) -> jax.Array:
        return jnp.where(self.mask[..., None], self.xyz,
                         jnp.full_like(self.xyz, fill))
