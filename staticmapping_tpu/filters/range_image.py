"""RangeImage — spherical range-image projection filter + depth clustering.

Capability parity with pre_processors/filter_range_image.{h,cc} (424 LoC):

  * ``Filter``: project every point into an H×W spherical range image
    (vertical FOV [btm_angle, top_angle], azimuth wrap) and keep exactly
    ONE point per pixel — the first arrival (filter_range_image.cc:81-138).
    Out-of-image points are removed.
  * ``DepthCluster``: BFS angle-threshold depth clustering with labels and
    small-cluster (<20 px) removal (cc:141-170, LabelOneComponent
    cc:245-306).  The BFS becomes iterative min-label propagation with
    pointer jumping — a fixed number of vectorized sweeps instead of a
    queue, which is the TPU-native form of connected components.
  * ``to_image``: the debug range image as an array (the reference writes
    PNG via libpng, cc:174-243; persist with ``numpy.save`` or the PGM
    helper here).

"First arrival" per pixel is scan order in the reference; here it is the
lowest point index per pixel (identical for in-order clouds).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import ClassVar, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cloud import PointCloud
from .filters import Filter

_SEG_RAD_THRESHOLD = 10.0 / 180.0 * math.pi   # segmentation_rad_threshold_


@partial(jax.jit, static_argnames=("rows", "cols"))
def _project(xyz, mask, top_angle, btm_angle, offset, rows: int, cols: int):
    """Returns (keep_mask, pixel_id, range) — one winner per pixel."""
    n = xyz.shape[0]
    p = xyz + offset
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    dxy = jnp.sqrt(x * x + y * y)
    h_res = 2.0 * math.pi / cols
    v_res = (top_angle - btm_angle) / rows / 180.0 * math.pi

    v_rad = jnp.arctan2(z, dxy)
    row = ((v_rad - btm_angle / 180.0 * math.pi) / v_res).astype(jnp.int32)
    h_rad = jnp.arctan2(y, x)
    h_rad = jnp.where(h_rad < 0, h_rad + 2.0 * math.pi, h_rad)
    col = jnp.round(h_rad / h_res).astype(jnp.int32)
    col = jnp.where(col >= cols, col - cols, col)

    ok = (mask & (dxy >= 0.01) & (row >= 0) & (row < rows)
          & (col >= 0) & (col < cols))
    pix = jnp.where(ok, row * cols + col, rows * cols)   # overflow bucket
    # first arrival = lowest point index per pixel
    idx = jnp.arange(n, dtype=jnp.int32)
    winner = jnp.full((rows * cols + 1,), n, dtype=jnp.int32
                      ).at[pix].min(jnp.where(ok, idx, n))
    keep = ok & (winner[pix] == idx)
    rng = jnp.sqrt(x * x + y * y + z * z)
    return keep, pix, rng


@partial(jax.jit, static_argnames=("rows", "cols", "sweeps"))
def _depth_cluster(image, v_res, rows: int, cols: int, sweeps: int = 24):
    """Angle-criterion connected components on the range image.

    ``image`` [rows, cols] with 0 = empty; ``v_res`` the vertical angular
    resolution in radians.  Neighbors: (0,±1), (0,±2), (±1,0) with azimuth
    wrap (LabelOneComponent, cc:251-258 neighbor set).  Edge criterion:
    beta = atan2(d2·sin a, d1 − d2·cos a) > threshold (cc:288-302).
    Returns int32 labels [rows, cols] (0 = empty); a component's label is
    its smallest flat pixel id + 1.  The reference's BFS becomes
    ``sweeps`` rounds of neighbor-min label propagation + two pointer
    jumps per round — O(log diameter) rounds thanks to the jumping.
    """
    h_res = 2.0 * math.pi / cols
    occ = image > 1e-6
    empty_lab = jnp.int32(rows * cols)

    def shift(arr, dr, dc, fill):
        rolled = jnp.roll(arr, shift=(-dr, -dc), axis=(0, 1))
        if dr > 0:    # vertical edges don't wrap
            rolled = rolled.at[-dr:, :].set(fill)
        elif dr < 0:
            rolled = rolled.at[:-dr, :].set(fill)
        return rolled

    neighbors = [(0, 1), (0, -1), (0, 2), (0, -2), (1, 0), (-1, 0)]
    conn_masks = []
    for (dr, dc) in neighbors:
        alpha = h_res * abs(dc) if dr == 0 else v_res
        nb = shift(image, dr, dc, 0.0)
        d1 = jnp.maximum(image, nb)
        d2 = jnp.minimum(image, nb)
        beta = jnp.arctan2(d2 * jnp.sin(alpha), d1 - d2 * jnp.cos(alpha))
        conn_masks.append(occ & (nb > 1e-6)
                          & (beta > _SEG_RAD_THRESHOLD))

    flat_ids = jnp.arange(rows * cols, dtype=jnp.int32).reshape(rows, cols)
    labels0 = jnp.where(occ, flat_ids, empty_lab)

    def one_sweep(labels, _):
        new = labels
        for (dr, dc), conn in zip(neighbors, conn_masks):
            nb_lab = shift(labels, dr, dc, empty_lab)
            new = jnp.where(conn, jnp.minimum(new, nb_lab), new)
        # pointer jumping: label ← label[label], twice
        flat = new.reshape(-1)
        ext = jnp.concatenate([flat, empty_lab[None]])
        flat = ext[flat]
        ext = jnp.concatenate([flat, empty_lab[None]])
        flat = ext[flat]
        return flat.reshape(rows, cols), None

    labels, _ = jax.lax.scan(one_sweep, labels0, None, length=sweeps)
    return jnp.where(occ, labels + 1, 0)


@dataclasses.dataclass
class RangeImageFilter(Filter):
    """See module docstring. Param names/defaults:
    filter_range_image.cc:28-52."""

    top_angle: float = 30.0
    btm_angle: float = -15.0
    offset_x: float = 0.0
    offset_y: float = 0.0
    offset_z: float = 0.0
    vertical_line_num: int = 40
    horizontal_line_num: int = 1800
    min_cluster_size: int = 20      # LabelOneComponent, cc:305

    NAME: ClassVar[str] = "RangeImage"
    PARAMS: ClassVar[Dict[str, Tuple[str, type]]] = {
        "top_angle": ("top_angle", float),
        "btm_angle": ("btm_angle", float),
        "offset_x": ("offset_x", float),
        "offset_y": ("offset_y", float),
        "offset_z": ("offset_z", float),
        "vertical_line_num": ("vertical_line_num", int),
        "horizontal_line_num": ("horizontal_line_num", int),
    }

    def configs_valid(self) -> bool:
        return (self.vertical_line_num > 0 and self.horizontal_line_num > 0
                and self.btm_angle < self.top_angle)

    def _project(self, cloud: PointCloud):
        offset = jnp.asarray([self.offset_x, self.offset_y, self.offset_z],
                             dtype=jnp.float32)
        return _project(cloud.xyz, cloud.mask,
                        jnp.float32(self.top_angle),
                        jnp.float32(self.btm_angle), offset,
                        rows=self.vertical_line_num,
                        cols=self.horizontal_line_num)

    def __call__(self, cloud: PointCloud) -> PointCloud:
        keep, _, _ = self._project(cloud)
        return cloud.with_mask(keep)

    def to_image(self, cloud: PointCloud) -> np.ndarray:
        """The range image [rows, cols] (0 = empty) — ToPng data source."""
        keep, pix, rng = self._project(cloud)
        rows, cols = self.vertical_line_num, self.horizontal_line_num
        img = jnp.zeros((rows * cols + 1,), dtype=jnp.float32
                        ).at[jnp.where(keep, pix, rows * cols)].max(
            jnp.where(keep, rng, 0.0))
        return np.asarray(img[:rows * cols].reshape(rows, cols))

    def save_pgm(self, cloud: PointCloud, path: str,
                 max_range: float = 75.0) -> None:
        """Debug dump (the reference writes PNG via libpng; PGM needs no
        image library and every viewer opens it)."""
        img = self.to_image(cloud)
        g = np.clip(img / max_range * 255.0, 0, 255).astype(np.uint8)
        with open(path, "wb") as f:
            f.write(b"P5\n%d %d\n255\n" % (g.shape[1], g.shape[0]))
            f.write(g.tobytes())

    def depth_cluster(self, cloud: PointCloud, sweeps: int = 24):
        """Per-point cluster labels (0 = unclustered/small cluster).

        Matches DepthCluster + the ≥20-pixel cluster gate (cc:305)."""
        keep, pix, rng = self._project(cloud)
        rows, cols = self.vertical_line_num, self.horizontal_line_num
        img = jnp.zeros((rows * cols + 1,), dtype=jnp.float32
                        ).at[jnp.where(keep, pix, rows * cols)].max(
            jnp.where(keep, rng, 0.0))
        v_res = ((self.top_angle - self.btm_angle) / rows
                 / 180.0 * math.pi)
        labels_img = _depth_cluster(img[:rows * cols].reshape(rows, cols),
                                    jnp.float32(v_res),
                                    rows, cols, sweeps=sweeps)
        flat = labels_img.reshape(-1)
        sizes = jnp.zeros((rows * cols + 2,), dtype=jnp.int32
                          ).at[flat.astype(jnp.int32)].add(1)
        good = sizes[flat] >= self.min_cluster_size
        flat = jnp.where((flat > 0) & good, flat, 0)
        ext = jnp.concatenate([flat, jnp.zeros((1,), dtype=flat.dtype)])
        per_point = jnp.where(keep, ext[jnp.minimum(pix, rows * cols)], 0)
        return per_point
