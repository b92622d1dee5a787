"""Multi-resolution voxel map (MRVM) — the probability-filtered "static map".

TPU-native re-design of the reference's
``MultiResolutionVoxelMap`` (builder/multi_resolution_voxel_map.{h,cc}):
per-voxel occupancy log-odds built by ray casting every scan from its origin
(hits at ray ends, misses along the ray), then exporting only voxels whose
occupancy probability exceeds a threshold — which removes dynamic objects.

Differences from the reference, by design:
  * ray traversal: the reference walks exact Bresenham voxel chains per ray
    in an OpenMP loop (cc:75-77, common/math.cc:35). Here each scan becomes
    one fixed-shape batched kernel: rays are sampled at ``miss_step``
    spacing (misses are statistical — exact voxel chains don't change the
    outcome) and reduced per voxel with one sort + segment-sum.
  * probability update: the reference applies quantized, clamped updates in
    arrival order with a "not hit in this scan" guard (cc:84-118). Here
    log-odds accumulate additively (hits*lh + misses*lm, clamped once at
    output) — order-free so the whole scan batches; same limit behavior.

Per-voxel state (hit count, miss count, hit-point centroid, max intensity)
is merged on host into sorted sparse arrays; map extent is unbounded.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..data.cloud import PointCloud


def prob_to_log_odds(p: float) -> float:
    return math.log(p / (1.0 - p))


def log_odds_to_prob(l):
    return 1.0 / (1.0 + np.exp(-np.clip(l, -50.0, 50.0)))


@dataclasses.dataclass
class MrvmSettings:
    """MrvmSettings parity (multi_resolution_voxel_map.h:55-66)."""

    output_average: bool = False
    use_max_intensity: bool = True
    # write the static map as XYZRGB with r=g=b=intensity (grayscale) —
    # multi_resolution_voxel_map.h:57, OutputToPointCloud cc:187-209, 233
    output_rgb: bool = False
    prob_threshold: float = 0.6
    high_resolution: float = 0.1
    hit_prob: float = 0.55
    miss_prob: float = 0.48
    z_offset: float = 0.0
    # cap on hit points admitted into per-cell position/intensity averages
    # (multi_resolution_voxel_map.cc:100); 0 disables the cap
    max_point_num_in_cell: int = 10
    # TPU knobs: miss samples are spaced max(high_resolution, dist/max_steps)
    # per ray — exact voxel-rate marching near the sensor, sparser on long
    # rays (misses are statistical)
    max_ray_steps: int = 96               # static cap on samples per ray
    # (96 keeps the event sort ~2.5x cheaper than the exact per-voxel rate
    # at identical hit accuracy; misses are statistical and the reference's
    # miss odds are weak, multi_resolution_voxel_map.cc:36-40)


# probability clamps (multi_resolution_voxel_map.cc:30-33)
MIN_PROB, MAX_PROB = 0.1, 0.9


@partial(jax.jit, static_argnames=("resolution", "max_steps"))
def _scan_events(xyz: jax.Array, mask: jax.Array, intensity: jax.Array,
                 origin: jax.Array, resolution: float,
                 max_steps: int):
    """One scan → per-voxel aggregates.

    Returns (keys [M,3] i32, hit_cnt [M], miss_cnt [M], sum_xyz [M,3],
    sum_int/max_int [M], valid [M]) with M = N * (1 + max_steps) slots,
    deduplicated by voxel within this scan.
    """
    n = xyz.shape[0]
    delta = xyz - origin[None, :]
    dist = jnp.linalg.norm(delta, axis=1)
    direction = delta / jnp.maximum(dist, 1e-9)[:, None]

    # miss samples: per-ray adaptive spacing (see MrvmSettings)
    step_len = jnp.maximum(resolution,
                           (dist - resolution) / max_steps)   # [N]
    steps = jnp.arange(max_steps, dtype=jnp.float32)
    t = (steps[None, :] + 0.5) * step_len[:, None]            # [N, S]
    miss_valid = (t < dist[:, None] - resolution) & mask[:, None]
    miss_pos = origin[None, None, :] + \
        direction[:, None, :] * t[:, :, None]                 # [N, S, 3]
    miss_keys = jnp.floor(miss_pos / resolution).astype(jnp.int32)

    hit_keys = jnp.floor(xyz / resolution).astype(jnp.int32)  # [N, 3]

    all_keys = jnp.concatenate(
        [hit_keys, miss_keys.reshape(n * max_steps, 3)], axis=0)
    is_hit = jnp.concatenate(
        [jnp.ones((n,), bool), jnp.zeros((n * max_steps,), bool)])
    valid = jnp.concatenate([mask, miss_valid.reshape(-1)])
    ev_xyz = jnp.concatenate(
        [xyz, jnp.zeros((n * max_steps, 3), dtype=xyz.dtype)], axis=0)
    ev_int = jnp.concatenate(
        [intensity, jnp.zeros((n * max_steps,), dtype=intensity.dtype)])

    m = all_keys.shape[0]
    kx = jnp.where(valid, all_keys[:, 0], jnp.int32(2**31 - 1))
    ky = jnp.where(valid, all_keys[:, 1], jnp.int32(2**31 - 1))
    kz = jnp.where(valid, all_keys[:, 2], jnp.int32(2**31 - 1))
    sorted_ops = jax.lax.sort(
        (kx, ky, kz, valid, is_hit & valid, ev_xyz[:, 0], ev_xyz[:, 1],
         ev_xyz[:, 2], ev_int),
        dimension=0, is_stable=False, num_keys=3)
    skx, sky, skz, sv, sh, sx, sy, sz, si = sorted_ops
    new_seg = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        ((skx[1:] != skx[:-1]) | (sky[1:] != sky[:-1])
         | (skz[1:] != skz[:-1])).astype(jnp.int32)])
    seg = jnp.cumsum(new_seg) - 1

    hit_f = sh.astype(jnp.float32)
    miss_f = (sv & ~sh).astype(jnp.float32)
    hit_cnt = jax.ops.segment_sum(hit_f, seg, num_segments=m)
    miss_cnt = jax.ops.segment_sum(miss_f, seg, num_segments=m)
    sum_xyz = jax.ops.segment_sum(
        jnp.stack([sx, sy, sz], 1) * hit_f[:, None], seg, num_segments=m)
    max_int = jax.ops.segment_max(
        jnp.where(sh, si, -1.0), seg, num_segments=m)
    sum_int = jax.ops.segment_sum(si * hit_f, seg, num_segments=m)
    keys_out = jax.ops.segment_max(
        jnp.where(sv[:, None], jnp.stack([skx, sky, skz], 1),
                  jnp.int32(-2**31 + 1)), seg, num_segments=m)
    valid_out = (hit_cnt + miss_cnt) > 0
    return keys_out, hit_cnt, miss_cnt, sum_xyz, max_int, sum_int, valid_out


def _f32_to_2xi16(x: jax.Array) -> jax.Array:
    """[...] f32 → [..., 2] int16 (bit halves, little-endian order)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    lo = (bits & 0xFFFF).astype(jnp.uint16).astype(jnp.int16)
    hi = ((bits >> 16) & 0xFFFF).astype(jnp.uint16).astype(jnp.int16)
    return jnp.stack([lo, hi], axis=-1)


@partial(jax.jit, static_argnames=("resolution", "max_steps", "with_avg"))
def _scan_events_packed(xyz, mask, intensity, origin, resolution: float,
                        max_steps: int, with_avg: bool):
    """``_scan_events`` + on-device int16 packing for the tunnel.

    The raw per-voxel slot arrays are ~36 B/slot and a submap touches
    ~2 M slots — at the remote link's ~40 MB/s that read-back dominated
    the whole map export (r05 measured 323 s of finish time).  Packing on
    device cuts it to 10 B/slot (26 with the hit-average fields):

      cols 0-2: voxel key (int16 — ±3276 m map extent at 0.1 m voxels)
      col  3:   hit count (uint16 bits)
      col  4:   miss count (uint16 bits)
      cols 5-6: max intensity (f32 bit halves)
      [with_avg] cols 7-12: sum_xyz (3×f32 halves), 13-14: sum_int

    Returns (packed [M, C] int16, n_valid i32).  Valid slots are a prefix
    (invalid keys sort last); the host reads a bucket-rounded prefix so
    the slice compiles for a handful of shapes, not one per distinct
    count."""
    keys, hit, miss, sxyz, mint, sint, valid = _scan_events(
        xyz, mask, intensity, origin, resolution, max_steps)
    cols = [
        jnp.clip(keys, -32767, 32767).astype(jnp.int16),
        jnp.minimum(hit, 65535.0).astype(jnp.uint16).astype(jnp.int16)[:, None],
        jnp.minimum(miss, 65535.0).astype(jnp.uint16).astype(jnp.int16)[:, None],
        _f32_to_2xi16(mint),
    ]
    if with_avg:
        cols.append(_f32_to_2xi16(sxyz).reshape(keys.shape[0], 6))
        cols.append(_f32_to_2xi16(sint))
    return jnp.concatenate(cols, axis=1), jnp.sum(valid).astype(jnp.int32)


def _2xi16_to_f32(cols: np.ndarray) -> np.ndarray:
    """Host inverse of :func:`_f32_to_2xi16` — [..., 2] int16 → f32."""
    u = np.ascontiguousarray(cols).view(np.uint16).astype(np.uint32)
    bits = u[..., 0] | (u[..., 1] << 16)
    return bits.view(np.float32)


class MultiResolutionVoxelMap:
    """Host-side sparse accumulator fed by the per-scan device kernel."""

    def __init__(self, settings: MrvmSettings = None):
        self.settings = settings or MrvmSettings()
        s = self.settings
        s.hit_prob = min(max(s.hit_prob, 0.501), MAX_PROB)
        s.miss_prob = min(max(s.miss_prob, MIN_PROB), 0.499)
        # host-side sparse accumulator: native C++ hash map when the
        # toolchain is available (builder/mrvm_store.py), numpy fallback
        from .mrvm_store import make_store
        self._store = make_store()
        self._snapshot = None     # cached export, invalidated by inserts

    # ------------------------------------------------------------------
    # read-back bucket: the valid-prefix length varies per scan, and every
    # distinct slice length would compile its own program (seconds each
    # over the remote tunnel) — round up so a handful of shapes cover all
    _READBACK_BUCKET = 1 << 18

    def insert_point_cloud(self, cloud: PointCloud, origin: np.ndarray
                           ) -> None:
        """InsertPointCloud parity (cc:54-123). ``cloud`` must already be in
        global/map coordinates; ``origin`` is the sensor position."""
        self.consume(self.dispatch(cloud, origin))

    def dispatch(self, cloud: PointCloud, origin: np.ndarray):
        """Async half of :meth:`insert_point_cloud`: launch the device
        ray-event program and return a handle for :meth:`consume`.  Lets
        the map exporter overlap THIS submap's host-side hash merge with
        the NEXT submap's device sort (the two halves are comparable in
        cost — r05 breakdown)."""
        s = self.settings
        origin = np.asarray(origin, dtype=np.float32).copy()
        origin[2] += s.z_offset
        with_avg = bool(s.output_average) or not s.use_max_intensity
        packed, n_valid = _scan_events_packed(
            cloud.xyz, cloud.mask, cloud.intensity,
            jnp.asarray(origin), s.high_resolution,
            s.max_ray_steps, with_avg)
        return packed, n_valid, with_avg

    def consume(self, handle) -> None:
        """Blocking half: read back the packed events and merge into the
        host store."""
        s = self.settings
        packed, n_valid, with_avg = handle
        # valid segments occupy a PREFIX of the sorted event slots (invalid
        # keys sort to the end) — transfer only that prefix, bucket-rounded
        nv = int(n_valid)
        b = min(-(-max(nv, 1) // self._READBACK_BUCKET)
                * self._READBACK_BUCKET, packed.shape[0])
        arr = np.asarray(packed[:b])[:nv]
        keys = arr[:, 0:3].astype(np.int32)
        hit = np.ascontiguousarray(arr[:, 3]).view(np.uint16) \
            .astype(np.float32)
        miss = np.ascontiguousarray(arr[:, 4]).view(np.uint16) \
            .astype(np.float32)
        mint = _2xi16_to_f32(arr[:, 5:7])
        if with_avg:
            sxyz = _2xi16_to_f32(arr[:, 7:13].reshape(-1, 3, 2))
            sint = _2xi16_to_f32(arr[:, 13:15])
        else:
            sxyz = np.zeros((nv, 3), dtype=np.float32)
            sint = np.zeros((nv,), dtype=np.float32)
        self._store.merge(keys, hit, miss, sxyz, mint, sint,
                          cap=float(s.max_point_num_in_cell))
        self._snapshot = None

    # ------------------------------------------------------------------
    def _export(self):
        if self._snapshot is None:
            self._snapshot = self._store.export()
        return self._snapshot

    def probabilities(self) -> np.ndarray:
        s = self.settings
        _, hits, misses, _, _, _, _ = self._export()
        lo = (hits * prob_to_log_odds(s.hit_prob)
              + misses * prob_to_log_odds(s.miss_prob))
        p = log_odds_to_prob(lo)
        return np.clip(p, MIN_PROB, MAX_PROB)

    def output_to_numpy(self, threshold: Optional[float] = None
                        ) -> np.ndarray:
        """OutputToPointCloud parity (cc:125-242): emit voxels with
        occupancy > threshold as (x, y, z, intensity)."""
        keys, hits, misses, sum_xyz, max_int, sum_int, avg_cnt = \
            self._export()
        if not len(hits):
            return np.zeros((0, 4), dtype=np.float32)
        s = self.settings
        threshold = s.prob_threshold if threshold is None else threshold
        p = self.probabilities()
        keep = (p > threshold) & (hits > 0)
        centers = (keys[keep].astype(np.float64) + 0.5) \
            * s.high_resolution
        if s.output_average:
            pts = sum_xyz[keep] / np.maximum(avg_cnt[keep], 1)[:, None]
        else:
            pts = centers
        # use_max_intensity selects max vs per-voxel average intensity
        # (multi_resolution_voxel_map.cc intensity policy); averages run
        # over the ≤max_point_num_in_cell admitted points (cc:100)
        if s.use_max_intensity:
            inten = max_int[keep]
        else:
            inten = sum_int[keep] / np.maximum(avg_cnt[keep], 1)
        return np.column_stack([pts, inten]).astype(np.float32)

    @property
    def num_voxels(self) -> int:
        return self._store.size
