"""GroundRemoval2 — Himmelsbach line-fit ground segmentation, TPU-native.

Capability parity with the reference's largest pre-processor
(pre_processors/filter_ground_removal2.{h,cc}, 542 LoC; the paper is
"Fast Segmentation of 3D Pointcloud for Ground Vehicles", 2010):

  1. polar (segment × bin) grid of per-cell min-z points
     (SetInputCloud, filter_ground_removal2.cc:126-210)
  2. per-segment incremental ground-line fitting
     (FitLines, cc:240-330)
  3. ground labeling by vertical distance to the fitted segment lines,
     searching neighbor segments within ``search_angle``
     (ClusterGround, cc:337-400); ground points are removed.

The reference runs step 2 on a thread pool and step 3 with OpenMP; here
step 2 is ONE ``vmap(lax.scan)`` — every segment's line state machine
advances over its bins in lockstep — and step 3 is fully vectorized over
points × candidate segments (SURVEY §2.9 P3).

Deliberate deviations (documented, not silent):
  * The line-fit rejection test uses the running least-squares fit
    (incremental sums) and checks the NEW point's residual, where the
    reference refits with QR and checks the max residual over the whole
    current line (cc:29-55).  For ground-like data the two agree — the
    max residual is almost always the newest point's.
  * Out-of-range points (r < r_min or r > r_max) are never labeled ground.
    (The reference's range test ``range < r_min_ && range > r_max_``
    (cc:161) can never be true — an upstream bug — so it clamps every
    point into the grid instead; we use the evident intent.)
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import ClassVar, Dict, Tuple

import jax
import jax.numpy as jnp

from ..data.cloud import PointCloud
from .filters import Filter

_BIG = 1.0e6


@partial(jax.jit, static_argnames=("segment_num", "bin_num", "max_lines",
                                   "search_steps"))
def _fit_and_label(xyz, mask,
                   r_min, r_max, start_ground_height, long_line_threshold,
                   max_long_line_height, max_start_height, max_error,
                   max_slope, max_dist_to_line, search_steps,
                   segment_num: int, bin_num: int, max_lines: int):
    """Returns a boolean ``is_ground`` per point."""
    f32 = jnp.float32
    n = xyz.shape[0]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rng = jnp.sqrt(x * x + y * y)
    in_range = mask & (rng >= r_min) & (rng <= r_max)

    two_pi = 2.0 * math.pi
    rad = jnp.arctan2(y, x)
    rad = jnp.where(rad < 0, rad + two_pi, rad)
    d_alpha = two_pi / segment_num
    d_bin = (r_max - r_min) / bin_num
    s_idx = jnp.clip((rad / d_alpha).astype(jnp.int32), 0, segment_num - 1)
    b_idx = jnp.clip(((rng - r_min) / d_bin).astype(jnp.int32), 0,
                     bin_num - 1)
    cell = s_idx * bin_num + b_idx
    n_cells = segment_num * bin_num

    # ---- per-cell min-z point (d, z) by scatter-min ----
    zq = jnp.where(in_range, z, _BIG)
    cell_safe = jnp.where(in_range, cell, 0)
    cell_min_z = jnp.full((n_cells,), _BIG, dtype=f32).at[cell_safe].min(zq)
    # d of the argmin-z point: scatter-min a fused (z, d) key — quantize z
    # to a strict ordering then break ties by d (any argmin-z point works;
    # reference takes first-seen which is scan order, same family)
    is_min = in_range & (z <= cell_min_z[cell] + 1e-6)
    dq = jnp.where(is_min, rng, _BIG)
    cell_min_d = jnp.full((n_cells,), _BIG, dtype=f32).at[cell_safe].min(dq)
    cell_occupied = cell_min_z < _BIG * 0.5

    seg_min_z = cell_min_z.reshape(segment_num, bin_num)
    seg_min_d = cell_min_d.reshape(segment_num, bin_num)
    seg_occ = cell_occupied.reshape(segment_num, bin_num)

    # ---- per-segment incremental line fitting (FitLines, cc:240-330) ----
    def segment_scan(min_d, min_z, occ):
        lines0 = jnp.zeros((max_lines, 4), dtype=f32)   # d0, z0, d1, z1

        def fit(sums):
            cnt, sx, sy, sxx, sxy = sums
            den = cnt * sxx - sx * sx
            m = jnp.where(jnp.abs(den) > 1e-12,
                          (cnt * sxy - sx * sy) / den, 0.0)
            b = jnp.where(cnt > 0, (sy - m * sx) / jnp.maximum(cnt, 1.0), 0.0)
            return m, b

        def step(state, inp):
            (cnt, sx, sy, sxx, sxy, first_d, last_d, last_z,
             is_long, ground_h, lines, n_lines) = state
            d, zz, has = inp

            def on_empty(_):
                return state

            def on_point(_):
                # long-line detection (cc:258-261); only meaningful once the
                # current line has at least one point
                new_long = is_long | ((cnt >= 1.0)
                                      & (d - last_d >= long_line_threshold))
                m, b = fit((cnt, sx, sy, sxx, sxy))

                # cnt >= 2 path: tentatively add, test, maybe close line
                cnt2 = cnt + 1.0
                sx2, sy2 = sx + d, sy + zz
                sxx2, sxy2 = sxx + d * d, sxy + d * zz
                m2, b2 = fit((cnt2, sx2, sy2, sxx2, sxy2))
                err = jnp.abs(m2 * d + b2 - zz)
                expected_z = m * d + b
                bad = ((err > max_error)
                       | (jnp.abs(m2) > max_slope)
                       | (new_long & (cnt > 2)
                          & (jnp.abs(expected_z - zz) > max_long_line_height)))

                # close current line into the buffer if it has ≥3 points
                line = jnp.array([first_d, m * first_d + b,
                                  last_d, m * last_d + b], dtype=f32)
                can_close = cnt >= 3.0
                lines_c = jnp.where(
                    can_close,
                    lines.at[jnp.clip(n_lines, 0, max_lines - 1)].set(line),
                    lines)
                n_lines_c = jnp.where(can_close,
                                      jnp.minimum(n_lines + 1, max_lines),
                                      n_lines)
                ground_c = jnp.where(can_close, m * last_d + b, ground_h)
                # restart from the previous last point, then try to attach
                # the current point through the size<2 rule (cc:305-315)
                attach = jnp.abs(last_z - ground_c) < max_start_height
                # state when rejected:
                r_cnt = jnp.where(attach, 2.0, 1.0)
                r_sx = jnp.where(attach, last_d + d, d)
                r_sy = jnp.where(attach, last_z + zz, zz)
                r_sxx = jnp.where(attach, last_d * last_d + d * d, d * d)
                r_sxy = jnp.where(attach, last_d * last_z + d * zz, d * zz)
                r_first = jnp.where(attach, last_d, d)

                # state when accepted:
                a_cnt, a_sx, a_sy, a_sxx, a_sxy = cnt2, sx2, sy2, sxx2, sxy2

                # cnt < 2 path (cc:305-315): attach if near ground height
                small_attach = (~new_long) & (jnp.abs(last_z - ground_h)
                                              < max_start_height)
                s_cnt = jnp.where(small_attach, cnt + 1.0, 1.0)
                s_sx = jnp.where(small_attach, sx + d, d)
                s_sy = jnp.where(small_attach, sy + zz, zz)
                s_sxx = jnp.where(small_attach, sxx + d * d, d * d)
                s_sxy = jnp.where(small_attach, sxy + d * zz, d * zz)
                s_first = jnp.where(small_attach, first_d, d)

                grown = cnt >= 2.0
                use_reject = grown & bad

                n_cnt = jnp.where(grown, jnp.where(bad, r_cnt, a_cnt),
                                  jnp.where(cnt < 1.0, 1.0, s_cnt))
                n_sx = jnp.where(grown, jnp.where(bad, r_sx, a_sx),
                                 jnp.where(cnt < 1.0, d, s_sx))
                n_sy = jnp.where(grown, jnp.where(bad, r_sy, a_sy),
                                 jnp.where(cnt < 1.0, zz, s_sy))
                n_sxx = jnp.where(grown, jnp.where(bad, r_sxx, a_sxx),
                                  jnp.where(cnt < 1.0, d * d, s_sxx))
                n_sxy = jnp.where(grown, jnp.where(bad, r_sxy, a_sxy),
                                  jnp.where(cnt < 1.0, d * zz, s_sxy))
                n_first = jnp.where(grown, jnp.where(bad, r_first, first_d),
                                    jnp.where(cnt < 1.0, d, s_first))
                n_lines2 = jnp.where(use_reject, n_lines_c, n_lines)
                lines2 = jnp.where(use_reject, lines_c, lines)
                n_ground = jnp.where(use_reject, ground_c, ground_h)
                n_is_long = jnp.where(use_reject, False, new_long)
                return (n_cnt, n_sx, n_sy, n_sxx, n_sxy, n_first, d, zz,
                        n_is_long, n_ground, lines2, n_lines2)

            return jax.lax.cond(has, on_point, on_empty, None), None

        init = (jnp.float32(0.0),) * 5 + (jnp.float32(0.0),
                                          jnp.float32(-_BIG), jnp.float32(0.0),
                                          jnp.asarray(False),
                                          jnp.float32(start_ground_height),
                                          lines0, jnp.int32(0))
        (cnt, sx, sy, sxx, sxy, first_d, last_d, last_z, _long, _gh,
         lines, n_lines), _ = jax.lax.scan(
            step, init, (min_d, min_z, occ))
        # final flush (cc:326-330)
        den = cnt * sxx - sx * sx
        m = jnp.where(jnp.abs(den) > 1e-12, (cnt * sxy - sx * sy) / den, 0.0)
        b = jnp.where(cnt > 0, (sy - m * sx) / jnp.maximum(cnt, 1.0), 0.0)
        line = jnp.array([first_d, m * first_d + b,
                          last_d, m * last_d + b], dtype=f32)
        flush = cnt >= 3.0
        lines = jnp.where(
            flush, lines.at[jnp.clip(n_lines, 0, max_lines - 1)].set(line),
            lines)
        n_lines = jnp.where(flush, jnp.minimum(n_lines + 1, max_lines),
                            n_lines)
        return lines, n_lines

    seg_lines, seg_counts = jax.vmap(segment_scan)(
        seg_min_d, seg_min_z, seg_occ)          # [S, L, 4], [S]

    # ---- ground labeling (ClusterGround, cc:337-400) ----
    # candidate segments in reference priority order:
    # own, +K, −K, …, +1, −1 (cc:343-347)
    offs = [0]
    for i in range(search_steps, 0, -1):
        offs.extend([i, -i])
    offsets = jnp.asarray(offs, dtype=jnp.int32)          # [C]

    def dist_to_segment(lines, n_lines, d, zz):
        """VerticalDistanceToSegment (cc:403-421): last covering line."""
        lid = jnp.arange(max_lines)
        valid = lid < n_lines
        covers = valid & (lines[:, 0] - 0.1 < d) & (lines[:, 2] + 0.1 > d)
        dd = lines[:, 2] - lines[:, 0]
        ez = jnp.where(jnp.abs(dd) > 1e-9,
                       (d - lines[:, 0]) / dd * (lines[:, 3] - lines[:, 1])
                       + lines[:, 1], lines[:, 1])
        dist = jnp.abs(zz - ez)
        # reference keeps the LAST covering line's distance
        last = jnp.max(jnp.where(covers, lid, -1))
        return jnp.where(last >= 0, dist[jnp.clip(last, 0, max_lines - 1)],
                         -1.0)

    def label_point(si, d, zz):
        cand = (si + offsets) % segment_num
        dists = jax.vmap(
            lambda c: dist_to_segment(seg_lines[c], seg_counts[c], d, zz)
        )(cand)                                             # [C]
        pos = dists > 0.0
        first = jnp.argmax(pos)                             # first in priority
        dist = jnp.where(jnp.any(pos), dists[first], -1.0)
        return (dist > 0.0) & (dist <= max_dist_to_line)

    # only near-min-z cell members are ground candidates (cc:199-205:
    # grid keeps points with z ≤ min_z + 0.5)
    candidate = in_range & (z <= cell_min_z[cell] + 0.5)
    ground = jax.vmap(label_point)(s_idx, rng, z)
    return candidate & ground


@dataclasses.dataclass
class GroundRemoval2Filter(Filter):
    """See module docstring. Param names/defaults:
    filter_ground_removal2.cc:73-106."""

    r_max: float = 100.0
    r_min: float = 1.0
    bin_num: int = 200
    segment_num: int = 180
    start_ground_height: float = -0.25
    long_line_threshold: float = 1.0
    max_long_line_height: float = 0.1
    max_start_height: float = 0.2
    max_error: float = 0.05
    max_slope: float = math.tan(math.pi / 12.0)
    max_b: float = 0.1                    # kept for config parity (the
    # reference's |b − ground_height| test is commented out, cc:281)
    max_dist_to_line: float = 0.05
    search_angle: float = 10.0            # degrees
    thread_num: int = 4                   # config parity; no threads on TPU
    max_lines: int = 32

    NAME: ClassVar[str] = "GroundRemoval2"
    PARAMS: ClassVar[Dict[str, Tuple[str, type]]] = {
        "r_max": ("r_max", float), "r_min": ("r_min", float),
        "bin_num": ("bin_num", int), "segment_num": ("segment_num", int),
        "start_ground_height": ("start_ground_height", float),
        "long_line_threshold": ("long_line_threshold", float),
        "max_long_line_height": ("max_long_line_height", float),
        "max_start_height": ("max_start_height", float),
        "max_error": ("max_error", float),
        "max_slope": ("max_slope", float),
        "max_b": ("max_b", float),
        "max_dist_to_line": ("max_dist_to_line", float),
        "search_angle": ("search_angle", float),
        "thread_num": ("thread_num", int),
    }

    def configs_valid(self) -> bool:
        return (0 <= self.r_min < self.r_max and self.bin_num > 1
                and self.segment_num > 1)

    def ground_mask(self, cloud: PointCloud):
        d_alpha = 2.0 * math.pi / self.segment_num
        steps = int(self.search_angle / 180.0 * math.pi / d_alpha)
        return _fit_and_label(
            cloud.xyz, cloud.mask,
            jnp.float32(self.r_min), jnp.float32(self.r_max),
            jnp.float32(self.start_ground_height),
            jnp.float32(self.long_line_threshold),
            jnp.float32(self.max_long_line_height),
            jnp.float32(self.max_start_height),
            jnp.float32(self.max_error), jnp.float32(self.max_slope),
            jnp.float32(self.max_dist_to_line), steps,
            segment_num=self.segment_num, bin_num=self.bin_num,
            max_lines=self.max_lines)

    def __call__(self, cloud: PointCloud) -> PointCloud:
        return cloud.with_mask(~self.ground_mask(cloud))
