"""Sensor hub — host-side parity with the reference's ``DataCollector``
(builder/data/data_collector.{h,cc}).

Responsibilities (same surface, single-threaded where the reference used a
queue+thread per sensor — the TPU pipeline is a sequential host loop):

  * cloud accumulation: merge ``accumulate_cloud_num`` consecutive scans into
    one, stamped with per-point ``factor = i / size`` for motion compensation
    (data_collector.h:160-211)
  * IMU queue (data_collector.cc:73-81)
  * odometry queue, re-based so the first odom is the origin
    (data_collector.cc:174-194)
  * GPS: first *fixed* message anchors a local ENU frame; every fix is
    converted lat/lon/alt → ENU (data_collector.cc:83-118)
  * time-interpolated GPS / odom lookup with the reference's exact gating
    (binary search, max gap 0.2 s GPS / 1 s odom, trim consumed history —
    data_collector.cc:196-296)
  * raw ENU / odom path export for diagnostics (cc:58-71)
"""
from __future__ import annotations

import bisect
import dataclasses
from typing import List, Optional, Tuple

import numpy as np

from ..common import np_se3
from ..common.geo import LocalCartesian

STATUS_FIX = 0  # sensor_msgs/NavSatStatus STATUS_FIX (data_types.h)


@dataclasses.dataclass
class ImuMsg:
    stamp: float
    angular_velocity: np.ndarray      # [3] rad/s
    linear_acceleration: np.ndarray   # [3] m/s²


@dataclasses.dataclass
class OdomMsg:
    stamp: float
    pose: np.ndarray                  # [4, 4]


@dataclasses.dataclass
class NavSatFixMsg:
    stamp: float
    latitude: float
    longitude: float
    altitude: float
    status: int = STATUS_FIX


@dataclasses.dataclass
class GpsData:
    stamp: float
    enu: np.ndarray                   # [3] east/north/up
    lat_lon_alt: np.ndarray
    status_fixed: bool


@dataclasses.dataclass
class DataCollectorOptions:
    """DataCollectorOptions parity (data_collector.h:48-52)."""

    accumulate_cloud_num: int = 1


class DataCollector:
    def __init__(self, options: DataCollectorOptions = None,
                 filter_chain=None):
        self.options = options or DataCollectorOptions()
        self.filter_chain = filter_chain
        self.imu_data: List[ImuMsg] = []
        self.odom_data: List[Tuple[float, np.ndarray]] = []
        self.gps_data: List[GpsData] = []
        self.reference_gps: Optional[LocalCartesian] = None
        self.odom_init_offset: Optional[np.ndarray] = None
        self.enu_path: List[np.ndarray] = []
        self.odom_path: List[np.ndarray] = []
        # cloud accumulation state
        self._accumulated: List[np.ndarray] = []
        self._accumulated_first_stamp: Optional[float] = None

    # ----------------------------------------------------------- clouds --
    def add_cloud(self, stamp: float, points: np.ndarray
                  ) -> Optional[Tuple[float, np.ndarray]]:
        """Accumulate scans; returns (stamp, merged_points) every
        ``accumulate_cloud_num`` inputs, else None. The caller stamps
        per-point factors when building the padded device cloud
        (cloud.from_numpy), matching data_collector.h:202-205."""
        if self.options.accumulate_cloud_num <= 1:
            return stamp, np.asarray(points)
        if not self._accumulated:
            self._accumulated_first_stamp = stamp
        self._accumulated.append(np.asarray(points))
        if len(self._accumulated) < self.options.accumulate_cloud_num:
            return None
        merged = np.vstack(self._accumulated)
        out_stamp = self._accumulated_first_stamp
        self._accumulated = []
        self._accumulated_first_stamp = None
        return out_stamp, merged

    # -------------------------------------------------------------- imu --
    def add_imu(self, msg: ImuMsg) -> None:
        self.imu_data.append(msg)

    # ------------------------------------------------------------- odom --
    def add_odom(self, msg: OdomMsg) -> None:
        """Re-base to the first odom pose (data_collector.cc:179-185)."""
        pose = np.asarray(msg.pose, dtype=np.float64)
        if self.odom_init_offset is None:
            self.odom_init_offset = pose.copy()
        rel = np_se3.inverse(self.odom_init_offset) @ pose
        self.odom_data.append((msg.stamp, rel))
        self.odom_path.append(rel[:3, 3].copy())

    # -------------------------------------------------------------- gps --
    def add_gps(self, msg: NavSatFixMsg) -> None:
        """First fixed message anchors the ENU frame
        (data_collector.cc:83-118)."""
        fixed = msg.status == STATUS_FIX
        if self.reference_gps is None:
            if not fixed:
                return
            self.reference_gps = LocalCartesian(
                msg.latitude, msg.longitude, msg.altitude)
        enu = self.reference_gps.forward(
            msg.latitude, msg.longitude, msg.altitude)
        if self.gps_data and msg.stamp <= self.gps_data[-1].stamp:
            raise ValueError("gps timestamps must be strictly increasing")
        self.gps_data.append(GpsData(
            stamp=msg.stamp, enu=enu,
            lat_lon_alt=np.array([msg.latitude, msg.longitude, msg.altitude]),
            status_fixed=fixed))
        self.enu_path.append(np.append(enu, float(msg.status)))

    # ---------------------------------------------------- interpolation --
    def interpolate_gps(self, time: float, time_threshold: float = 0.005,
                        trim_data: bool = False) -> Optional[np.ndarray]:
        """InterpolateGps parity (data_collector.cc:196-245): returns the
        ENU position at ``time`` or None (no data / gap > 0.2 s / unfixed)."""
        assert time_threshold <= 0.5
        data = self.gps_data
        if not data:
            return None
        if len(data) == 1:
            if (abs(time - data[0].stamp) <= time_threshold
                    and data[0].status_fixed):
                return data[0].enu.copy()
            return None
        if time < data[0].stamp or time > data[-1].stamp:
            return None
        lo, hi = _timestamp_binary_search([d.stamp for d in data], time)
        former, latter = data[lo], data[hi]
        if trim_data:
            del self.gps_data[:lo]
        delta_time = latter.stamp - former.stamp
        if delta_time <= 1e-6:
            return former.enu.copy()
        if (delta_time > 0.2 or not former.status_fixed
                or not latter.status_fixed):
            return None
        factor = (time - former.stamp) / delta_time
        return former.enu + factor * (latter.enu - former.enu)

    def interpolate_odom(self, time: float, time_threshold: float = 0.005,
                         trim_data: bool = False) -> Optional[np.ndarray]:
        """InterpolateOdom parity (data_collector.cc:247-296): SE(3)
        interpolation (slerp rotation, lerp translation)."""
        assert time_threshold <= 0.5
        data = self.odom_data
        if not data:
            return None
        if len(data) == 1:
            if abs(time - data[0][0]) <= time_threshold:
                return data[0][1].copy()
            return None
        if time < data[0][0] or time > data[-1][0]:
            return None
        lo, hi = _timestamp_binary_search([d[0] for d in data], time)
        (t0, p0), (t1, p1) = data[lo], data[hi]
        if trim_data:
            del self.odom_data[:lo]
        delta_time = t1 - t0
        if delta_time <= 1e-6:
            return p0.copy()
        if delta_time > 1.0:
            return None
        factor = (time - t0) / delta_time
        return _interpolate_transform(p0, p1, factor)

    # ------------------------------------------------------------ export --
    def raw_gps_path(self) -> np.ndarray:
        """[n, 4] east/north/up/status (RawGpsDataToFile parity)."""
        return (np.stack(self.enu_path) if self.enu_path
                else np.zeros((0, 4)))

    def raw_odom_path(self) -> np.ndarray:
        return (np.stack(self.odom_path) if self.odom_path
                else np.zeros((0, 3)))


def _timestamp_binary_search(stamps: List[float], time: float
                             ) -> Tuple[int, int]:
    """Index pair (lo, hi) with stamps[lo] <= time <= stamps[hi], hi = lo+1
    (data_collector.cc TimeStampBinarySearch)."""
    hi = bisect.bisect_left(stamps, time)
    if hi == 0:
        return 0, 1 if len(stamps) > 1 else 0
    if hi >= len(stamps):
        return len(stamps) - 2, len(stamps) - 1
    if stamps[hi] == time:
        return max(hi - 1, 0), hi
    return hi - 1, hi


def _interpolate_transform(p0: np.ndarray, p1: np.ndarray,
                           factor: float) -> np.ndarray:
    """common::InterpolateTransform parity (common/math.h:198-211):
    slerp rotation + lerp translation."""
    q0 = np_se3.matrix_to_quat(p0[:3, :3])
    q1 = np_se3.matrix_to_quat(p1[:3, :3])
    if np.dot(q0, q1) < 0:
        q1 = -q1
    d = np.clip(np.dot(q0, q1), -1.0, 1.0)
    theta = np.arccos(d)
    if theta < 1e-8:
        q = np_se3.quat_normalize(q0 + factor * (q1 - q0))
    else:
        s = np.sin(theta)
        q = (np.sin((1 - factor) * theta) / s) * q0 \
            + (np.sin(factor * theta) / s) * q1
        q = np_se3.quat_normalize(q)
    t = p0[:3, 3] + factor * (p1[:3, 3] - p0[:3, 3])
    return np_se3.from_rt(np_se3.quat_to_matrix(q), t)
