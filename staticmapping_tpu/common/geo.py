"""WGS-84 geodesy: lat/lon/alt → local-ENU Cartesian.

Host-side replacement for the reference's use of
``GeographicLib::LocalCartesian`` (builder/data/data_collector.cc:83-97,
data_collector.h:74): the first fixed GPS message becomes the ENU origin and
every later fix is expressed in metres East/North/Up of it.

Formulas are the standard closed forms (geodetic→ECEF, ECEF→ENU rotation);
for SLAM-scale extents (km) they agree with GeographicLib to sub-mm.
"""
from __future__ import annotations

import numpy as np

# WGS-84 ellipsoid
_A = 6378137.0                  # semi-major axis [m]
_F = 1.0 / 298.257223563        # flattening
_E2 = _F * (2.0 - _F)           # first eccentricity squared


def geodetic_to_ecef(lat_deg: float, lon_deg: float, alt: float) -> np.ndarray:
    lat = np.deg2rad(lat_deg)
    lon = np.deg2rad(lon_deg)
    sin_lat, cos_lat = np.sin(lat), np.cos(lat)
    n = _A / np.sqrt(1.0 - _E2 * sin_lat * sin_lat)
    x = (n + alt) * cos_lat * np.cos(lon)
    y = (n + alt) * cos_lat * np.sin(lon)
    z = (n * (1.0 - _E2) + alt) * sin_lat
    return np.array([x, y, z])


class LocalCartesian:
    """ENU frame anchored at (lat0, lon0, alt0) — GeographicLib parity."""

    def __init__(self, lat0: float, lon0: float, alt0: float = 0.0):
        self.origin = (lat0, lon0, alt0)
        self._ecef0 = geodetic_to_ecef(lat0, lon0, alt0)
        lat = np.deg2rad(lat0)
        lon = np.deg2rad(lon0)
        sl, cl = np.sin(lat), np.cos(lat)
        so, co = np.sin(lon), np.cos(lon)
        # rows: east, north, up (ECEF → ENU)
        self._R = np.array([
            [-so, co, 0.0],
            [-sl * co, -sl * so, cl],
            [cl * co, cl * so, sl],
        ])

    def forward(self, lat: float, lon: float, alt: float) -> np.ndarray:
        """lat/lon/alt → [east, north, up] in metres."""
        return self._R @ (geodetic_to_ecef(lat, lon, alt) - self._ecef0)

    def reverse(self, enu: np.ndarray, iterations: int = 5) -> tuple:
        """[e, n, u] → (lat, lon, alt); iterative ECEF→geodetic (Bowring)."""
        ecef = self._R.T @ np.asarray(enu, dtype=np.float64) + self._ecef0
        x, y, z = ecef
        lon = np.arctan2(y, x)
        p = np.hypot(x, y)
        lat = np.arctan2(z, p * (1.0 - _E2))
        alt = 0.0
        for _ in range(iterations):
            sin_lat = np.sin(lat)
            n = _A / np.sqrt(1.0 - _E2 * sin_lat * sin_lat)
            alt = p / np.cos(lat) - n
            lat = np.arctan2(z, p * (1.0 - _E2 * n / (n + alt)))
        return np.rad2deg(lat), np.rad2deg(lon), alt
