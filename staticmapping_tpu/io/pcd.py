"""Minimal PCD (Point Cloud Data) file I/O — the reference's map output
format (pcl::io::savePCDFileBinary; SaveMaps writes static_map.pcd /
whole_map.pcd, map_builder.cc:896-909). Binary little-endian, fields
x y z intensity (f32)."""
from __future__ import annotations

import numpy as np

_HEADER = """# .PCD v0.7 - Point Cloud Data file format
VERSION 0.7
FIELDS x y z intensity
SIZE 4 4 4 4
TYPE F F F F
COUNT 1 1 1 1
WIDTH {n}
HEIGHT 1
VIEWPOINT 0 0 0 1 0 0 0
POINTS {n}
DATA binary
"""


def write_pcd(path: str, points: np.ndarray) -> None:
    """points: [N, 3] or [N, 4] (x, y, z[, intensity])."""
    pts = np.asarray(points, dtype=np.float32)
    if pts.ndim != 2 or pts.shape[1] not in (3, 4):
        raise ValueError(f"expected [N,3|4], got {pts.shape}")
    if pts.shape[1] == 3:
        pts = np.concatenate(
            [pts, np.zeros((pts.shape[0], 1), dtype=np.float32)], axis=1)
    with open(path, "wb") as f:
        f.write(_HEADER.format(n=pts.shape[0]).encode())
        f.write(np.ascontiguousarray(pts).tobytes())


_HEADER_RGB = """# .PCD v0.7 - Point Cloud Data file format
VERSION 0.7
FIELDS x y z rgb
SIZE 4 4 4 4
TYPE F F F U
COUNT 1 1 1 1
WIDTH {n}
HEIGHT 1
VIEWPOINT 0 0 0 1 0 0 0
POINTS {n}
DATA binary
"""


def write_pcd_rgb(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """XYZRGB PCD (pcl::PointXYZRGB layout: rgb packed 0x00RRGGBB into one
    32-bit field) — the ``output_rgb`` map format
    (multi_resolution_voxel_map.cc:204-209, 233)."""
    xyz = np.asarray(xyz, dtype=np.float32)
    rgb = np.asarray(rgb, dtype=np.float32)
    if rgb.ndim == 1:                      # grayscale → replicate
        # sensors with normalized 0..1 intensity (and the synthetic world)
        # would clip to a near-black 0/1 — rescale those to 0..255 first
        if rgb.size and np.nanmax(rgb) <= 1.0:
            rgb = rgb * 255.0
        # reference boosts intensity ×1.4 then clamps before packing
        # (multi_resolution_voxel_map.cc:181-186)
        rgb = rgb * 1.4
        rgb = np.repeat(rgb[:, None], 3, axis=1)
    rgb = np.clip(rgb, 0, 255).astype(np.uint32)
    packed = ((rgb[:, 0] << 16) | (rgb[:, 1] << 8)
              | rgb[:, 2]).astype(np.uint32)
    rec = np.empty((xyz.shape[0], 4), dtype=np.float32)
    rec[:, :3] = xyz
    rec[:, 3] = packed.view(np.float32)
    with open(path, "wb") as f:
        f.write(_HEADER_RGB.format(n=rec.shape[0]).encode())
        f.write(np.ascontiguousarray(rec).tobytes())


def read_pcd(path: str) -> np.ndarray:
    """Read a binary or ascii PCD with x y z [intensity] f32 fields."""
    with open(path, "rb") as f:
        header = {}
        fields = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("#"):
                continue
            key, _, rest = line.partition(" ")
            header[key] = rest
            if key == "FIELDS":
                fields = rest.split()
            if key == "DATA":
                mode = rest
                break
        n = int(header["POINTS"])
        k = len(fields)
        if mode == "binary":
            data = np.frombuffer(f.read(n * k * 4), dtype=np.float32)
            return data.reshape(n, k).copy()
        elif mode == "ascii":
            return np.loadtxt(f, dtype=np.float32).reshape(n, k)
        raise ValueError(f"unsupported PCD data mode {mode!r}")
