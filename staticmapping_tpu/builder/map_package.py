"""Map package: whole-map checkpoint serialization.

Parity role: the reference's map package + trajectory XML
(builder/map_package.{h,cc}; Trajectory::ToXmlNode trajectory.cc:32-58;
GenerateMapPackage map_builder.cc:807-814). A saved package holds per-submap
poses, inter-submap transforms and cloud payloads, and is the
checkpoint/resume + multi-session merge substrate (SURVEY §5.4): reload a
package to continue mapping or to merge trajectories.

Format: ``map.xml`` descriptor (same spirit as the reference's pugixml tree)
plus one ``submap_<id>.npz`` per submap (compact masked arrays).
"""
from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..data import cloud as cloud_lib
from .frame import Frame, Submap, SubmapOptions, Trajectory


@dataclasses.dataclass
class MapPackageOptions:
    """builder/map_package.h:36-42 parity."""

    enable: bool = True
    border_offset: float = 100.0
    piece_width: float = 500.0
    cloud_file_prefix: str = "submap_"
    descript_filename: str = "map.xml"


def _pose_to_str(T: np.ndarray) -> str:
    return " ".join(f"{v:.9g}" for v in np.asarray(T, dtype=np.float64).reshape(-1))


def _pose_from_str(s: str) -> np.ndarray:
    return np.fromstring(s, sep=" ").reshape(4, 4)


def save_trajectory(trajectory: Trajectory, out_dir: str,
                    options: MapPackageOptions = None) -> str:
    """Write the package; returns the path of the descriptor XML."""
    options = options or MapPackageOptions()
    os.makedirs(out_dir, exist_ok=True)
    root = ET.Element("MapPackage")
    traj_el = ET.SubElement(root, "Trajectory", id=str(trajectory.id))
    for s in trajectory:
        file_name = f"{options.cloud_file_prefix}{s.id}.npz"
        sub_el = ET.SubElement(traj_el, "Submap", id=str(s.id),
                               stamp=f"{s.stamp:.9f}", file=file_name)
        ET.SubElement(sub_el, "GlobalPose").text = _pose_to_str(s.global_pose)
        if s.match_transform_to_next is not None:
            ET.SubElement(sub_el, "TransformToNext").text = \
                _pose_to_str(s.match_transform_to_next)
        frames_el = ET.SubElement(sub_el, "Frames")
        for f in s.frames:
            f_el = ET.SubElement(frames_el, "Frame",
                                 stamp=f"{f.stamp:.9f}",
                                 score=f"{f.match_score:.6f}")
            ET.SubElement(f_el, "LocalPose").text = _pose_to_str(
                f.local_pose if f.local_pose is not None else np.eye(4))
        if s.cloud is not None:
            arr = cloud_lib.to_numpy(s.cloud)
            payload = {"points": arr}
            if s.descriptor is not None:
                payload["descriptor"] = np.asarray(s.descriptor)
            np.savez_compressed(os.path.join(out_dir, file_name), **payload)
    tree = ET.ElementTree(root)
    ET.indent(tree)
    path = os.path.join(out_dir, options.descript_filename)
    tree.write(path)
    return path


def load_trajectory(package_dir: str, options: MapPackageOptions = None,
                    submap_options: SubmapOptions = None,
                    capacity: Optional[int] = None) -> Trajectory:
    """Reload a saved package (the role promised by the reference's
    MultiTrajectoryMapBuilder::LoadBaseMap, multi_trajectory_map_builder.h:64).
    """
    options = options or MapPackageOptions()
    submap_options = submap_options or SubmapOptions()
    tree = ET.parse(os.path.join(package_dir, options.descript_filename))
    root = tree.getroot()
    traj_el = root.find("Trajectory")
    trajectory = Trajectory(int(traj_el.get("id")))
    for sub_el in traj_el.findall("Submap"):
        sid = int(sub_el.get("id"))
        file_name = sub_el.get("file")
        s = Submap(sid, submap_options, capacity=capacity or 1)
        s.stamp = float(sub_el.get("stamp"))
        s.global_pose = _pose_from_str(sub_el.find("GlobalPose").text)
        nxt = sub_el.find("TransformToNext")
        if nxt is not None:
            s.match_transform_to_next = _pose_from_str(nxt.text)
        npz_path = os.path.join(package_dir, file_name)
        if os.path.exists(npz_path):
            data = np.load(npz_path)
            pts = data["points"]
            cap = capacity or cloud_lib.pad_capacity(pts.shape[0])
            s.capacity = cap
            s.cloud = cloud_lib.from_numpy(pts[:, :3], pts[:, 3],
                                           capacity=cap,
                                           stamp_factors=False)
            if "descriptor" in data:
                s.descriptor = data["descriptor"]
        # reconstruct frame skeletons (poses only — clouds were merged)
        frames_el = sub_el.find("Frames")
        if frames_el is not None:
            for f_el in frames_el.findall("Frame"):
                f = Frame(stamp=float(f_el.get("stamp")),
                          cloud=None,
                          global_pose=np.eye(4),
                          match_score=float(f_el.get("score")))
                f.local_pose = _pose_from_str(f_el.find("LocalPose").text)
                f.global_pose = s.global_pose @ f.local_pose
                s.frames.append(f)
        trajectory.append(s)
    return trajectory


def save_map_pieces(trajectories, out_dir: str,
                    options: MapPackageOptions = None,
                    mrvm_settings=None) -> Optional[str]:
    """SaveTrajectoriesAsMapPackage parity (map_package.cc:51-230): tile
    the map into ``piece_width``-sized pieces on a half-width grid, build a
    per-piece MRVM static map from the submaps whose centers fall inside
    the border-offset bbox, cut each piece's cloud to its bbox, store it
    center-relative, and write the XML descriptor with piece centers.

    Returns the descriptor path (None when there is nothing to save).
    """
    from ..io import pcd as pcd_io
    from .mrvm import MrvmSettings, MultiResolutionVoxelMap

    options = options or MapPackageOptions()
    mrvm_settings = mrvm_settings or MrvmSettings()
    if not isinstance(trajectories, (list, tuple)):
        trajectories = [trajectories]
    centers = [s.global_pose[:3, 3] for t in trajectories for s in t]
    if not centers:
        return None
    centers = np.stack(centers)
    min_xy = centers[:, :2].min(axis=0) - options.border_offset
    max_xy = centers[:, :2].max(axis=0) + options.border_offset
    half = options.piece_width * 0.5
    x_steps = max(int((max_xy[0] - min_xy[0]) / half), 1)
    y_steps = max(int((max_xy[1] - min_xy[1]) / half), 1)

    os.makedirs(out_dir, exist_ok=True)
    root = ET.Element("MapPackage")
    for x in range(x_steps):
        for y in range(y_steps):
            center = np.array([min_xy[0] + (x + 1) * half,
                               min_xy[1] + (y + 1) * half])
            bb_min = np.clip(center - half, min_xy, max_xy)
            bb_max = np.clip(center + half, min_xy, max_xy)
            off_min = bb_min - options.border_offset
            off_max = bb_max + options.border_offset
            vm = MultiResolutionVoxelMap(mrvm_settings)
            n_inside = 0
            for t in trajectories:
                for s in t:
                    p = s.global_pose[:3, 3]
                    if not (off_min[0] <= p[0] <= off_max[0]
                            and off_min[1] <= p[1] <= off_max[1]):
                        continue
                    if s.cloud is None:
                        continue
                    gc = s.cloud.transform(jnp.asarray(s.global_pose,
                                                       dtype=jnp.float32))
                    vm.insert_point_cloud(gc, p)
                    n_inside += 1
            if n_inside == 0:
                continue
            pts = vm.output_to_numpy()
            if not len(pts):
                continue
            inside = ((pts[:, 0] >= bb_min[0]) & (pts[:, 0] <= bb_max[0])
                      & (pts[:, 1] >= bb_min[1]) & (pts[:, 1] <= bb_max[1]))
            pts = pts[inside]
            if not len(pts):
                continue
            pts[:, 0] -= center[0]
            pts[:, 1] -= center[1]
            fname = f"{options.cloud_file_prefix}{x}_{y}.pcd"
            pcd_io.write_pcd(os.path.join(out_dir, fname), pts)
            piece = ET.SubElement(root, "Piece")
            piece.set("x", f"{center[0]:.6f}")
            piece.set("y", f"{center[1]:.6f}")
            piece.set("file", fname)
    tree = ET.ElementTree(root)
    ET.indent(tree)
    path = os.path.join(out_dir, options.descript_filename)
    tree.write(path)
    return path
