"""Multi-trajectory map merging — the capability the reference designed
but never finished building.

Parity target: ``MultiTrajectoryMapBuilder`` (builder/multi_trajectory/
multi_trajectory_map_builder.h:44-86: LoadBaseMap / LoadIncrementalMap →
cross-trajectory loop detection → joint optimization → merged output) and
``MultiTrajectoryOptimizer`` (back_end/multi_trajectory/
multi_trajectory_optimizer.h:48-84, 64-bit key = trajectory≪32 | submap,
.cc:39-46) — both excluded from the reference's build (stale API).

TPU-native design: all submaps of all trajectories become nodes of ONE
pose graph (node id = offset(traj) + submap id, the flat version of the
64-bit key); intra-trajectory between factors come from each package's
``match_transform_to_next``; cross-trajectory edges are found by a
2-D distance gate + optional M2DP descriptor gate, then ALL candidate
pairs are registered in one batched call (parallel/align_pairs — the
P2 layer), mutual-consistency checked, and added as loop factors.  The
joint solve runs on the block-sparse PCG solver, so hundreds of submaps
per trajectory are fine.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..common import np_se3
from ..backend.pose_graph import PoseGraph
from ..descriptor import m2dp
from .frame import Submap, Trajectory
from .map_package import MapPackageOptions, load_trajectory, save_trajectory


@dataclasses.dataclass
class MultiTrajectoryOptions:
    """Knob parity with LoopDetectorSettings where applicable
    (loop_detector_options.h:29-40)."""

    max_distance: float = 25.0        # 2-D candidate gate
    max_z_distance: float = 2.0
    use_descriptor: bool = True
    m2dp_match_score: float = 0.97
    accept_match_score: float = 0.75
    max_pairs: int = 64               # cap on cross edges per merge
    normal_leaf_size: int = 8
    nn_tile: int = 1024
    num_solver_iters: int = 10


class MultiTrajectoryMapBuilder:
    """load base + incremental trajectories, detect cross-trajectory
    overlaps, jointly optimize, export."""

    def __init__(self, options: MultiTrajectoryOptions = None):
        self.options = options or MultiTrajectoryOptions()
        self.trajectories: List[Trajectory] = []

    # ------------------------------------------------------------ load --
    def load_base_map(self, package_dir: str,
                      pkg_options: MapPackageOptions = None) -> Trajectory:
        """LoadBaseMap (multi_trajectory_map_builder.h:64)."""
        return self._load(package_dir, pkg_options)

    def load_incremental_map(self, package_dir: str,
                             pkg_options: MapPackageOptions = None
                             ) -> Trajectory:
        """LoadIncrementalMap (multi_trajectory_map_builder.h:65)."""
        return self._load(package_dir, pkg_options)

    def _load(self, package_dir, pkg_options):
        traj = load_trajectory(package_dir, pkg_options)
        traj.id = len(self.trajectories)
        self.trajectories.append(traj)
        return traj

    def add_trajectory(self, traj: Trajectory) -> None:
        traj.id = len(self.trajectories)
        self.trajectories.append(traj)

    # ------------------------------------------------------- key layout --
    def _offsets(self) -> List[int]:
        offs, n = [], 0
        for t in self.trajectories:
            offs.append(n)
            n += len(t)
        return offs

    def node_id(self, traj_index: int, submap_id: int) -> int:
        """Flat version of SubmapIdToUint64 (multi_trajectory_optimizer.cc:
        39-46: (trajectory << 32) | submap)."""
        return self._offsets()[traj_index] + submap_id

    # -------------------------------------------------- loop candidates --
    def find_cross_candidates(self) -> List[Tuple[int, int, int, int]]:
        """(traj_a, submap_a, traj_b, submap_b) pairs passing the distance
        (+ descriptor) gates; a < b trajectories only."""
        opts = self.options
        cands = []
        for a in range(len(self.trajectories)):
            for b in range(a + 1, len(self.trajectories)):
                for sa in self.trajectories[a]:
                    pa = sa.global_pose[:3, 3]
                    for sb in self.trajectories[b]:
                        pb = sb.global_pose[:3, 3]
                        if (np.linalg.norm(pa[:2] - pb[:2]) > opts.max_distance
                                or abs(pa[2] - pb[2]) > opts.max_z_distance):
                            continue
                        if (opts.use_descriptor
                                and sa.descriptor is not None
                                and sb.descriptor is not None):
                            score = float(m2dp.match_descriptors(
                                jnp.asarray(sa.descriptor),
                                jnp.asarray(sb.descriptor)))
                            if score < opts.m2dp_match_score:
                                continue
                        cands.append((a, sa.id, b, sb.id))
        # spread the cap across the overlap instead of truncating the head
        if len(cands) > opts.max_pairs:
            step = len(cands) / opts.max_pairs
            cands = [cands[int(i * step)] for i in range(opts.max_pairs)]
        return cands

    # ---------------------------------------------------------- merge --
    def merge(self, num_candidates_out: Optional[list] = None) -> int:
        """Cross-register candidates (one batched call), add factors,
        jointly solve.  Returns the number of accepted cross edges."""
        opts = self.options
        assert len(self.trajectories) >= 2, "need at least two trajectories"
        cands = self.find_cross_candidates()
        if num_candidates_out is not None:
            num_candidates_out.append(len(cands))

        accepted = []
        if cands:
            from ..parallel.align_pairs import align_pair_list
            sources, targets, guesses = [], [], []
            for (a, ia, b, ib) in cands:
                sa = self.trajectories[a][ia]
                sb = self.trajectories[b][ib]
                # register b's submap onto a's (a = target/base frame);
                # target normals come from the submap's cache
                # (builder/frame.py Submap.normal_cloud)
                sources.append(sb.cloud)
                targets.append(sa.normal_cloud(opts.normal_leaf_size))
                guesses.append(
                    np_se3.inverse(sa.global_pose) @ sb.global_pose)
            Ts_l, scores_l = align_pair_list(sources, targets, guesses)
            Ts = np.stack(Ts_l)
            scores = np.asarray(scores_l, dtype=np.float64)
            for k, (a, ia, b, ib) in enumerate(cands):
                if scores[k] >= opts.accept_match_score:
                    accepted.append((a, ia, b, ib,
                                     np_se3.normalize_rotation(Ts[k]),
                                     float(scores[k])))

        # ---- joint pose graph ----
        offs = self._offsets()
        g = PoseGraph()
        poses = []
        for t in self.trajectories:
            for s in t:
                g.add_node()
                poses.append(s.global_pose)
        # intra-trajectory chains (match_transform_to_next)
        for ti, t in enumerate(self.trajectories):
            for s in t:
                if s.match_transform_to_next is None or s.id + 1 >= len(t):
                    continue
                g.add_between(offs[ti] + s.id, offs[ti] + s.id + 1,
                              s.match_transform_to_next,
                              (0.1, 0.1, 0.1, 0.05, 0.05, 0.05))
        # cross edges
        for (a, ia, b, ib, T, score) in accepted:
            g.add_between(offs[a] + ia, offs[b] + ib, T,
                          (0.05, 0.05, 0.05, 0.02, 0.02, 0.02))
        # anchor every non-base trajectory only through cross edges; the
        # base trajectory is gauge-fixed by the solver's node-0 prior
        out = g.optimize(np.stack(poses),
                         num_iters=opts.num_solver_iters)
        k = 0
        for t in self.trajectories:
            for s in t:
                s.global_pose = out[k]
                s.update_inner_frame_poses()
                k += 1
        return len(accepted)

    # ---------------------------------------------------------- export --
    def save(self, out_dir: str,
             pkg_options: MapPackageOptions = None) -> None:
        """One package per trajectory, in the merged frame."""
        import os
        for t in self.trajectories:
            save_trajectory(t, os.path.join(out_dir, f"trajectory_{t.id}"),
                            pkg_options or MapPackageOptions())
