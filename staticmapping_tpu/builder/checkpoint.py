"""Run-state checkpoint/resume — preemption recovery.

The reference serializes submap clouds and a map.xml descriptor but has no
mid-run optimizer resume (SURVEY §5.4).  On TPU pods preemption is
routine, so this is first-class here: a checkpoint captures

  * the trajectory (map package: per-submap poses, inter-submap
    transforms, clouds — builder/map_package.py),
  * the pose-graph factors (between/GPS/odom/prior batches + special
    node values + GPS two-stage init state — backend/optimizer.py),
  * the loop-detector state machine (status, counters),
  * the front-end state (target keyframe cloud + normals, pose_target,
    accumulative/base pose, scores).

``save_checkpoint(map_builder, dir)`` → files; ``load_checkpoint(dir,
options…)`` → a MapBuilder that continues exactly where the run stopped
(modulo a partially-filled submap, which is dropped — its scans replay).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..common import np_se3
from .map_package import (MapPackageOptions, load_trajectory,
                          save_trajectory)


def save_checkpoint(mb, out_dir: str) -> str:
    """Serialize a MapBuilder mid-run.  Returns the checkpoint dir."""
    os.makedirs(out_dir, exist_ok=True)
    # settle deferred P2 state (queued merges / in-flight pair matches) so
    # the snapshot is consistent
    if hasattr(mb, "_flush_pair_matches"):
        mb._flush_pair_matches(drain=True)
    # ---- trajectory (full submaps only) ----
    full = [s for s in mb.trajectory if s.full]
    from .frame import Trajectory
    t = Trajectory(mb.trajectory.id)
    for s in full:
        t.append(s)
    save_trajectory(t, os.path.join(out_dir, "trajectory"),
                    MapPackageOptions())

    meta = {
        "next_submap_id": mb._next_submap_id,
        "num_full_submaps": len(full),
        "use_gps": mb.options.use_gps,
        "use_odom": mb.options.use_odom,
    }

    # ---- front end ----
    fe = mb.front_end
    fe_state = {}
    if hasattr(fe, "pose_target"):          # sequential FrontEnd
        fe_state["kind"] = "sequential"
        fe_state["pose_target"] = np.asarray(fe.pose_target).tolist()
        fe_state["accumulative"] = np.asarray(fe.accumulative).tolist()
        fe_state["last_score"] = fe.last_score
        fe_state["num_scans"] = fe.num_scans
        fe_state["got_first"] = fe.got_first
        if fe.target is not None and hasattr(fe.target, "xyz"):
            np.savez_compressed(
                os.path.join(out_dir, "frontend_target.npz"),
                xyz=np.asarray(fe.target.xyz),
                normals=np.asarray(fe.target.normals),
                mask=np.asarray(fe.target.mask))
    else:                                    # DeviceFrontEnd
        fe_state["kind"] = "pipelined"
        fe_state["base"] = np.asarray(fe.base).tolist()
        fe_state["num_scans"] = fe.num_scans
        fe_state["last_score"] = fe.last_score
    meta["front_end"] = fe_state

    # ---- backend / pose graph ----
    be = mb.backend
    if be is not None:
        g = be.graph
        np.savez_compressed(
            os.path.join(out_dir, "pose_graph.npz"),
            between_i=np.asarray(g.factors.i, dtype=np.int64),
            between_j=np.asarray(g.factors.j, dtype=np.int64),
            between_T=(np.stack(g.factors.T_meas)
                       if g.factors.T_meas else np.zeros((0, 4, 4))),
            between_s=(np.stack(g.factors.sigmas)
                       if g.factors.sigmas else np.zeros((0, 6))),
            gps_i=np.asarray(g.gps_factors.i, dtype=np.int64),
            gps_enu=(np.stack(g.gps_factors.enu)
                     if g.gps_factors.enu else np.zeros((0, 3))),
            gps_ptg=(np.stack(g.gps_factors.p_tg)
                     if g.gps_factors.p_tg else np.zeros((0, 3))),
            gps_s=(np.stack(g.gps_factors.sigmas)
                   if g.gps_factors.sigmas else np.zeros((0, 3))),
            gps_ue=np.asarray(g.gps_factors.use_err, dtype=bool),
            odom_i=np.asarray(g.odom_factors.i, dtype=np.int64),
            odom_T=(np.stack(g.odom_factors.T_odom)
                    if g.odom_factors.T_odom else np.zeros((0, 4, 4))),
            odom_s=(np.stack(g.odom_factors.sigmas)
                    if g.odom_factors.sigmas else np.zeros((0, 6))),
            prior_i=np.asarray(g.prior_factors.i, dtype=np.int64),
            prior_T=(np.stack(g.prior_factors.T_prior)
                     if g.prior_factors.T_prior else np.zeros((0, 4, 4))),
            prior_s=(np.stack(g.prior_factors.sigmas)
                     if g.prior_factors.sigmas else np.zeros((0, 6))),
            special=np.stack(g.special_values),
        )
        meta["backend"] = {
            "num_nodes": g.num_nodes,
            "loop_edge_count": be.loop_edge_count,
            "loop_status": int(be.loop_detector.status.value)
            if hasattr(be.loop_detector.status, "value")
            else str(be.loop_detector.status),
            "accumulate_count": getattr(be.loop_detector,
                                        "accumulate_count", 0),
            "calculated_first_gps_coord": be._calculated_first_gps_coord,
            "cached_enu": {str(k): v.tolist()
                           for k, v in be._cached_enu.items()},
            "odom_calib_prior_added": be._odom_calib_prior_added,
            "tf_odom_lidar": be.tf_odom_lidar.tolist(),
            "tf_tracking_gps": be.tf_tracking_gps.tolist(),
        }

    with open(os.path.join(out_dir, "checkpoint.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


def load_checkpoint(ckpt_dir: str, map_builder_options=None,
                    backend: Optional[object] = None,
                    filter_chain=None):
    """Rebuild a MapBuilder from :func:`save_checkpoint` output.  Pass a
    fresh backend (IncrementalOptimizer) when the run used one."""
    from .frame import Submap
    from .map_builder import MapBuilder, MapBuilderOptions

    with open(os.path.join(ckpt_dir, "checkpoint.json")) as f:
        meta = json.load(f)

    options = map_builder_options or MapBuilderOptions()
    mb = MapBuilder(options, filter_chain=filter_chain, backend=backend)
    traj = load_trajectory(os.path.join(ckpt_dir, "trajectory"),
                           MapPackageOptions(),
                           submap_options=options.submap,
                           capacity=options.submap_capacity)
    for s in traj:
        mb.trajectory.append(s)
    mb._next_submap_id = meta["next_submap_id"]
    mb._current_submap = None       # partial submap dropped (documented)

    fe_state = meta["front_end"]
    fe = mb.front_end
    if fe_state["kind"] == "sequential" and hasattr(fe, "pose_target"):
        fe.pose_target = np.asarray(fe_state["pose_target"])
        fe.accumulative = np.asarray(fe_state["accumulative"])
        fe.last_score = fe_state["last_score"]
        fe.num_scans = fe_state["num_scans"]
        fe.got_first = fe_state["got_first"]
        tpath = os.path.join(ckpt_dir, "frontend_target.npz")
        if os.path.exists(tpath):
            from ..data.cloud import NormalCloud
            with np.load(tpath) as z:
                fe.target = NormalCloud(
                    xyz=jnp.asarray(z["xyz"]),
                    normals=jnp.asarray(z["normals"]),
                    mask=jnp.asarray(z["mask"]))
            fe.extrapolator.add_pose(
                0.0, np.asarray(fe_state["pose_target"]))
    elif fe_state["kind"] == "pipelined" and hasattr(fe, "base"):
        fe.base = np.asarray(fe_state["base"])
        fe.num_scans = fe_state["num_scans"]
        fe.last_score = fe_state["last_score"]

    be = mb.backend
    if be is not None and "backend" in meta:
        bm = meta["backend"]
        g = be.graph
        with np.load(os.path.join(ckpt_dir, "pose_graph.npz")) as z:
            for k in range(len(z["between_i"])):
                g.factors.add(int(z["between_i"][k]),
                              int(z["between_j"][k]),
                              z["between_T"][k], z["between_s"][k])
            for k in range(len(z["gps_i"])):
                g.gps_factors.add(int(z["gps_i"][k]), z["gps_enu"][k],
                                  z["gps_ptg"][k], z["gps_s"][k],
                                  bool(z["gps_ue"][k]))
            for k in range(len(z["odom_i"])):
                g.odom_factors.add(int(z["odom_i"][k]), z["odom_T"][k],
                                   z["odom_s"][k])
            for k in range(len(z["prior_i"])):
                g.prior_factors.i.append(int(z["prior_i"][k]))
                g.prior_factors.T_prior.append(z["prior_T"][k])
                g.prior_factors.sigmas.append(z["prior_s"][k])
            g.special_values = [z["special"][k] for k in range(3)]
        g.num_nodes = bm["num_nodes"]
        be.loop_edge_count = bm["loop_edge_count"]
        be._calculated_first_gps_coord = bm["calculated_first_gps_coord"]
        be._cached_enu = {int(k): np.asarray(v)
                          for k, v in bm["cached_enu"].items()}
        be._odom_calib_prior_added = bm["odom_calib_prior_added"]
        be.tf_odom_lidar = np.asarray(bm["tf_odom_lidar"])
        be.tf_tracking_gps = np.asarray(bm["tf_tracking_gps"])
        # loop detector frames mirror the trajectory
        be.loop_detector.frames = list(mb.trajectory.submaps)
        try:
            from ..backend.loop_detector import LoopStatus
            be.loop_detector.status = LoopStatus(bm["loop_status"])
        except Exception:
            pass
        be.loop_detector.accumulate_count = bm.get("accumulate_count", 0)
        # the view graph is rebuilt from the reloaded trajectory
        for s in mb.trajectory:
            be.view_graph.add_vertex(s.id, s.global_pose)
    return mb
