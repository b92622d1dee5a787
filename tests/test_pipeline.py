"""Device-resident chunked front end (builder/pipeline.py) + memory
manager/submap offload (builder/frame.py)."""
import os

import numpy as np
import pytest

from staticmapping_tpu.builder.frame import (MemoryManager, Submap,
                                             SubmapOptions)
from staticmapping_tpu.builder.frontend import FrontEndOptions
from staticmapping_tpu.builder.map_builder import MapBuilder, MapBuilderOptions
from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.io import synthetic


def _build(pipelined, pair_batch=1, chunk=8):
    opts = MapBuilderOptions(
        front_end=FrontEndOptions(scan_capacity=8192, nn_tile=512,
                                  max_iteration=40, motion_compensation=False,
                                  use_average=False, target_leaf_size=4),
        submap=SubmapOptions(frame_count=2),
        submap_capacity=16384,
        submap_matcher_leaf_size=4,
        pipelined=pipelined, pipeline_chunk=chunk,
        pair_match_batch=pair_batch,
    )
    return MapBuilder(opts)


@pytest.fixture(scope="module")
def straight_scans():
    # max_points/max_range chosen like test_frontend_e2e — at 6000 pts /
    # 40 m the far half of this world is too sparse and BOTH front ends
    # degrade; the comparison needs a well-posed scene
    scans, gt = synthetic.make_sequence(
        n_scans=20, seed=5, trajectory="straight", step=1.0,
        max_points=8000, max_range=70.0)
    return scans, gt


def test_pipelined_matches_sequential(straight_scans):
    """The chunked device front end produces the same trajectory as the
    sequential host front end (within f32 chunk-local tolerance)."""
    scans, gt = straight_scans
    mbs = _build(False)
    mbp = _build(True, pair_batch=4)
    for i, pts in enumerate(scans):
        mbs.insert_pointcloud(i * 0.1, pts)
        mbp.insert_pointcloud(i * 0.1, pts)
    for mb in (mbs, mbp):
        mb.options.output_kitti_pose = False
        mb.options.output_mrvm = False
        mb.options.output_direct_combined_map = False
        mb.finish()
    ps, pp = mbs.frame_poses(), mbp.frame_poses()
    assert len(pp) == len(ps)
    # the two front ends use slightly different CTRV guess estimators, so
    # per-scan ICP can settle in marginally different optima; the honest
    # contract is that BOTH track ground truth at odometry accuracy
    gt_t = np.stack([g[:3, 3] - gt[0][:3, 3] for g in gt[:len(ps)]])
    ate_s = np.linalg.norm(
        np.stack([p[:3, 3] for p in ps]) - gt_t, axis=1).mean()
    ate_p = np.linalg.norm(
        np.stack([p[:3, 3] for p in pp]) - gt_t, axis=1).mean()
    assert ate_s < 0.35, ate_s
    assert ate_p < max(2.0 * ate_s, 0.35), (ate_s, ate_p)


def test_pipelined_flush_partial_chunk(straight_scans):
    """A partial chunk at end-of-stream is processed by finish()/flush."""
    scans, _ = straight_scans
    mb = _build(True, chunk=16)   # 19 post-first scans → 1 chunk + partial
    for i, pts in enumerate(scans):
        mb.insert_pointcloud(i * 0.1, pts)
    mb.options.output_kitti_pose = False
    mb.options.output_mrvm = False
    mb.options.output_direct_combined_map = False
    mb.finish()
    # every scan moved 1 m > 0.35 m motion filter → every scan keyframes
    assert len(mb.frame_poses()) == len(scans)


def test_submap_offload_roundtrip(tmp_path):
    """offload → cloud dropped from RAM → transparent reload on access."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    s = Submap(0, SubmapOptions(frame_count=1, enable_disk_saving=True),
               capacity=1024, save_dir=str(tmp_path))
    from staticmapping_tpu.builder.frame import Frame
    s.insert_frame(Frame(stamp=1.0, cloud=cloud_lib.from_numpy(
        pts, capacity=1024), global_pose=np.eye(4)))
    before = cloud_lib.to_numpy(s.cloud)
    s.match_transform_to_next = np.eye(4)
    assert s.offload()
    assert not s.cloud_in_memory
    assert os.path.exists(s._disk_path())
    after = cloud_lib.to_numpy(s.cloud)      # reload-on-access
    assert s.cloud_in_memory
    assert after.shape == before.shape
    assert np.allclose(np.sort(after[:, 0]), np.sort(before[:, 0]),
                       atol=1e-5)


def test_memory_manager_bounds_memory(tmp_path):
    """Only recently-touched submaps stay in RAM after aging."""
    from staticmapping_tpu.builder.frame import Frame, Trajectory
    rng = np.random.default_rng(1)
    traj = Trajectory(0)
    for k in range(6):
        s = Submap(k, SubmapOptions(frame_count=1, enable_disk_saving=True),
                   capacity=512, save_dir=str(tmp_path))
        s.insert_frame(Frame(
            stamp=float(k),
            cloud=cloud_lib.from_numpy(
                rng.uniform(-5, 5, (100, 3)).astype(np.float32),
                capacity=512),
            global_pose=np.eye(4)))
        s.match_transform_to_next = np.eye(4)
        traj.append(s)
    mm = MemoryManager(traj, delay_seconds=1.0, keep_last=2)
    mm.tick(0.0)
    n_off = mm.tick(2.0)       # everything (except keep_last) aged past 1 s
    assert n_off == 4
    assert sum(s.cloud_in_memory for s in traj) == 2
    # access an offloaded one → reloads
    assert traj[0].cloud is not None
    assert traj[0].cloud_in_memory
