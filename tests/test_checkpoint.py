"""Run-state checkpoint/resume (builder/checkpoint.py)."""
import numpy as np

from staticmapping_tpu.backend.loop_detector import LoopDetectorSettings
from staticmapping_tpu.backend.optimizer import (IncrementalOptimizer,
                                                 OptimizerOptions)
from staticmapping_tpu.builder.checkpoint import (load_checkpoint,
                                                  save_checkpoint)
from staticmapping_tpu.builder.frame import SubmapOptions
from staticmapping_tpu.builder.frontend import FrontEndOptions
from staticmapping_tpu.builder.map_builder import MapBuilder, MapBuilderOptions
from staticmapping_tpu.io import synthetic


def _opts():
    return MapBuilderOptions(
        front_end=FrontEndOptions(scan_capacity=8192, nn_tile=512,
                                  max_iteration=40,
                                  motion_compensation=False,
                                  use_average=False, target_leaf_size=4),
        submap=SubmapOptions(frame_count=2),
        submap_capacity=16384,
        submap_matcher_leaf_size=4,
        output_kitti_pose=False, output_mrvm=False,
        output_direct_combined_map=False,
    )


def _backend():
    return IncrementalOptimizer(
        OptimizerOptions(),
        loop_settings=LoopDetectorSettings(
            loop_ignore_threshold=50, use_descriptor=False))


def test_checkpoint_resume_continues_run(tmp_path):
    scans, gt = synthetic.make_sequence(
        n_scans=16, seed=5, trajectory="straight", step=1.0,
        max_points=6000, max_range=70.0)

    # full run for reference
    mb_full = MapBuilder(_opts(), backend=_backend())
    for i, pts in enumerate(scans):
        mb_full.insert_pointcloud(i * 0.1, pts)

    # half run → checkpoint → resume → second half
    mb_a = MapBuilder(_opts(), backend=_backend())
    for i, pts in enumerate(scans[:8]):
        mb_a.insert_pointcloud(i * 0.1, pts)
    n_submaps_a = len([s for s in mb_a.trajectory if s.full])
    n_factors_a = len(mb_a.backend.graph.factors)
    save_checkpoint(mb_a, str(tmp_path / "ckpt"))

    mb_b = load_checkpoint(str(tmp_path / "ckpt"),
                           map_builder_options=_opts(),
                           backend=_backend())
    assert len(mb_b.trajectory) == n_submaps_a
    assert mb_b.backend.graph.num_nodes == n_submaps_a
    assert len(mb_b.backend.graph.factors) == n_factors_a
    assert len(mb_b.backend.loop_detector.frames) == n_submaps_a

    # resume: replay the dropped partial submap's scans + the rest.
    # resync the front end's first scan (target rebuild) like a stale-scan
    # recovery, then continue
    for i, pts in enumerate(scans[8:]):
        mb_b.insert_pointcloud((8 + i) * 0.1, pts)

    # same submap count as the uninterrupted run and consistent poses
    full_ids = [s.id for s in mb_full.trajectory if s.full]
    res_ids = [s.id for s in mb_b.trajectory if s.full]
    assert len(res_ids) >= len(full_ids) - 1
    # the resumed trajectory's overlap region matches the full run's
    # poses at drift tolerance
    for k in range(min(len(mb_full.trajectory), len(mb_b.trajectory))):
        a = mb_full.trajectory[k].global_pose[:3, 3]
        b = mb_b.trajectory[k].global_pose[:3, 3]
        assert np.linalg.norm(a - b) < 0.8, (k, a, b)


def test_checkpoint_preserves_factor_payloads(tmp_path):
    mb = MapBuilder(_opts(), backend=_backend())
    scans, _ = synthetic.make_sequence(
        n_scans=8, seed=6, trajectory="straight", step=1.0,
        max_points=6000, max_range=70.0)
    for i, pts in enumerate(scans):
        mb.insert_pointcloud(i * 0.1, pts)
    g = mb.backend.graph
    save_checkpoint(mb, str(tmp_path / "c2"))
    mb2 = load_checkpoint(str(tmp_path / "c2"),
                          map_builder_options=_opts(),
                          backend=_backend())
    g2 = mb2.backend.graph
    assert len(g2.factors) == len(g.factors)
    for k in range(len(g.factors)):
        assert g2.factors.i[k] == g.factors.i[k]
        assert np.allclose(g2.factors.T_meas[k], g.factors.T_meas[k])
        assert np.allclose(g2.factors.sigmas[k], g.factors.sigmas[k])
