"""Multi-device tests for the batched/sharded pair-registration layer
(parallel/align_pairs.py). Runs on the 8 virtual CPU devices provisioned in
conftest.py — the same code path drives real TPU meshes.

Reference behavior being re-expressed: thread-pool submap-pair matches
(builder/map_builder.cc:705-709) and tbb::task_group loop-closure candidates
(back_end/loop_detector.cc:224-228) become one jitted batched call.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from staticmapping_tpu.common import np_se3
from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.ops.normals import estimate_normals
from staticmapping_tpu.parallel import (align_pairs, align_pairs_sharded,
                                        align_pair_list, make_submap_mesh,
                                        pad_pairs, stack_pairs)


def make_scene(n=2048, seed=0):
    rng = np.random.default_rng(seed)
    per = n // 4
    floor = np.column_stack([rng.uniform(-15, 15, per),
                             rng.uniform(-15, 15, per), np.zeros(per)])
    w1 = np.column_stack([np.full(per, 6.0), rng.uniform(-15, 15, per),
                          rng.uniform(0, 5, per)])
    w2 = np.column_stack([rng.uniform(-15, 15, per), np.full(per, -5.0),
                          rng.uniform(0, 5, per)])
    x = rng.uniform(-15, 15, per)
    roof = np.column_stack([x, rng.uniform(-15, 15, per), 5.0 + 0.25 * x])
    return np.vstack([floor, w1, w2, roof]).astype(np.float32)


def make_pairs(b, seed0=0):
    """b independent (source, target, guess, true_T) problems."""
    sources, targets, guesses, trues = [], [], [], []
    for k in range(b):
        pts = make_scene(seed=seed0 + k)
        rng = np.random.default_rng(100 + k)
        true_T = np_se3.from_rt(
            np_se3.euler_to_matrix(rng.uniform(-0.02, 0.02, 3)),
            rng.uniform(-0.15, 0.15, 3))
        tgt = cloud_lib.from_numpy(pts, capacity=2048)
        targets.append(estimate_normals(tgt, leaf_size=8))
        src_pts = np.asarray(
            (pts - true_T[:3, 3].astype(np.float32))
            @ true_T[:3, :3].astype(np.float32))
        sources.append(cloud_lib.from_numpy(src_pts, capacity=2048))
        guesses.append(np.eye(4))
        trues.append(true_T)
    return sources, targets, guesses, trues


def _check_recovered(Ts, trues, tol=8e-2):
    # tol reflects this config's per-pair ICP precision (2048-pt clouds,
    # leaf-8 normals — verified identical outside vmap); tight per-pair
    # accuracy is covered by tests/test_icp.py
    for T, true_T in zip(Ts, trues):
        err = np.asarray(T, dtype=np.float64) @ np_se3.inverse(true_T) \
            - np.eye(4)
        assert np.abs(err[:3, :]).max() < tol, \
            f"pair failed:\n{T}\nvs\n{true_T}"


def test_align_pairs_vmap_batch():
    sources, targets, guesses, trues = make_pairs(4)
    bs, bt, gs = stack_pairs(sources, targets, guesses)
    Ts, scores = align_pairs(bs, bt, gs, max_iteration=40)
    assert Ts.shape == (4, 4, 4) and scores.shape == (4,)
    _check_recovered(np.asarray(Ts), trues)
    assert (np.asarray(scores) > 0.4).all()


def test_align_pairs_sharded_8_devices():
    assert len(jax.devices()) >= 8, "conftest should provision 8 cpu devices"
    mesh = make_submap_mesh(8)
    sources, targets, guesses, trues = make_pairs(8)
    bs, bt, gs = stack_pairs(sources, targets, guesses)
    Ts, scores, mean_score = align_pairs_sharded(bs, bt, gs, mesh,
                                                 max_iteration=40)
    assert Ts.shape == (8, 4, 4)
    _check_recovered(np.asarray(Ts), trues)
    # sharded result must match the single-device vmap result
    Ts_ref, scores_ref = align_pairs(bs, bt, gs, max_iteration=40)
    np.testing.assert_allclose(np.asarray(Ts), np.asarray(Ts_ref),
                               atol=1e-4)
    # pmean across the mesh equals the global mean
    np.testing.assert_allclose(float(mean_score),
                               float(np.mean(np.asarray(scores))), atol=1e-5)


def test_pad_pairs_non_divisible():
    sources, targets, guesses, trues = make_pairs(3)
    bs, bt, gs = stack_pairs(sources, targets, guesses)
    bs2, bt2, gs2, real = pad_pairs(bs, bt, gs, 8)
    assert real == 3
    assert gs2.shape[0] == 8
    assert bs2.xyz.shape[0] == 8
    # padding repeats the last pair
    np.testing.assert_array_equal(np.asarray(bs2.xyz[3]),
                                  np.asarray(bs2.xyz[2]))


def test_align_pair_list_sharded_end_to_end():
    mesh = make_submap_mesh(8)
    sources, targets, guesses, trues = make_pairs(5, seed0=20)
    Ts, scores = align_pair_list(sources, targets, guesses, mesh=mesh,
                                 max_iteration=40)
    assert len(Ts) == 5 and len(scores) == 5
    _check_recovered(Ts, trues)
    assert all(s > 0.4 for s in scores)
