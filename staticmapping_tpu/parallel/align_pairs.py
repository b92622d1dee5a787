"""Batched / sharded pair registration — the distributed execution layer.

The reference parallelizes independent registrations with threads:
submap-pair matches go through a 6-worker thread pool
(builder/map_builder.cc:705-709) and loop-closure candidates through a
``tbb::task_group`` (back_end/loop_detector.cc:224-228).  On TPU the same
independence becomes *batch* parallelism: N (source, target, guess) problems
are stacked along a leading axis and solved by ONE jitted program —
``vmap`` over the batch on a single chip, ``shard_map`` over a ``Mesh``
axis when multiple devices are available (SURVEY §2.9 P2/P6, §5.8).

Two entry points:

* :func:`align_pairs` — vmapped point-to-plane ICP over stacked clouds.
* :func:`align_pairs_sharded` — the same, with the batch axis sharded over a
  mesh axis; per-device vmap inside ``shard_map``, ``pmean`` for the global
  score summary so every device agrees on acceptance bookkeeping.

Host-side helpers :func:`stack_pairs` / :func:`pad_pairs` build the batched
pytrees from per-pair ``PointCloud`` / ``NormalCloud`` objects (padding the
batch up to a multiple of the mesh size).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.cloud import PointCloud, NormalCloud
from ..registration.icp_fast import align_point_to_plane


@jax.jit
def _stack_clouds(sources, targets):
    """Per-leaf stacking fused into ONE dispatch (eager jnp.stack per leaf
    costs a remote-tunnel round trip each)."""
    return (jax.tree.map(lambda *xs: jnp.stack(xs), *sources),
            jax.tree.map(lambda *xs: jnp.stack(xs), *targets))


def stack_pairs(sources: Sequence[PointCloud],
                targets: Sequence[NormalCloud],
                guesses: Sequence[np.ndarray]):
    """Stack per-pair problems along a new leading batch axis.

    All sources must share a capacity, all targets must share a capacity.
    Returns ``(batch_src, batch_tgt, batch_guess [B,4,4])``.
    """
    assert len(sources) == len(targets) == len(guesses) > 0
    batch_src, batch_tgt = _stack_clouds(tuple(sources), tuple(targets))
    gs = jnp.asarray(np.stack([np.asarray(g) for g in guesses]),
                     dtype=jnp.float32)
    return batch_src, batch_tgt, gs


def pad_pairs(batch_src: PointCloud, batch_tgt: NormalCloud,
              guesses: jax.Array, multiple: int):
    """Pad the batch axis up to a multiple of ``multiple`` (device count)
    by repeating the last pair; returns (src, tgt, guesses, real_count)."""
    b = guesses.shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return batch_src, batch_tgt, guesses, b

    def rep(x):
        return jnp.concatenate(
            [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)

    return (jax.tree.map(rep, batch_src), jax.tree.map(rep, batch_tgt),
            rep(guesses), b)


@partial(jax.jit, static_argnames=("max_iteration", "exact_quantile",
                                   "fixed_iterations", "score_spacing_ref"))
def align_pairs(batch_src: PointCloud, batch_tgt: NormalCloud,
                guesses: jax.Array, dist_outlier_ratio: float = 0.7,
                max_iteration: int = 100, exact_quantile: bool = False,
                fixed_iterations: int = 0, score_spacing_ref: float = 0.0):
    """Register B independent pairs in one vmapped call.

    Args:
      batch_src: ``PointCloud`` with leading batch dim ``[B, N, ...]``.
      batch_tgt: ``NormalCloud`` with leading batch dim ``[B, M, ...]``.
      guesses: ``[B, 4, 4]`` initial transforms.
      fixed_iterations: > 0 uses the fixed-trip ICP scan (converged pairs
        freeze) instead of the vmapped while-loop, which would run EVERY
        pair to the slowest pair's iteration count.
    Returns:
      ``(T [B, 4, 4], scores [B])``.
    """
    def one(s, t, g):
        return align_point_to_plane(
            s, t, g, dist_outlier_ratio=dist_outlier_ratio,
            max_iteration=max_iteration, exact_quantile=exact_quantile,
            fixed_iterations=fixed_iterations,
            score_spacing_ref=score_spacing_ref)

    return jax.vmap(one)(batch_src, batch_tgt, guesses)


def make_submap_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the submap/pair axis (SURVEY §5.8: intra-slice ICI)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("submaps",))


def align_pairs_sharded(batch_src: PointCloud, batch_tgt: NormalCloud,
                        guesses: jax.Array, mesh: Mesh,
                        dist_outlier_ratio: float = 0.7,
                        max_iteration: int = 100,
                        exact_quantile: bool = False,
                        already_sharded: bool = False,
                        fixed_iterations: int = 0,
                        score_spacing_ref: float = 0.0):
    """Shard the pair batch over ``mesh`` axis "submaps" and register all
    pairs in one jitted step.

    The batch size must be divisible by the mesh size (use
    :func:`pad_pairs`).  Returns ``(T [B,4,4], scores [B], mean_score)``
    where ``mean_score`` is the ``pmean``-reduced global average — the
    cross-device collective that stands in for the reference's shared
    accept/reject bookkeeping.
    """
    n_dev = mesh.devices.size
    b = guesses.shape[0]
    assert b % n_dev == 0, f"batch {b} not divisible by mesh size {n_dev}"

    def per_shard(s, t, g):
        def one(si, ti, gi):
            return align_point_to_plane(
                si, ti, gi, dist_outlier_ratio=dist_outlier_ratio,
                max_iteration=max_iteration, exact_quantile=exact_quantile,
                fixed_iterations=fixed_iterations,
                score_spacing_ref=score_spacing_ref)

        Ts, scores = jax.vmap(one)(s, t, g)
        mean_score = jax.lax.pmean(jnp.mean(scores), axis_name="submaps")
        return Ts, scores, mean_score

    spec = P("submaps")
    fn = jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, spec, P()), check_vma=False))

    if not already_sharded:
        # single-process path: place the host batch onto the mesh here.
        # Multi-host callers (parallel/multihost.py) build global arrays
        # from per-process shards instead and skip this device_put.
        sharding = NamedSharding(mesh, spec)
        batch_src = jax.device_put(batch_src, sharding)
        batch_tgt = jax.device_put(batch_tgt, sharding)
        guesses = jax.device_put(guesses, sharding)
    return fn(batch_src, batch_tgt, guesses)


def align_pair_list(sources: Sequence[PointCloud],
                    targets: Sequence[NormalCloud],
                    guesses: Sequence[np.ndarray],
                    mesh: Optional[Mesh] = None,
                    dist_outlier_ratio: float = 0.7,
                    max_iteration: int = 100,
                    exact_quantile: bool = False,
                    pad_to: Optional[int] = None,
                    fixed_iterations: int = 0,
                    score_spacing_ref: float = 0.0
                    ) -> Tuple[List[np.ndarray], List[float]]:
    """Convenience host API: list of pairs in → host transforms/scores out.

    Uses the sharded path when ``mesh`` spans >1 device, plain vmap
    otherwise.  This is what the loop detector and submap-pair matcher call.

    ``pad_to`` rounds the batch axis up to a multiple of that value by
    repeating the last pair, so callers with a varying pair count (loop
    candidates arrive 1..K at a time) hit ONE compiled shape instead of
    one compile per distinct batch size — each such compile is tens of
    seconds through the remote-TPU tunnel.
    """
    real = len(guesses)
    # pad by repeating the last pair BEFORE stacking — list repetition is
    # free, while padding stacked device arrays (pad_pairs) costs eager
    # concat dispatches
    if mesh is not None and mesh.devices.size > 1:
        # honour pad_to on meshes too (fixed batch shape = no recompiles),
        # rounded up so the shard axis still divides evenly
        d = mesh.devices.size
        multiple = d if pad_to is None else -(-pad_to // d) * d
    else:
        multiple = pad_to
    if multiple is not None and multiple > 1:
        pad = (-real) % multiple
        if pad:
            sources = list(sources) + [sources[-1]] * pad
            targets = list(targets) + [targets[-1]] * pad
            guesses = list(guesses) + [guesses[-1]] * pad
    batch_src, batch_tgt, gs = stack_pairs(sources, targets, guesses)
    if mesh is not None and mesh.devices.size > 1:
        Ts, scores, _ = align_pairs_sharded(
            batch_src, batch_tgt, gs, mesh,
            dist_outlier_ratio=dist_outlier_ratio,
            max_iteration=max_iteration, exact_quantile=exact_quantile,
            fixed_iterations=fixed_iterations,
            score_spacing_ref=score_spacing_ref)
    else:
        Ts, scores = align_pairs(
            batch_src, batch_tgt, gs,
            dist_outlier_ratio=dist_outlier_ratio,
            max_iteration=max_iteration, exact_quantile=exact_quantile,
            fixed_iterations=fixed_iterations,
            score_spacing_ref=score_spacing_ref)
    Ts = np.asarray(Ts, dtype=np.float64)[:real]
    scores = np.asarray(scores, dtype=np.float64)[:real]
    return [T for T in Ts], [float(s) for s in scores]
