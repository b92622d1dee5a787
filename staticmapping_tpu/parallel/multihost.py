"""Multi-host execution — the DCN seam of the framework (SURVEY §5.8).

The reference is a single process (SURVEY §2.9 P6: no MPI/NCCL anywhere);
its scale ceiling is one machine's cores.  The TPU-native scale-out axis is
a multi-host pod slice: each host process feeds its shard of the
submap-pair / factor work, the mesh spans every chip of every host, and the
same ``shard_map`` programs used single-host (parallel/align_pairs.py,
backend/pose_graph_sparse.py) run unchanged — XLA routes the ``psum``
over ICI within a host slice and DCN across hosts.

Design rules encoded here:
  * DCN appears ONLY at pipeline seams — scan/submap ingestion (each host
    reads its own sensor shard) and the replicated outputs of the global
    reductions (scores, chi², poses).  The inner loops (NN kernels, 6×6
    normal-equation reductions, PCG matvecs) never leave the mesh.
  * Host-local numpy arrays become global sharded arrays with
    ``host_local_array_to_global_array`` — no host ever materializes the
    full batch.
  * Every process runs the SAME program (SPMD); results that must be
    host-visible are fetched back as the local shard only.

Verification: ``tests/test_multihost.py`` launches 2 real processes ×
4 virtual CPU devices and asserts both entry points below agree with the
single-process result (BASELINE's ≥2-host scaling-efficiency target needs
real hardware; cross-process *correctness* is what can be proven here).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def initialize(coordinator_address: str, num_processes: int,
               process_id: int,
               local_device_count: Optional[int] = None) -> None:
    """Join the multi-host runtime (jax.distributed).

    Call once per process before any JAX computation.  On TPU pods the
    arguments are auto-detected and may be None; on CPU/GPU test rigs they
    must be passed explicitly.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis_name: str = "submaps") -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.array(jax.devices()), axis_names=(axis_name,))


def _to_global(tree, mesh: Mesh, spec: P):
    """Host-local shard (numpy/jax arrays) → global sharded array."""
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, spec), tree)


def _to_local(tree, mesh: Mesh, spec: P):
    """Global sharded array → this process's local shard (numpy)."""
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda x: np.asarray(
            multihost_utils.global_array_to_host_local_array(x, mesh, spec)),
        tree)


def align_pairs_multihost(local_src, local_tgt, local_guesses,
                          mesh: Mesh,
                          dist_outlier_ratio: float = 0.7,
                          max_iteration: int = 100,
                          exact_quantile: bool = False
                          ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Batched pair registration across processes.

    Each process passes its LOCAL (src, tgt, guess) stack —
    ``[B_local, ...]`` pytrees built with ``align_pairs.stack_pairs`` —
    where ``B_local · num_processes`` must be divisible by the mesh size.
    Returns this process's local ``(Ts, scores)`` shard plus the global
    ``pmean`` score (identical on every process — the cross-host
    collective standing in for the reference's shared accept/reject
    bookkeeping, map_builder.cc:436-444).
    """
    from .align_pairs import align_pairs_sharded
    spec = P(mesh.axis_names[0])
    g_src = _to_global(local_src, mesh, spec)
    g_tgt = _to_global(local_tgt, mesh, spec)
    g_gs = _to_global(local_guesses, mesh, spec)
    Ts, scores, mean_score = align_pairs_sharded(
        g_src, g_tgt, g_gs, mesh,
        dist_outlier_ratio=dist_outlier_ratio,
        max_iteration=max_iteration, exact_quantile=exact_quantile,
        already_sharded=True)
    Ts_l = _to_local(Ts, mesh, spec)
    scores_l = _to_local(scores, mesh, spec)
    return Ts_l, scores_l, float(np.asarray(mean_score))


def solve_pose_graph_multihost(mesh: Mesh, poses, node_mask, factor_args,
                               **solver_kwargs):
    """Distributed pose-graph solve across processes.

    ``factor_args`` is the ``(fi, fj, T_meas, inv_sigmas, fmask, …)``
    tuple of :func:`backend.pose_graph_sparse.solve_sharded`, where the
    between-factor arrays (first five) are each process's LOCAL factor
    shard; everything else (poses, node_mask, small factor types) must be
    identical on every process (replicated).  Returns the optimized poses
    + chi² (replicated, identical on every process).
    """
    from ..backend.pose_graph_sparse import solve_sharded
    spec = P(mesh.axis_names[0])
    between_local = factor_args[:5]
    rest = factor_args[5:]
    between_global = tuple(_to_global(a, mesh, spec) for a in between_local)
    poses_g = _to_global(poses, mesh, P())
    mask_g = _to_global(node_mask, mesh, P())
    rest_g = tuple(
        _to_global(a, mesh, P()) if isinstance(a, (np.ndarray, jnp.ndarray))
        else a for a in rest)
    out_poses, chi2, trace = solve_sharded(
        mesh, poses_g, mask_g, *between_global, *rest_g, **solver_kwargs)
    return (np.asarray(out_poses), float(np.asarray(chi2)),
            jax.tree.map(np.asarray, trace))
