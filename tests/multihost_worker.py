"""Worker process for tests/test_multihost.py — NOT a test module.

Each of 2 processes owns 4 virtual CPU devices; the global mesh spans all
8.  Both multi-host entry points (parallel/multihost.py) are exercised
against the full single-process result, which every worker can also
compute locally because the problem construction is deterministic:

  stage A: 8 registration pairs, processes hold 4 each →
           align_pairs_multihost vs align_pairs (plain vmap).
  stage B: 64-node pose graph, between factors split in half →
           solve_pose_graph_multihost vs gauss_newton_pcg.

Prints ``MH_OK pid=<n>`` if both agree.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4"
                           ).strip()

import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends
    clear_backends()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> int:
    pid = int(sys.argv[1])
    port = sys.argv[2]

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from staticmapping_tpu.parallel import multihost
    from staticmapping_tpu.common import np_se3

    multihost.initialize(f"localhost:{port}", num_processes=2,
                         process_id=pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4
    mesh = multihost.global_mesh()

    # ---------------- stage A: sharded batched registration ----------
    from __graft_entry__ import _example_pair
    from staticmapping_tpu.parallel.align_pairs import (align_pairs,
                                                        stack_pairs)

    B = 8
    rng = np.random.default_rng(3)
    srcs, tgts, gts = [], [], []
    for i in range(B):
        s, t = _example_pair(capacity=1024, target_capacity=256, seed=i)
        T = np_se3.from_rt(np_se3.euler_to_matrix(
            rng.uniform(-0.02, 0.02, 3)), rng.uniform(-0.2, 0.2, 3))
        srcs.append(s.transform(jnp.asarray(np_se3.inverse(T),
                                            dtype=jnp.float32)))
        tgts.append(t)
        gts.append(T)
    full_src, full_tgt, full_gs = stack_pairs(srcs, tgts, [np.eye(4)] * B)

    # single-process reference (every worker computes the same one)
    Ts_ref, scores_ref = jax.block_until_ready(align_pairs(
        full_src, full_tgt, full_gs, max_iteration=15))
    Ts_ref = np.asarray(Ts_ref)
    scores_ref = np.asarray(scores_ref)

    # local shard: contiguous half (matches P("submaps") layout)
    lo, hi = pid * (B // 2), (pid + 1) * (B // 2)
    loc = slice(lo, hi)
    local_src = jax.tree.map(lambda x: np.asarray(x)[loc], full_src)
    local_tgt = jax.tree.map(lambda x: np.asarray(x)[loc], full_tgt)
    Ts_l, scores_l, mean_score = multihost.align_pairs_multihost(
        local_src, local_tgt, np.asarray(full_gs)[loc], mesh,
        max_iteration=15)
    a_diff = float(np.max(np.abs(Ts_l - Ts_ref[loc])))
    s_diff = float(np.max(np.abs(scores_l - scores_ref[loc])))
    assert a_diff < 1e-3, f"align Ts diff {a_diff}"
    assert s_diff < 1e-3, f"align score diff {s_diff}"
    assert abs(mean_score - float(np.mean(scores_ref))) < 1e-3

    # ---------------- stage B: sharded pose-graph solve --------------
    from staticmapping_tpu.backend.pose_graph import PoseGraph
    from staticmapping_tpu.backend.pose_graph_sparse import gauss_newton_pcg

    n = 64
    g = PoseGraph()
    gt = [np.eye(4)]
    step = np.eye(4)
    step[0, 3] = 1.0
    for _ in range(n - 1):
        gt.append(np_se3.normalize_rotation(gt[-1] @ step))
    for _ in range(n):
        g.add_node()
    odom = [gt[0]]
    rng2 = np.random.default_rng(5)
    for k in range(n - 1):
        rel = np_se3.inverse(gt[k]) @ gt[k + 1]
        nr = rel.copy()
        nr[:3, 3] += rng2.normal(0, 0.02, 3)
        g.add_between(k, k + 1, nr)
        odom.append(np_se3.normalize_rotation(odom[-1] @ nr))
    for k in range(16, n, 8):
        g.add_between(k, k - 16, np_se3.inverse(gt[k]) @ gt[k - 16],
                      sigmas=(0.05,) * 3 + (0.02,) * 3)

    args, ncap, sp_base = g.solver_args(np.stack(odom))
    # single-process reference
    ref_poses, ref_chi2, _ = jax.block_until_ready(
        gauss_newton_pcg(*args, num_iters=4))
    ref_poses = np.asarray(ref_poses)

    fcap = int(args[2].shape[0])
    assert fcap % 8 == 0, fcap
    half = fcap // 2
    fs = slice(pid * half, (pid + 1) * half)
    between_local = tuple(np.asarray(a)[fs] for a in args[2:7])
    factor_args = between_local + tuple(args[7:])
    out_poses, chi2, _ = multihost.solve_pose_graph_multihost(
        mesh, np.asarray(args[0]), np.asarray(args[1]), factor_args,
        num_iters=4)
    p_diff = float(np.max(np.abs(out_poses - ref_poses)))
    assert p_diff < 1e-3, f"pose diff {p_diff}"
    assert abs(chi2 - float(ref_chi2)) < 1e-2 * max(1.0, float(ref_chi2))

    # ------------- stage C: MapBuilder-level distributed slice -------
    # (VERDICT r04 #10) Each process builds submaps from ITS half of a
    # split trajectory through the full MapBuilder (front end → submaps →
    # pair matches), exchanges only the boundary submap + per-half factor
    # lists over the wire (jax.experimental.multihost_utils
    # .process_allgather — the standard multihost host-data exchange),
    # registers the halves together, and the merged pose graph is solved
    # SHARDED over the global mesh.  The result must equal the
    # single-process merge, which each worker also computes locally
    # (deterministic world).
    from jax.experimental import multihost_utils as mhu
    from staticmapping_tpu.builder.frame import SubmapOptions
    from staticmapping_tpu.builder.frontend import FrontEndOptions
    from staticmapping_tpu.builder.map_builder import (MapBuilder,
                                                       MapBuilderOptions)
    from staticmapping_tpu.io import synthetic
    from staticmapping_tpu.data import cloud as cloud_lib
    from staticmapping_tpu.builder.frontend import _target_normals
    from staticmapping_tpu.registration.icp_fast import align_point_to_plane

    scans, gtp = synthetic.make_sequence(
        n_scans=22, seed=13, trajectory="straight", step=1.0,
        max_points=4000, max_range=60.0)
    halves = (list(range(0, 12)), list(range(10, 22)))

    def build_half(idx):
        opts = MapBuilderOptions(
            front_end=FrontEndOptions(scan_capacity=4096, nn_tile=512,
                                      max_iteration=30, target_leaf_size=4,
                                      motion_compensation=False,
                                      use_average=False),
            submap=SubmapOptions(frame_count=2),
            submap_capacity=8192, pair_match_batch=2,
            submap_matcher_leaf_size=4)
        mb = MapBuilder(opts)
        for k, i in enumerate(idx):
            mb.insert_pointcloud(k * 0.1, scans[i])
        mb._flush_pair_matches(drain=True)
        return mb

    mine = build_half(halves[pid])

    def boundary_export(mb, first: bool):
        s = mb.trajectory[0 if first else len(mb.trajectory) - 1]
        pts = np.zeros((4096, 3), dtype=np.float32)
        xyz = np.asarray(s.cloud.xyz)[np.asarray(s.cloud.mask)][:4096]
        pts[:len(xyz)] = xyz
        return pts, np.float32(len(xyz)), \
            np.asarray(s.global_pose, dtype=np.float32)

    # p0 exports its LAST submap, p1 its FIRST (the overlap region)
    pts, n_pts, pose = boundary_export(mine, first=(pid == 1))
    all_pts = np.asarray(mhu.process_allgather(pts))        # [2, 4096, 3]
    all_n = np.asarray(mhu.process_allgather(n_pts))
    all_pose = np.asarray(mhu.process_allgather(pose))

    # per-half odometry factors (submap match_transform_to_next)
    rels = np.stack([np.asarray(s.match_transform_to_next,
                                dtype=np.float32)
                     for s in mine.trajectory[:-1]])
    all_rels = np.asarray(mhu.process_allgather(rels))      # [2, S-1, 4, 4]

    def register_boundary(apts, an):
        tgt = cloud_lib.from_numpy(apts[0][:int(an[0])], capacity=4096)
        src = cloud_lib.from_numpy(apts[1][:int(an[1])], capacity=4096)
        T, _ = align_point_to_plane(
            src, _target_normals(tgt, leaf_size=4),
            jnp.eye(4, dtype=jnp.float32), max_iteration=40, tile=512)
        return np.asarray(T, dtype=np.float64)

    T_cross = register_boundary(all_pts, all_n)   # p1-first in p0-last frame

    # merged graph: nodes = p0 submaps ++ p1 submaps
    from staticmapping_tpu.backend.pose_graph import PoseGraph
    s0 = all_rels[0].shape[0] + 1
    s1 = all_rels[1].shape[0] + 1

    def build_graph():
        g = PoseGraph()
        for _ in range(s0 + s1):
            g.add_node()
        for k in range(s0 - 1):
            g.add_between(k, k + 1, all_rels[0][k].astype(np.float64))
        g.add_between(s0 - 1, s0, T_cross)
        for k in range(s1 - 1):
            g.add_between(s0 + k, s0 + k + 1,
                          all_rels[1][k].astype(np.float64))
        # initial poses: p0 odometry, then p1 hung off the cross factor
        init = [np.eye(4)]
        for k in range(s0 - 1):
            init.append(np_se3.normalize_rotation(
                init[-1] @ all_rels[0][k].astype(np.float64)))
        init.append(np_se3.normalize_rotation(init[-1] @ T_cross))
        for k in range(s1 - 1):
            init.append(np_se3.normalize_rotation(
                init[-1] @ all_rels[1][k].astype(np.float64)))
        return g, np.stack(init)

    g, init = build_graph()
    gargs, _, _ = g.solver_args(init)
    # single-process reference solve (deterministic on every worker)
    ref_p, ref_c, _ = jax.block_until_ready(
        gauss_newton_pcg(*gargs, num_iters=4))
    ref_p = np.asarray(ref_p)
    # sharded solve: each process contributes its half of the factors
    fcap2 = int(gargs[2].shape[0])
    assert fcap2 % 8 == 0, fcap2
    h2 = fcap2 // 2
    fs2 = slice(pid * h2, (pid + 1) * h2)
    fl2 = tuple(np.asarray(a)[fs2] for a in gargs[2:7]) + tuple(gargs[7:])
    mh_p, mh_c, _ = multihost.solve_pose_graph_multihost(
        mesh, np.asarray(gargs[0]), np.asarray(gargs[1]), fl2, num_iters=4)
    c_diff = float(np.max(np.abs(mh_p - ref_p)))
    assert c_diff < 1e-3, f"stage C pose diff {c_diff}"
    # sanity: merged map spans ~21 m of the straight line (index the last
    # REAL node — the solver pads the node axis)
    span = float(np.linalg.norm(ref_p[s0 + s1 - 1][:3, 3]
                                - ref_p[0][:3, 3]))
    assert 15.0 < span < 27.0, span

    print(f"MH_OK pid={pid} a_diff={a_diff:.2e} p_diff={p_diff:.2e} "
          f"chi2={chi2:.3f} c_diff={c_diff:.2e} span={span:.1f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
