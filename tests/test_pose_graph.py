import numpy as np

from staticmapping_tpu.backend.pose_graph import PoseGraph
from staticmapping_tpu.common import np_se3


def make_noisy_circle(n=12, radius=10.0, drift=0.02, seed=0):
    """Ground-truth circle + odometry with small per-step drift; returns
    (gt_poses, odom_poses, true_relative_transforms)."""
    rng = np.random.default_rng(seed)
    gt = []
    for k in range(n):
        yaw = 2 * np.pi * k / n
        t = np.array([radius * np.cos(yaw), radius * np.sin(yaw), 0.0])
        gt.append(np_se3.from_rt(
            np_se3.euler_to_matrix(np.array([0, 0, yaw + np.pi / 2])), t))
    rels = [np_se3.inverse(gt[k]) @ gt[k + 1] for k in range(n - 1)]
    # odometry chained from noisy relatives
    odom = [gt[0]]
    noisy_rels = []
    for r in rels:
        nr = r.copy()
        nr[:3, 3] += rng.normal(0, drift, 3)
        e = rng.normal(0, drift / 2, 3)
        nr[:3, :3] = nr[:3, :3] @ np_se3.euler_to_matrix(e)
        noisy_rels.append(nr)
        odom.append(np_se3.normalize_rotation(odom[-1] @ nr))
    return gt, odom, rels, noisy_rels


def test_chain_without_loops_unchanged():
    gt, odom, rels, noisy = make_noisy_circle()
    g = PoseGraph()
    for _ in odom:
        g.add_node()
    for k, nr in enumerate(noisy):
        g.add_between(k, k + 1, nr)
    out = g.optimize(np.stack(odom), num_iters=5)
    # between-only chain is exactly consistent → optimization is a no-op
    for a, b in zip(out, odom):
        assert np.abs(a - b).max() < 1e-3


def test_loop_closure_reduces_error():
    gt, odom, rels, noisy = make_noisy_circle(n=16, drift=0.05, seed=1)
    err_before = np.linalg.norm(odom[-1][:3, 3] - gt[-1][:3, 3])

    g = PoseGraph()
    for _ in odom:
        g.add_node()
    for k, nr in enumerate(noisy):
        g.add_between(k, k + 1, nr)
    # loop closure: node n-1 ↔ node 0 with the TRUE relative transform,
    # tight sigmas (loop_closure_noise_model, isam_optimizer.cc:83-85)
    T_last_to_first = np_se3.inverse(gt[-1]) @ gt[0]
    g.add_between(len(odom) - 1, 0, np_se3.inverse(T_last_to_first) @ np.eye(4)
                  if False else T_last_to_first)
    out = g.optimize(np.stack(odom), num_iters=10)

    err_after = np.linalg.norm(out[-1][:3, 3] - gt[-1][:3, 3])
    assert err_after < err_before * 0.5, (err_before, err_after)
    # gauge: node 0 stays at its initial pose
    assert np.abs(out[0] - odom[0]).max() < 1e-3
    # rotations stay orthonormal
    for T in out:
        RtR = T[:3, :3] @ T[:3, :3].T
        assert np.abs(RtR - np.eye(3)).max() < 1e-4


def test_chi2_decreases():
    gt, odom, rels, noisy = make_noisy_circle(n=10, drift=0.08, seed=2)
    g = PoseGraph()
    for _ in odom:
        g.add_node()
    for k, nr in enumerate(noisy):
        g.add_between(k, k + 1, nr)
    g.add_between(len(odom) - 1, 0, np_se3.inverse(gt[-1]) @ gt[0])
    out1 = g.optimize(np.stack(odom), num_iters=1)
    chi_1 = g.last_chi2
    out8 = g.optimize(np.stack(odom), num_iters=10)
    chi_8 = g.last_chi2
    assert chi_8 <= chi_1 + 1e-3


# ---------------------------------------------------------------------------
# block-sparse PCG solver (backend/pose_graph_sparse.py)
# ---------------------------------------------------------------------------

def _square_circuit(n, laps=4, step_len=0.5, drift=0.02, seed=1):
    """Closed square circuit driven ``laps`` times; returns (gt, odom, loop
    pairs with true relative transforms)."""
    rng = np.random.default_rng(seed)
    per_side = n // (4 * laps)
    gt = [np.eye(4)]
    for k in range(n - 1):
        step = np.eye(4)
        step[0, 3] = step_len
        if (k + 1) % per_side == 0:
            step[:3, :3] = np_se3.euler_to_matrix(np.array([0, 0, np.pi / 2]))
        gt.append(np_se3.normalize_rotation(gt[-1] @ step))
    odom = [gt[0]]
    noisy = []
    for k in range(n - 1):
        rel = np_se3.inverse(gt[k]) @ gt[k + 1]
        nr = rel.copy()
        nr[:3, 3] += rng.normal(0, drift, 3)
        noisy.append(nr)
        odom.append(np_se3.normalize_rotation(odom[-1] @ nr))
    lap = 4 * per_side
    loops = [(k, k - lap, np_se3.inverse(gt[k]) @ gt[k - lap])
             for k in range(lap, n, 40)]
    return gt, odom, noisy, loops


def _build_graph(n, odom, noisy, loops):
    g = PoseGraph()
    for _ in range(n):
        g.add_node()
    for k, nr in enumerate(noisy):
        g.add_between(k, k + 1, nr)
    for (i, j, T) in loops:
        g.add_between(i, j, T, sigmas=(0.05,) * 3 + (0.02,) * 3)
    return g


def test_pcg_matches_dense_small():
    """The matrix-free PCG solve equals the dense MXU solve on the same
    factor graph (same LM schedule, same linearization)."""
    gt, odom, rels, noisy = make_noisy_circle(n=16, drift=0.05, seed=1)
    loop = np_se3.inverse(gt[-1]) @ gt[0]

    def build():
        g = PoseGraph()
        for _ in odom:
            g.add_node()
        for k, nr in enumerate(noisy):
            g.add_between(k, k + 1, nr)
        g.add_between(len(odom) - 1, 0, loop)
        return g

    out_d = build().optimize(np.stack(odom), num_iters=6, solver="dense")
    out_p = build().optimize(np.stack(odom), num_iters=6, solver="pcg")
    assert np.abs(out_d - out_p).max() < 5e-4


def test_pcg_scales_past_dense_limit():
    """1500-node graph (dense H would be 9000² = 324 MB and is auto-routed
    to PCG): converges, reduces chi2 to near-noise, improves ATE."""
    n = 1500
    gt, odom, noisy, loops = _square_circuit(n, drift=0.03, seed=3)
    g = _build_graph(n, odom, noisy, loops)
    before = np.linalg.norm(
        np.stack(odom)[:, :3, 3] - np.stack(gt)[:, :3, 3], axis=1).mean()
    out = g.optimize(np.stack(odom), num_iters=6, solver="auto")
    after = np.linalg.norm(
        out[:, :3, 3] - np.stack(gt)[:, :3, 3], axis=1).mean()
    assert after < before, (before, after)
    assert g.last_chi2 < 50.0
    for T in out[:: max(1, n // 10)]:
        RtR = T[:3, :3] @ T[:3, :3].T
        assert np.abs(RtR - np.eye(3)).max() < 1e-4


def test_pcg_sharded_matches_single_device():
    """Sharded-linearization solve (between factors sharded over the 8
    virtual CPU devices, psum-combined) equals the single-device solve."""
    import jax
    from jax.sharding import Mesh
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs multi-device mesh")
    n = 400
    gt, odom, noisy, loops = _square_circuit(n, drift=0.02, seed=4)
    g1 = _build_graph(n, odom, noisy, loops)
    out1 = g1.optimize(np.stack(odom), num_iters=5, solver="pcg")
    mesh = Mesh(np.array(jax.devices()), axis_names=("graph",))
    g2 = _build_graph(n, odom, noisy, loops)
    out2 = g2.optimize(np.stack(odom), num_iters=5, solver="pcg", mesh=mesh)
    assert np.abs(out1 - out2).max() < 2e-3
    assert abs(g1.last_chi2 - g2.last_chi2) < 0.1 * max(1.0, g1.last_chi2)
