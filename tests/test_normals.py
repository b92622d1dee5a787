import numpy as np
import jax.numpy as jnp

from staticmapping_tpu.data import cloud as cloud_lib
from staticmapping_tpu.ops.normals import estimate_normals


def test_plane_normals():
    rng = np.random.default_rng(0)
    # ground-like plane at z=-1.7 (the d·n=1 fit is degenerate for planes
    # through the origin — same property as the reference's method)
    pts = np.column_stack([
        rng.uniform(-5, 5, 2000), rng.uniform(-5, 5, 2000),
        np.full(2000, -1.7)])
    pc = cloud_lib.from_numpy(pts, capacity=2048)
    nc = estimate_normals(pc, leaf_size=8)
    assert nc.capacity == 256
    m = np.asarray(nc.mask)
    assert m.sum() > 200
    normals = np.asarray(nc.normals)[m]
    nz = np.abs(normals[:, 2])
    assert np.mean(nz > 0.99) > 0.95
    # output points lie on the plane
    zs = np.asarray(nc.xyz)[m][:, 2]
    assert np.abs(zs + 1.7).max() < 1e-3


def test_sphere_normals_radial():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(4000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = 10.0 * v
    pc = cloud_lib.from_numpy(pts, capacity=4096)
    nc = estimate_normals(pc, leaf_size=8)
    m = np.asarray(nc.mask)
    p = np.asarray(nc.xyz)[m]
    n = np.asarray(nc.normals)[m]
    radial = p / np.linalg.norm(p, axis=1, keepdims=True)
    align = np.abs(np.sum(radial * n, axis=1))
    # normals of a sphere point radially
    assert np.mean(align > 0.9) > 0.9


def test_downsampling_ratio():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-10, 10, size=(3000, 3))
    pc = cloud_lib.from_numpy(pts, capacity=4096)
    nc = estimate_normals(pc, leaf_size=8)
    n_out = int(nc.num_valid())
    # ~3000/8 leaves, allow boundary losses
    assert 300 <= n_out <= 512


def test_degenerate_line_masked():
    # collinear points have rank-1 covariance → masked out
    t = np.linspace(0, 1, 64)
    pts = np.column_stack([t, 2 * t, 3 * t])
    pc = cloud_lib.from_numpy(pts, capacity=64)
    nc = estimate_normals(pc, leaf_size=8)
    assert int(nc.num_valid()) == 0


def test_empty_cloud():
    pc = cloud_lib.empty(256)
    nc = estimate_normals(pc, leaf_size=8)
    assert int(nc.num_valid()) == 0
