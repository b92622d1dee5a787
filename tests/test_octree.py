"""Octree parity tests (reference: common/test/test_octree.cc style —
build from random points, assert containment/search exactness)."""
import numpy as np

from staticmapping_tpu.common.octree import Octree


def test_octree_build_and_contains():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (2000, 3))
    tree = Octree(pts, max_depth=4)
    assert len(tree) == 2000
    assert tree.num_leaves > 50
    assert tree.contains(pts[0])
    assert not tree.contains([100.0, 0.0, 0.0])


def test_octree_radius_search_exact():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, (3000, 3))
    tree = Octree(pts, max_depth=5)
    for q in rng.uniform(-4, 4, (10, 3)):
        for r in (0.3, 1.0):
            got = np.sort(tree.radius_search(q, r))
            want = np.flatnonzero(
                np.linalg.norm(pts - q, axis=1) <= r)
            np.testing.assert_array_equal(got, want)


def test_octree_nearest_matches_bruteforce():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-5, 5, (1000, 3))
    tree = Octree(pts, max_depth=4)
    for q in rng.uniform(-6, 6, (20, 3)):
        idx, d = tree.nearest(q)
        brute = np.linalg.norm(pts - q, axis=1)
        assert idx == int(np.argmin(brute))
        assert abs(d - brute.min()) < 1e-9


def test_octree_leaf_of():
    pts = np.array([[0.0, 0.0, 0.0], [0.01, 0.0, 0.0], [3.0, 3.0, 3.0]])
    tree = Octree(pts, max_depth=6)
    leaf = tree.leaf_of([0.0, 0.0, 0.0])
    assert leaf is not None and set(leaf) == {0, 1}
    assert tree.leaf_of([50.0, 0.0, 0.0]) is None
