"""BVH build / layout / refit / linearization tests
(reference: src/main.cpp:955-979, 1068-1193)."""

import numpy as np
import pytest

from raytracer_tpu.accel import build_bvh, linearize, refit_grow
from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.scenes import generate_scene1


def _grid_scene(n=4):
    b = SceneBuilder()
    for i in range(n):
        for j in range(n):
            b.add_sphere((4.0 * i, 4.0 * j, 0.0), 1.0)
    return b.build()


def test_root_is_last_and_leaf_marker():
    s = _grid_scene()
    bvh = build_bvh(s, max_depth=4)
    root = bvh.root
    assert root == bvh.num_nodes - 1
    assert bvh.left[root] != -1  # 16 spheres must split at least once
    leaves = bvh.left == -1
    assert leaves.any()
    # all shapes exactly once across leaves (median partition)
    assert sorted(bvh.indices.tolist()) == list(range(s.num_shapes))


def test_leaf_start_count_contract():
    """serializeBVH: startShapeIdx = running emission offset; only leaves
    emit (main.cpp:955-979)."""
    s = _grid_scene()
    bvh = build_bvh(s, max_depth=4)
    running = 0
    for i in range(bvh.num_nodes):
        assert bvh.start[i] == running
        if bvh.left[i] == -1:
            running += bvh.count[i]
    assert running == len(bvh.indices)


def test_depth_zero_is_single_leaf():
    s = _grid_scene()
    bvh = build_bvh(s, max_depth=0)
    assert bvh.num_nodes == 1
    assert bvh.left[0] == -1
    assert bvh.count[0] == s.num_shapes


def test_split_axis_and_children_boxes():
    # two spheres separated along x: split axis 0; each child box is the
    # sphere's AABB
    b = SceneBuilder()
    b.add_sphere((-10, 0, 0), 1.0)
    b.add_sphere((10, 0, 0), 1.0)
    s = b.build()
    bvh = build_bvh(s, max_depth=3)
    assert bvh.num_nodes == 3
    root = bvh.root
    left, right = bvh.left[root], bvh.right[root]
    np.testing.assert_allclose(bvh.bounds_min[left], [-11, -1, -1])
    np.testing.assert_allclose(bvh.bounds_max[left], [-9, 1, 1])
    np.testing.assert_allclose(bvh.bounds_min[right], [9, -1, -1])
    np.testing.assert_allclose(bvh.bounds_max[right], [11, 1, 1])


def test_empty_child_makes_leaf():
    # all shapes on one side of the median -> no split
    b = SceneBuilder()
    for _ in range(4):
        b.add_sphere((0, 0, 0), 1.0)
    s = b.build()
    bvh = build_bvh(s, max_depth=5)
    assert bvh.num_nodes == 1


def test_refit_only_grows():
    s = _grid_scene()
    bvh = build_bvh(s, max_depth=4)
    bmin0 = bvh.bounds_min.copy()
    bmax0 = bvh.bounds_max.copy()
    # move sphere 0 far away and mark it animated
    s2 = s.replace(
        sphere_center=s.sphere_center.at[0].set(
            np.array([100.0, 100.0, 100.0], np.float32)),
        animated=s.animated.at[0].set(True))
    refit_grow(bvh, s2)
    assert (bvh.bounds_min <= bmin0 + 1e-6).all()
    assert (bvh.bounds_max >= bmax0 - 1e-6).all()
    # the root (contains shape 0) must now cover the new position
    assert bvh.bounds_max[bvh.root][0] >= 101.0 - 1e-4


def test_linearize_roundtrip():
    s = _grid_scene()
    bvh = build_bvh(s, max_depth=4)
    lin = linearize(bvh)
    assert lin.num_nodes == bvh.num_nodes
    # DFS node 0 is the root; its skip is past the whole array
    assert int(lin.skip[0]) == lin.num_nodes
    # perm covers every shape exactly once
    assert sorted(np.asarray(lin.perm).tolist()) == list(range(s.num_shapes))
    # leaf ranges tile perm exactly
    counts = np.asarray(lin.leaf_count)
    starts = np.asarray(lin.leaf_start)
    leaf = counts > 0
    spans = sorted(zip(starts[leaf].tolist(), counts[leaf].tolist()))
    pos = 0
    for st, c in spans:
        assert st == pos
        pos += c
    assert pos == s.num_shapes
    # skip pointers are monotone and in range
    assert (np.asarray(lin.skip) <= lin.num_nodes).all()


def test_scene1_bvh_builds():
    sc = generate_scene1()
    bvh = build_bvh(sc.flat, sc.bvh_max_depth)
    assert bvh.num_nodes > 100
    assert sorted(bvh.indices.tolist()) == list(range(1240))
    lin = linearize(bvh)
    assert lin.num_nodes == bvh.num_nodes
