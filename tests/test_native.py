"""Native C++ scene-prep runtime parity vs the pure-Python builders."""

import numpy as np
import pytest

from raytracer_tpu import native
from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.geom.aabb import shape_aabbs, shape_centers
from raytracer_tpu.io.obj import obj_to_triangles
from raytracer_tpu.scenes import generate_scene1

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_bvh_matches_python():
    sc = generate_scene1()
    py = build_bvh(sc.flat, sc.bvh_max_depth, backend="python")
    nat = build_bvh(sc.flat, sc.bvh_max_depth, backend="native")
    assert nat.num_nodes == py.num_nodes
    np.testing.assert_array_equal(nat.left, py.left)
    np.testing.assert_array_equal(nat.right, py.right)
    np.testing.assert_array_equal(nat.start, py.start)
    np.testing.assert_array_equal(nat.count, py.count)
    np.testing.assert_array_equal(nat.indices, py.indices)
    np.testing.assert_array_equal(nat.bounds_min, py.bounds_min)
    np.testing.assert_array_equal(nat.bounds_max, py.bounds_max)
    for a, b in zip(nat.node_shapes, py.node_shapes):
        np.testing.assert_array_equal(a, b)


def test_native_linearize_matches_python():
    sc = generate_scene1()
    py = linearize(build_bvh(sc.flat, sc.bvh_max_depth, backend="python"))
    mins, maxs = shape_aabbs(sc.flat)
    centers = shape_centers(sc.flat)
    bounds6, ls, lc, skip, perm = native.linearize_native(
        mins, maxs, centers, sc.bvh_max_depth, sc.num_shapes)
    np.testing.assert_array_equal(bounds6, np.asarray(py.bounds))
    np.testing.assert_array_equal(ls, np.asarray(py.leaf_start))
    np.testing.assert_array_equal(lc, np.asarray(py.leaf_count))
    np.testing.assert_array_equal(skip, np.asarray(py.skip))
    np.testing.assert_array_equal(perm, np.asarray(py.perm))


def test_native_obj_matches_python(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("o a\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
                 "o b\nv 5 5 5\nv 6 5 5\nv 5 6 5\nf -3 -2/1 -1//2\n")
    py = obj_to_triangles(str(p))
    nat = native.load_obj_native(str(p))
    np.testing.assert_array_equal(nat, py)


def test_native_bvh_speed_smoke():
    """Native build should handle scene-1 scale quickly (no perf assert,
    just completes)."""
    sc = generate_scene1()
    for _ in range(3):
        build_bvh(sc.flat, sc.bvh_max_depth, backend="native")
