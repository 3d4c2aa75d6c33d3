"""Scene builder / generator tests (reference: generateScene1/2/3,
src/main.cpp:583-804,1196-1229)."""

import numpy as np
import pytest

from raytracer_tpu.core.scene import (SceneBuilder, SPHERE, WALL, TRIANGLE,
                                      wall_end)
from raytracer_tpu.core.types import Material
from raytracer_tpu.scenes import (generate_scene1, generate_scene2,
                                  generate_scene3)


def test_builder_basic():
    b = SceneBuilder()
    b.add_sphere((1, 2, 3), 4.0, Material(color=(1, 0, 0)), animated=True)
    b.add_wall((0, 0, 0), 2, 3, (0, 0, 1))
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0), invert_normal=True)
    s = b.build()
    assert s.num_shapes == 3
    assert s.shape_type.tolist() == [SPHERE, WALL, TRIANGLE]
    np.testing.assert_allclose(np.asarray(s.sphere_center[0]), [1, 2, 3])
    assert bool(s.animated[0]) and not bool(s.animated[1])
    assert b.animated_indices == [0]
    # inverted triangle normal points -z, d = -dot(n, p1) = 0
    np.testing.assert_allclose(np.asarray(s.plane_normal[2]), [0, 0, -1],
                               atol=1e-6)


def test_plane_d_convention():
    b = SceneBuilder()
    b.add_plane((0, 0, 2), (0, 0, 5))  # normalized to (0,0,1), d = -5
    s = b.build()
    np.testing.assert_allclose(np.asarray(s.plane_normal[0]), [0, 0, 1])
    assert np.isclose(float(s.plane_d[0]), -5.0)


def test_wall_end_tangent_basis():
    # Wall::end() uses the tangent basis (wall.hpp:16-31), which differs
    # from the intersection (u,v) basis — reference quirk.
    b = SceneBuilder()
    b.add_wall((0, 0, 0), 4, 2, (0, 0, 1))
    s = b.build()
    end = wall_end(s, 0)
    # n=(0,0,1): |n.x| <= |n.y| is false (0 == 0 -> else branch):
    # tangent1 = normalize((0, -1, 0))... n=(0,0,1): abs(n.x)=0 > abs(n.y)=0
    # false -> tangent1 = normalize((0, -n.z, n.y)) = (0,-1,0);
    # tangent2 = cross(n, t1) = (1,0,0)
    np.testing.assert_allclose(end, [2.0, -4.0, 0.0], atol=1e-6)


def test_scene1_inventory():
    sc = generate_scene1()
    st = np.asarray(sc.flat.shape_type)
    assert sc.num_shapes == 1240
    assert (st == SPHERE).sum() == 4 + 25
    assert (st == WALL).sum() == 2
    assert (st == TRIANGLE).sum() == 1 + 968 + 240
    assert sc.animated_indices == [0, 1, 2]
    assert sc.bvh_max_depth == 15
    # camera position and light match main.cpp:587,591
    np.testing.assert_allclose(np.asarray(sc.camera.position), [30, -5, 40])
    np.testing.assert_allclose(np.asarray(sc.light.position), [0, -14, 0])
    assert float(sc.light.intensity) == 50.0
    # shapes[0] material (main.cpp:595-599)
    np.testing.assert_allclose(np.asarray(sc.flat.mat_color[0]),
                               [0, 0.37, 0], atol=1e-6)
    assert np.isclose(float(sc.flat.mat_specular[0]), 0.1)
    # mirror wall keeps default white color, specular 1 (main.cpp:626-630)
    np.testing.assert_allclose(np.asarray(sc.flat.mat_color[4]), [1, 1, 1])
    assert float(sc.flat.mat_specular[4]) == 1.0
    # floor wall is degenerate-basis (n = (0,1,0)) — the infinite-plane quirk
    np.testing.assert_allclose(np.asarray(sc.flat.plane_normal[-1]),
                               [0, 1, 0])


def test_scene1_deterministic():
    a = generate_scene1(seed=7)
    b = generate_scene1(seed=7)
    np.testing.assert_array_equal(np.asarray(a.flat.sphere_center),
                                  np.asarray(b.flat.sphere_center))
    c = generate_scene1(seed=8)
    assert not np.array_equal(np.asarray(a.flat.sphere_center),
                              np.asarray(c.flat.sphere_center))


def test_scene2_inventory():
    sc = generate_scene2()
    st = np.asarray(sc.flat.shape_type)
    assert sc.num_shapes == 4122
    assert (st == TRIANGLE).sum() == 4022
    assert (st == SPHERE).sum() == 100
    assert len(sc.wheels) == 4
    assert all(len(w["indices"]) == 300 for w in sc.wheels)
    assert len(sc.animated_indices) == 1200
    assert sc.bvh_max_depth == 25
    np.testing.assert_allclose(np.asarray(sc.light.position),
                               [14.8, -17, 17], atol=1e-5)
    assert float(sc.light.intensity) == 26.0


def test_scene3_inventory():
    sc = generate_scene3()
    assert sc.num_shapes == 1
    assert int(sc.flat.shape_type[0]) == TRIANGLE
    np.testing.assert_allclose(np.asarray(sc.flat.tri_p2[0]), [5, 0, 0])


def test_pad_to_inert():
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0)
    s = b.build().pad_to(8)
    assert s.num_shapes == 8
    assert float(s.sphere_radius[5]) == 0.0


def test_light_color():
    sc = generate_scene1()
    np.testing.assert_allclose(np.asarray(sc.light.color), [50, 50, 50])


def test_recompute_tri_planes_preserves_orientation():
    """FlatScene.recompute_tri_planes re-derives each triangle's plane
    from its vertices (the reference Triangle ctor trace,
    src/shapes/triangle.hpp:84-130) while PRESERVING stored winding
    orientation — both invert_normal triangles and flip-toward-center
    mesh triangles must keep their sign (scene 1 has both kinds)."""
    b = SceneBuilder()
    b.add_triangle((0, 0, -5), (1, 0, -5), (0, 1, -5))
    b.add_triangle((0, 0, -7), (1, 0, -7), (0, 1, -7), invert_normal=True)
    b.add_sphere((0, 0, -3), 1.0)
    s = b.build()
    r = s.recompute_tri_planes()
    np.testing.assert_allclose(np.asarray(r.plane_normal),
                               np.asarray(s.plane_normal), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.plane_d),
                               np.asarray(s.plane_d), atol=1e-5)

    # the full scene-1 mix (968 flip-heuristic mesh triangles + one
    # inverted free triangle): recompute must be a no-op within f32
    sc = generate_scene1()
    r1 = sc.flat.recompute_tri_planes()
    np.testing.assert_allclose(np.asarray(r1.plane_normal),
                               np.asarray(sc.flat.plane_normal), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1.plane_d),
                               np.asarray(sc.flat.plane_d), atol=2e-3)

    # a rigid translation keeps n and shifts d by -n.delta
    import jax.numpy as jnp
    delta = jnp.array([0.5, -0.25, 0.125], jnp.float32)
    moved = s.replace(tri_p1=s.tri_p1 + delta, tri_p2=s.tri_p2 + delta,
                      tri_p3=s.tri_p3 + delta).recompute_tri_planes()
    is_tri = np.asarray(s.shape_type) == TRIANGLE
    np.testing.assert_allclose(np.asarray(moved.plane_normal)[is_tri],
                               np.asarray(s.plane_normal)[is_tri],
                               atol=1e-6)
    exp_d = np.asarray(s.plane_d) - np.asarray(
        (s.plane_normal * delta).sum(-1))
    np.testing.assert_allclose(np.asarray(moved.plane_d)[is_tri],
                               exp_d[is_tri], atol=1e-5)
