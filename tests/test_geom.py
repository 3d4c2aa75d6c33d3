"""Unit tests for intersection math: hand cases against the reference
semantics, and batched (matmul) formulation vs the direct formulation."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.core.types import Material
from raytracer_tpu.geom import batched, direct
from raytracer_tpu.geom.direct import INF


def V(*xs):
    return jnp.asarray(xs, jnp.float32)


class TestSphere:
    def test_head_on_hit(self):
        t, inner = direct.intersect_sphere(V(0, 0, 5), V(0, 0, -1),
                                           V(0, 0, 0), 1.0)
        assert bool(inner)
        assert np.isclose(float(t), 4.0)

    def test_miss(self):
        t, inner = direct.intersect_sphere(V(0, 5, 5), V(0, 0, -1),
                                           V(0, 0, 0), 1.0)
        assert not bool(inner)
        assert float(t) >= 1e29

    def test_inside_is_outer_not_hit(self):
        # camera inside: t1 < 0, t2 > 0 -> OUTER -> ignored
        # (sphere.hpp:51-57, gpu_shader.comp:263-269)
        _, inner = direct.intersect_sphere(V(0, 0, 0), V(0, 0, -1),
                                           V(0, 0, 0), 1.0)
        assert not bool(inner)

    def test_tangent_no_hit(self):
        # D == 0 exactly is NOT a hit (strict D > 0, sphere.hpp:49)
        _, inner = direct.intersect_sphere(V(1, 0, 5), V(0, 0, -1),
                                           V(0, 0, 0), 1.0)
        assert not bool(inner)

    def test_behind_ray(self):
        _, inner = direct.intersect_sphere(V(0, 0, -5), V(0, 0, -1),
                                           V(0, 0, 0), 1.0)
        assert not bool(inner)


class TestPlane:
    def test_backface_convention(self):
        # INNER requires n.dir > 0: ray along +z into plane with n=+z
        # hits INNER; with n=-z it is OUTER (ignored). plane.hpp:51.
        n, d = V(0, 0, 1), jnp.float32(-10.0)  # plane z=10
        t, inner = direct.intersect_plane(V(0, 0, 0), V(0, 0, 1), n, d)
        assert bool(inner) and np.isclose(float(t), 10.0)
        n2, d2 = V(0, 0, -1), jnp.float32(10.0)  # same plane, flipped n
        _, inner2 = direct.intersect_plane(V(0, 0, 0), V(0, 0, 1), n2, d2)
        assert not bool(inner2)

    def test_parallel(self):
        _, inner = direct.intersect_plane(V(0, 0, 0), V(1, 0, 0),
                                          V(0, 0, 1), jnp.float32(-10.0))
        assert not bool(inner)


class TestWall:
    def setup_method(self):
        # wall in plane z=0, n=(0,0,1), start at origin, 4 wide 3 high.
        # u = normalize(cross(n,(0,1,0))) = (1,0,0)... cross((0,0,1),(0,1,0))
        # = (-1,0,0); v = cross(n,u) = (0,-1,0)... check in-test.
        self.n = V(0, 0, 1)
        self.d = jnp.float32(0.0)
        self.start = V(0, 0, 0)

    def hit(self, ox, oy):
        return direct.intersect_wall(V(ox, oy, -5), V(0, 0, 1), self.n,
                                     self.d, self.start, 4.0, 3.0)

    def test_basis_orientation(self):
        u, v, deg = direct.wall_basis(self.n)
        assert not bool(deg)
        np.testing.assert_allclose(np.asarray(u), [-1, 0, 0], atol=1e-7)
        np.testing.assert_allclose(np.asarray(v), [0, -1, 0], atol=1e-7)

    def test_inside(self):
        # with u=(-1,0,0), v=(0,-1,0): uProj = -x, vProj = -y, so the wall
        # rectangle spans x in [-4, 0], y in [-3, 0]
        t, inner = self.hit(-2.0, -1.0)
        assert bool(inner) and np.isclose(float(t), 5.0)

    def test_outside(self):
        _, inner = self.hit(2.0, -1.0)
        assert not bool(inner)
        _, inner = self.hit(-2.0, 1.0)
        assert not bool(inner)

    def test_degenerate_normal_is_infinite_plane(self):
        # n = (0,1,0): cross with world-up is zero -> NaN basis in the
        # reference -> bounds check never rejects (wall.hpp:53-64 quirk).
        n, d = V(0, 1, 0), jnp.float32(0.0)
        t, inner = direct.intersect_wall(V(100.0, -5.0, 100.0), V(0, 1, 0),
                                         n, d, V(0, 0, 0), 2.0, 2.0)
        assert bool(inner)
        assert np.isclose(float(t), 5.0)


class TestTriangle:
    P1, P2, P3 = (0, 0, 0), (4, 0, 0), (0, 4, 0)

    def tri_hit(self, o, d, mt=False, invert=False):
        p1, p2, p3 = V(*self.P1), V(*self.P2), V(*self.P3)
        n = jnp.cross(p2 - p1, p3 - p1)
        n = n / jnp.linalg.norm(n)
        if invert:
            n = -n
        pd = -jnp.dot(n, p1)
        if mt:
            return direct.intersect_triangle_mt(V(*o), V(*d), p1, p2, p3)
        return direct.intersect_triangle_barycentric(V(*o), V(*d), p1, p2,
                                                     p3, n, pd)

    def test_hit_inside_barycentric(self):
        # triangle normal = +z; back-face INNER needs n.dir > 0 -> ray
        # must travel along +z
        t, inner = self.tri_hit((1, 1, -5), (0, 0, 1))
        assert bool(inner) and np.isclose(float(t), 5.0)

    def test_frontface_is_outer_barycentric(self):
        _, inner = self.tri_hit((1, 1, 5), (0, 0, -1))
        assert not bool(inner)

    def test_outside_barycentric(self):
        _, inner = self.tri_hit((3.9, 3.9, -5), (0, 0, 1))
        assert not bool(inner)

    def test_mt_is_double_sided(self):
        # MT has no back-face convention (gpu_shader.comp:170-195)
        _, inner_front = self.tri_hit((1, 1, 5), (0, 0, -1), mt=True)
        _, inner_back = self.tri_hit((1, 1, -5), (0, 0, 1), mt=True)
        assert bool(inner_front) and bool(inner_back)

    def test_mt_edge_uv(self):
        t, inner = self.tri_hit((0, 0, -5), (0, 0, 1), mt=True)
        assert bool(inner)  # u=v=0 allowed (>= 0)


class TestAABB:
    def test_hit(self):
        ok = direct.intersect_aabb(V(0, 0, -5), V(0, 0, 1),
                                   V(-1, -1, -1), V(1, 1, 1))
        assert bool(ok)

    def test_miss(self):
        ok = direct.intersect_aabb(V(5, 0, -5), V(0, 0, 1),
                                   V(-1, -1, -1), V(1, 1, 1))
        assert not bool(ok)

    def test_behind(self):
        # box entirely behind origin: tMax < 0 -> miss (comp:376)
        ok = direct.intersect_aabb(V(0, 0, 5), V(0, 0, 1),
                                   V(-1, -1, -1), V(1, 1, 1))
        assert not bool(ok)

    def test_inside_box(self):
        ok = direct.intersect_aabb(V(0, 0, 0), V(0, 0, 1),
                                   V(-1, -1, -1), V(1, 1, 1))
        assert bool(ok)

    def test_axis_parallel_ray_inf_handling(self):
        # ray parallel to x axis inside slab: 1/0 -> inf, matches GLSL
        ok = direct.intersect_aabb(V(0, 0, -5), V(0, 0, 1),
                                   V(-1, -1, -1), V(1, 1, 1))
        assert bool(ok)


def _random_test_scene(rng):
    b = SceneBuilder()
    for _ in range(7):
        b.add_sphere(rng.uniform(-10, 10, 3), rng.uniform(0.5, 3),
                     Material(color=tuple(rng.uniform(0, 1, 3))))
    for _ in range(3):
        n = rng.normal(size=3)
        b.add_plane(n, rng.uniform(-5, 5, 3))
    for _ in range(5):
        n = rng.normal(size=3)
        b.add_wall(rng.uniform(-10, 10, 3), rng.uniform(1, 8),
                   rng.uniform(1, 8), n)
    b.add_wall((0, -3, 0), 4, 4, (0, 1, 0))  # degenerate-basis wall
    for _ in range(8):
        p = rng.uniform(-8, 8, (3, 3))
        b.add_triangle(p[0], p[1], p[2], invert_normal=bool(rng.random() < .5))
    return b.build()


@pytest.mark.parametrize("use_mt", [False, True])
def test_batched_matches_direct(rng, use_mt):
    """The matmul formulation must agree elementwise with the direct one."""
    scene = _random_test_scene(rng)
    cache = batched.precompute(scene)
    n_rays = 64
    o = jnp.asarray(rng.uniform(-20, 20, (n_rays, 3)), jnp.float32)
    d = rng.normal(size=(n_rays, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True),
                    jnp.float32)

    t_b, in_b = batched.intersect_scene(cache, o, d, use_mt)

    # direct, shape by shape
    N = scene.num_shapes
    t_d = np.zeros((n_rays, N), np.float32)
    in_d = np.zeros((n_rays, N), bool)
    st = np.asarray(scene.shape_type)
    for i in range(N):
        if st[i] == 0:
            t, inn = direct.intersect_sphere(o, d, scene.sphere_center[i],
                                             scene.sphere_radius[i])
        elif st[i] == 1:
            t, inn = direct.intersect_plane(o, d, scene.plane_normal[i],
                                            scene.plane_d[i])
        elif st[i] == 2:
            t, inn = direct.intersect_wall(
                o, d, scene.plane_normal[i], scene.plane_d[i],
                scene.wall_start[i], scene.wall_width[i],
                scene.wall_height[i])
        else:
            if use_mt:
                t, inn = direct.intersect_triangle_mt(
                    o, d, scene.tri_p1[i], scene.tri_p2[i], scene.tri_p3[i])
            else:
                t, inn = direct.intersect_triangle_barycentric(
                    o, d, scene.tri_p1[i], scene.tri_p2[i], scene.tri_p3[i],
                    scene.plane_normal[i], scene.plane_d[i])
        t_d[:, i] = np.asarray(t)
        in_d[:, i] = np.asarray(inn)

    # tolerate fp reassociation between the two formulations near edges
    agree = np.asarray(in_b) == in_d
    assert agree.mean() > 0.999, f"mask agreement {agree.mean()}"
    both = np.asarray(in_b) & in_d
    np.testing.assert_allclose(np.asarray(t_b)[both], t_d[both],
                               rtol=2e-4, atol=2e-4)


def test_closest_hit_picks_nearest(rng):
    b = SceneBuilder()
    b.add_sphere((0, 0, -10), 1.0)
    b.add_sphere((0, 0, -5), 1.0)
    b.add_sphere((0, 0, -20), 1.0)
    scene = b.build()
    cache = batched.precompute(scene)
    o = jnp.asarray([[0, 0, 5]], jnp.float32)
    d = jnp.asarray([[0, 0, -1]], jnp.float32)
    t, sid, hit = batched.closest_hit(cache, o, d)
    assert bool(hit[0])
    assert int(sid[0]) == 1
    assert np.isclose(float(t[0]), 9.0)


def test_shape_normal():
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 2.0)
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0))
    scene = b.build()
    p = jnp.asarray([[2, 0, 0], [0, 0, 0]], jnp.float32)
    sid = jnp.asarray([0, 1], jnp.int32)
    n = batched.shape_normal(scene, sid, p)
    np.testing.assert_allclose(np.asarray(n[0]), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n[1]), [0, 0, 1], atol=1e-6)
