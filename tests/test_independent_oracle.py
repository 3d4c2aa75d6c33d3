"""Ground-truth cross-check against an INDEPENDENT numerical oracle.

The reference validated its intersectors against a third-party ray caster
(Embree: src/shapes/triangle.hpp:136-167, main.cpp:1231-1235). This suite
plays that role with tests/independent_oracle.py — float64, LAPACK-backed
(np.roots companion matrix for spheres, np.linalg.solve for triangles) —
so an author-side misreading of the math shared by geom/direct|batched|
rowwise cannot also hide in the oracle's machinery.

Structure:
1. Anchor the oracle itself on ANALYTIC vectors derivable by hand.
2. Per-shape randomized cross-check oracle vs geom/direct.py.
3. Full-scene closest-hit cross-check on scene 1 camera rays.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracer_tpu.core.camera import get_rays
from raytracer_tpu.geom import batched, direct
from raytracer_tpu.scenes import generate_scene1

import independent_oracle as oracle

INF = oracle.INF


# ---------------------------------------------------------------------------
# 1. Analytic anchors: every expected value below is derivable by hand.
# ---------------------------------------------------------------------------

class TestOracleAnchors:
    def test_sphere_head_on(self):
        # Unit sphere at origin, ray from z=-5 along +z: near hit at t=4.
        t, inner = oracle.intersect_sphere([0, 0, -5], [0, 0, 1],
                                           [0, 0, 0], 1.0)
        assert inner and t == pytest.approx(4.0, abs=1e-9)

    def test_sphere_tangent_is_miss(self):
        # Grazing ray (x=1): discriminant 0 -> NOT inner (strict D > 0).
        t, inner = oracle.intersect_sphere([1, 0, -5], [0, 0, 1],
                                           [0, 0, 0], 1.0)
        assert not inner

    def test_sphere_from_inside_is_miss(self):
        # Camera inside: near root negative -> reference drops OUTER.
        _, inner = oracle.intersect_sphere([0, 0, 0], [0, 0, 1],
                                           [0, 0, 0], 1.0)
        assert not inner

    def test_sphere_offcenter(self):
        # Sphere r=2 at (0,0,10), ray from origin along +z: t = 10-2 = 8.
        t, inner = oracle.intersect_sphere([0, 0, 0], [0, 0, 1],
                                           [0, 0, 10], 2.0)
        assert inner and t == pytest.approx(8.0, abs=1e-9)

    def test_plane_backface_convention(self):
        # Plane z = 2 with n=(0,0,1): n.p + d = 0 -> d = -2.
        # Ray along +z sees the BACK face (n.dir > 0): hit at t=2.
        t, inner = oracle.intersect_plane([0, 0, 0], [0, 0, 1],
                                          [0, 0, 1], -2.0)
        assert inner and t == pytest.approx(2.0, abs=1e-12)
        # Front-face approach (n.dir < 0) never hits in the reference.
        _, inner = oracle.intersect_plane([0, 0, 5], [0, 0, -1],
                                          [0, 0, 1], -2.0)
        assert not inner

    def test_triangle_solve_barycentrics(self):
        # Right triangle in z=3 plane; ray through (0.25, 0.25):
        # o + t d = p1 + u e1 + v e2 with u = v = 0.25, t = 3.
        t, u, v, det = oracle.triangle_solve(
            [0.25, 0.25, 0], [0, 0, 1],
            [0, 0, 3], [1, 0, 3], [0, 1, 3])
        assert t == pytest.approx(3.0, abs=1e-12)
        assert u == pytest.approx(0.25, abs=1e-12)
        assert v == pytest.approx(0.25, abs=1e-12)

    def test_triangle_mt_double_sided(self):
        tri = ([0, 0, 3], [1, 0, 3], [0, 1, 3])
        t, inner = oracle.intersect_triangle_mt(
            [0.2, 0.2, 0], [0, 0, 1], *tri)
        assert inner and t == pytest.approx(3.0)
        # Same triangle from the other side (double-sided): also hits.
        t, inner = oracle.intersect_triangle_mt(
            [0.2, 0.2, 6], [0, 0, -1], *tri)
        assert inner and t == pytest.approx(3.0)
        # Outside the barycentric bounds: miss.
        _, inner = oracle.intersect_triangle_mt(
            [0.8, 0.8, 0], [0, 0, 1], *tri)
        assert not inner

    def test_wall_bounds_and_degenerate(self):
        # Wall in plane x = 1, n=(1,0,0) -> d = -1; basis u = n x (0,1,0)
        # = (0,0,1), v = n x u = (0,-1,0). start=(1,0,0), w=h=2 covers
        # z in [0,2], y in [-2,0].
        t, inner = oracle.intersect_wall(
            [0, -1, 1], [1, 0, 0], [1, 0, 0], -1.0, [1, 0, 0], 2.0, 2.0)
        assert inner and t == pytest.approx(1.0)
        _, inner = oracle.intersect_wall(
            [0, 1, 1], [1, 0, 0], [1, 0, 0], -1.0, [1, 0, 0], 2.0, 2.0)
        assert not inner  # y=+1 outside [-2, 0]
        # Degenerate basis (n || (0,1,0)): behaves as infinite plane.
        t, inner = oracle.intersect_wall(
            [50, 0, 0], [0, 1, 0], [0, 1, 0], -3.0, [0, 3, 0], 1.0, 1.0)
        assert inner and t == pytest.approx(3.0)


# ---------------------------------------------------------------------------
# 2. Randomized per-shape cross-check: oracle (f64/LAPACK) vs geom/direct
#    (f32/jnp). Fixed seed => deterministic; tolerances absorb f32.
# ---------------------------------------------------------------------------

def _agree(t_ref, inner_ref, t_f32, inner_f32, rtol=1e-4):
    if inner_ref != bool(inner_f32):
        return False
    if not inner_ref:
        return True
    return abs(t_ref - float(t_f32)) <= rtol * max(1.0, abs(t_ref))


class TestRandomizedCrossCheck:
    N = 300

    def _rays(self, rng, n):
        o = rng.uniform(-4, 4, (n, 3))
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return o.astype(np.float32), d.astype(np.float32)

    def test_spheres(self, rng):
        o, d = self._rays(rng, self.N)
        c = rng.uniform(-4, 4, (self.N, 3)).astype(np.float32)
        r = rng.uniform(0.3, 2.5, self.N).astype(np.float32)
        t32, in32 = direct.intersect_sphere(jnp.asarray(o), jnp.asarray(d),
                                            jnp.asarray(c), jnp.asarray(r))
        bad = 0
        for i in range(self.N):
            tr, ir = oracle.intersect_sphere(o[i], d[i], c[i], float(r[i]))
            # exclude grazing rays (f32 discriminant sign is noise there)
            real, distinct = oracle.sphere_roots(o[i], d[i], c[i],
                                                 float(r[i]))
            if distinct and real[1] - real[0] < 1e-3:
                continue
            bad += not _agree(tr, ir, t32[i], in32[i])
        assert bad == 0

    def test_triangles_mt(self, rng):
        o, d = self._rays(rng, self.N)
        p = rng.uniform(-3, 3, (self.N, 3, 3)).astype(np.float32)
        t32, in32 = direct.intersect_triangle_mt(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(p[:, 0]),
            jnp.asarray(p[:, 1]), jnp.asarray(p[:, 2]))
        bad = 0
        for i in range(self.N):
            tr, u, v, det = oracle.triangle_solve(o[i], d[i], *p[i])
            # exclude decision-boundary cases (f32 vs f64 noise, not bugs)
            if (abs(abs(det) - 1e-5) < 1e-6 or
                    min(abs(u), abs(v), abs(1 - u - v), abs(tr)) < 1e-4):
                continue
            ir = abs(det) >= 1e-5 and u >= 0 and v >= 0 and u + v <= 1 \
                and tr > 0
            bad += not _agree(tr if ir else INF, ir, t32[i], in32[i])
        assert bad == 0

    def test_triangles_barycentric(self, rng):
        o, d = self._rays(rng, self.N)
        p = rng.uniform(-3, 3, (self.N, 3, 3)).astype(np.float32)
        # plane from the triangle, as SceneBuilder stores it
        e1, e2 = p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]
        n = np.cross(e1, e2)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        pd = -np.sum(n * p[:, 0], axis=-1)
        t32, in32 = direct.intersect_triangle_barycentric(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(p[:, 0]),
            jnp.asarray(p[:, 1]), jnp.asarray(p[:, 2]),
            jnp.asarray(n.astype(np.float32)),
            jnp.asarray(pd.astype(np.float32)))
        bad = 0
        for i in range(self.N):
            tr, ir = oracle.intersect_triangle_barycentric(
                o[i], d[i], p[i, 0], p[i, 1], p[i, 2], n[i], float(pd[i]))
            _, u, v, det = oracle.triangle_solve(o[i], d[i], *p[i])
            nd = float(n[i] @ d[i])
            if (min(abs(u), abs(v), abs(1 - u - v)) < 1e-4
                    or abs(nd) < 1e-4 or abs(tr) < 1e-4):
                continue
            bad += not _agree(tr, ir, t32[i], in32[i])
        assert bad == 0

    def test_walls(self, rng):
        o, d = self._rays(rng, self.N)
        n = rng.normal(size=(self.N, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        n = n.astype(np.float32)
        start = rng.uniform(-3, 3, (self.N, 3)).astype(np.float32)
        pd = -np.sum(n * start, axis=-1).astype(np.float32)
        w = rng.uniform(0.5, 4, self.N).astype(np.float32)
        h = rng.uniform(0.5, 4, self.N).astype(np.float32)
        t32, in32 = direct.intersect_wall(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(n), jnp.asarray(pd),
            jnp.asarray(start), jnp.asarray(w), jnp.asarray(h))
        bad = 0
        for i in range(self.N):
            tr, ir = oracle.intersect_wall(o[i], d[i], n[i], float(pd[i]),
                                           start[i], float(w[i]),
                                           float(h[i]))
            nd = float(n[i] @ d[i])
            if abs(nd) < 1e-4:
                continue
            if ir and tr < INF:  # exclude rectangle-edge borderline
                u_raw = np.cross(n[i].astype(np.float64), [0, 1, 0])
                u = u_raw / np.linalg.norm(u_raw)
                v = np.cross(n[i].astype(np.float64), u)
                v /= np.linalg.norm(v)
                loc = o[i] + tr * d[i] - start[i]
                up, vp = loc @ u, loc @ v
                if min(abs(up), abs(w[i] - up), abs(vp),
                       abs(h[i] - vp)) < 1e-3:
                    continue
            bad += not _agree(tr, ir, t32[i], in32[i])
        assert bad == 0


# ---------------------------------------------------------------------------
# 3. Full-scene closest hit: scene 1 camera rays, production linear-scan
#    semantics (batched.closest_hit) vs the independent oracle.
# ---------------------------------------------------------------------------

def test_scene1_closest_hit_vs_independent_oracle(rng):
    sc = generate_scene1()
    cache = batched.precompute(sc.flat)
    n = 128
    ndc_x = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    ndc_y = jnp.asarray(rng.uniform(-1, 1, n).astype(np.float32))
    o, d = get_rays(sc.camera, ndc_x, ndc_y)
    t32, sid32, hit32 = batched.closest_hit(cache, o, d)
    o_np = np.asarray(o, np.float64)
    d_np = np.asarray(d, np.float64)
    t_ref, sid_ref, hit_ref = oracle.closest_hit_scene_batch(
        sc.flat, o_np, d_np)
    mismatches = []
    for i in range(n):
        tr, sid, hit = float(t_ref[i]), int(sid_ref[i]), bool(hit_ref[i])
        if hit != bool(hit32[i]):
            mismatches.append((i, "hit", tr, float(t32[i])))
        elif hit and sid != int(sid32[i]):
            # different shape is fine iff the depths coincide (true tie)
            if abs(tr - float(t32[i])) > 1e-3 * max(1.0, tr):
                mismatches.append((i, "sid", sid, int(sid32[i])))
        elif hit and abs(tr - float(t32[i])) > 1e-3 * max(1.0, tr):
            mismatches.append((i, "t", tr, float(t32[i])))
    assert not mismatches, mismatches[:5]
