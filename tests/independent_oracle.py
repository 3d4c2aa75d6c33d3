"""Independent ground-truth intersectors (the Embree role).

The reference kept a third-party ray caster (Embree) as ground truth for
its own intersectors (src/shapes/triangle.hpp:136-167, main.cpp:1231-1235).
No third-party tracer ships in this image, so this module plays that role
as a CLEANROOM float64 numpy implementation whose *numerical machinery* is
third-party LAPACK, not the author's formulations:

- Sphere roots come from ``np.roots`` (companion-matrix eigenvalues), not
  the hand-coded discriminant/near-root formula.
- Triangle hits come from solving the 3x3 linear system
  ``[-d | e1 | e2] @ [t, u, v] = o - p1`` with ``np.linalg.solve``
  (LU/LAPACK), not from cross-product Moller-Trumbore or Cramer
  barycentrics.
- Everything runs in float64; the production f32 paths are compared with
  tolerance, and rays within epsilon of a decision boundary are excluded
  (borderline f32/f64 disagreement is expected, not a bug).

The module itself is anchored by analytic test vectors (hits derivable by
hand) in test_independent_oracle.py before being trusted as an oracle.
"""

from __future__ import annotations

import numpy as np

INF = 1e30

# Reference semantics being checked (see geom/direct.py docstrings):
# sphere: INNER iff two distinct real roots and the NEAR root > 0.
# plane family: INNER iff n.dir > 0 (back-face) and t > 0.
# triangle (barycentric path): plane INNER + all barycentrics >= 0,
#   with the degenerate-triangle "whole plane inside" quirk.
# triangle (MT path): double-sided, |det| >= 1e-5, 0<=u, 0<=v, u+v<=1, t>0.


def sphere_roots(o, d, center, radius):
    """All real roots of |o + t d - c|^2 = r^2 via np.roots, ascending.

    Returns (roots_list, n_real_distinct). Uses the companion-matrix
    eigenvalue method — numerically independent of the quadratic formula.
    """
    oc = np.asarray(o, np.float64) - np.asarray(center, np.float64)
    d = np.asarray(d, np.float64)
    a = float(d @ d)
    b = float(2.0 * d @ oc)
    c = float(oc @ oc - radius * radius)
    roots = np.roots([a, b, c])
    real = np.sort(roots[np.abs(roots.imag) < 1e-12].real)
    distinct = len(real) == 2 and real[1] - real[0] > 0
    return real, distinct


def intersect_sphere(o, d, center, radius):
    """(t, inner) under reference semantics, float64."""
    real, distinct = sphere_roots(o, d, center, radius)
    if not distinct:
        return INF, False
    t_near = real[0]
    if t_near > 0:
        return t_near, True
    return INF, False


def plane_t(o, d, normal, plane_d):
    """Solve n.(o + t d) + pd = 0 for t. Returns (t, ndotd)."""
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    n = np.asarray(normal, np.float64)
    nd = float(n @ d)
    if nd == 0.0:
        return INF, nd
    return float(-(plane_d + n @ o) / nd), nd


def intersect_plane(o, d, normal, plane_d):
    t, nd = plane_t(o, d, normal, plane_d)
    inner = nd > 0 and 0 < t < INF
    return (t if inner else INF), inner


def intersect_wall(o, d, normal, plane_d, start, width, height):
    """Plane + rectangle bound, including the degenerate-basis quirk:
    n parallel to (0,1,0) => infinite plane (wall.hpp:52-55 NaN behavior)."""
    t, inner = intersect_plane(o, d, normal, plane_d)
    if not inner:
        return INF, False
    n = np.asarray(normal, np.float64)
    u_raw = np.cross(n, [0.0, 1.0, 0.0])
    if u_raw @ u_raw < 1e-20:
        return t, True  # degenerate basis: all-inside
    u = u_raw / np.linalg.norm(u_raw)
    v = np.cross(n, u)
    v = v / np.linalg.norm(v)
    local = (np.asarray(o, np.float64) + t * np.asarray(d, np.float64)
             - np.asarray(start, np.float64))
    up, vp = float(local @ u), float(local @ v)
    inside = 0 <= up <= width and 0 <= vp <= height
    return (t if inside else INF), inside


def triangle_solve(o, d, p1, p2, p3):
    """Solve [-d | e1 | e2] [t, u, v]^T = o - p1 by LU (np.linalg.solve).

    Returns (t, u, v, det). The solution satisfies
    o + t d = p1 + u e1 + v e2 — barycentric coordinates and ray parameter
    in one third-party linear solve.
    """
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    p1 = np.asarray(p1, np.float64)
    e1 = np.asarray(p2, np.float64) - p1
    e2 = np.asarray(p3, np.float64) - p1
    m = np.stack([-d, e1, e2], axis=1)
    det = float(np.linalg.det(m))
    if det == 0.0:
        return INF, 0.0, 0.0, det
    t, u, v = np.linalg.solve(m, o - p1)
    return float(t), float(u), float(v), det


def intersect_triangle_mt(o, d, p1, p2, p3):
    """Double-sided triangle (the GPU MT semantics) via linear solve.

    Note the MT epsilon |a| >= 1e-5 with a = e1.(d x e2) = det([-d|e1|e2]);
    callers comparing against f32 MT should exclude |det| near 1e-5.
    """
    t, u, v, det = triangle_solve(o, d, p1, p2, p3)
    if abs(det) < 1e-5:
        return INF, False
    if u >= 0 and v >= 0 and u + v <= 1 and t > 0:
        return t, True
    return INF, False


def intersect_triangle_barycentric(o, d, p1, p2, p3, normal, plane_d):
    """Plane hit + inside test (the reference's production triangle path:
    back-face n.dir > 0 convention), barycentrics from the linear solve."""
    t, inner = intersect_plane(o, d, normal, plane_d)
    if not inner:
        return INF, False
    ts, u, v, det = triangle_solve(o, d, p1, p2, p3)
    if det == 0.0:
        # degenerate triangle: reference NaN quirk -> whole plane inside
        return t, True
    if u >= 0 and v >= 0 and u + v <= 1:
        return t, True
    return INF, False


def closest_hit_scene(flat, o, d, use_mt=False):
    """Closest INNER hit over a FlatScene (numpy arrays), one ray.

    Returns (t, sid, hit). Ties resolve to the lowest index (reference's
    strict ``dist < closestDist`` forward scan).
    """
    t, sid, hit = closest_hit_scene_batch(flat, np.asarray(o)[None],
                                          np.asarray(d)[None], use_mt)
    return float(t[0]), int(sid[0]), bool(hit[0])


def _batch_plane_t(o, d, n, pd):
    """(R, S) plane hits: t and n.dir, float64, vectorized."""
    nd = d @ n.T                                   # (R, S)
    num = -(o @ n.T + pd[None, :])
    t = num / np.where(nd == 0, 1.0, nd)
    return np.where(nd == 0, INF, t), nd


def closest_hit_scene_batch(flat, o, d, use_mt=False):
    """Vectorized float64 closest hit over a FlatScene for (R, 3) rays.

    Same semantics as the scalar intersectors above; spheres use batched
    companion-matrix eigenvalues (the np.roots method), triangles use
    batched np.linalg.solve — LAPACK throughout.
    """
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    st = np.asarray(flat.shape_type)
    R, S = o.shape[0], st.shape[0]
    t_all = np.full((R, S), INF)

    sph = np.flatnonzero(st == 0)
    if sph.size:
        c = np.asarray(flat.sphere_center, np.float64)[sph]
        r = np.asarray(flat.sphere_radius, np.float64)[sph]
        oc = o[:, None, :] - c[None, :, :]             # (R, K, 3)
        a = np.sum(d * d, -1)[:, None]
        b = 2.0 * np.sum(d[:, None, :] * oc, -1)
        cc = np.sum(oc * oc, -1) - (r * r)[None, :]
        # companion matrix of the monic quadratic: [[0, -c/a], [1, -b/a]]
        comp = np.zeros((R, sph.size, 2, 2))
        comp[..., 0, 1] = -cc / a
        comp[..., 1, 0] = 1.0
        comp[..., 1, 1] = -b / a
        ev = np.linalg.eigvals(comp)                   # (R, K, 2) complex
        real = np.abs(ev.imag) < 1e-12
        two_real = real.all(-1)
        lo = np.sort(np.where(real, ev.real, np.inf), axis=-1)
        near, far = lo[..., 0], lo[..., 1]
        gap = np.zeros_like(near)
        np.subtract(far, near, out=gap, where=two_real)  # avoid inf - inf
        inner = two_real & (gap > 0) & (near > 0)
        t_all[:, sph] = np.where(inner, near, INF)

    pln = np.flatnonzero(st == 1)
    if pln.size:
        n = np.asarray(flat.plane_normal, np.float64)[pln]
        pd = np.asarray(flat.plane_d, np.float64)[pln]
        t, nd = _batch_plane_t(o, d, n, pd)
        t_all[:, pln] = np.where((nd > 0) & (t > 0), t, INF)

    wal = np.flatnonzero(st == 2)
    if wal.size:
        n = np.asarray(flat.plane_normal, np.float64)[wal]
        pd = np.asarray(flat.plane_d, np.float64)[wal]
        start = np.asarray(flat.wall_start, np.float64)[wal]
        w = np.asarray(flat.wall_width, np.float64)[wal]
        h = np.asarray(flat.wall_height, np.float64)[wal]
        t, nd = _batch_plane_t(o, d, n, pd)
        inner = (nd > 0) & (t > 0)
        u_raw = np.cross(n, [0.0, 1.0, 0.0])
        deg = np.sum(u_raw * u_raw, -1) < 1e-20
        u = u_raw / np.where(deg, 1.0, np.linalg.norm(u_raw, axis=-1))[:, None]
        v = np.cross(n, u)
        vn = np.linalg.norm(v, axis=-1)
        v = v / np.where(vn == 0, 1.0, vn)[:, None]
        hitp = o[:, None, :] + np.where(inner, t, 0.0)[..., None] * d[:, None, :]
        loc = hitp - start[None, :, :]
        up = np.sum(loc * u[None, :, :], -1)
        vp = np.sum(loc * v[None, :, :], -1)
        inside = (up >= 0) & (up <= w) & (vp >= 0) & (vp <= h)
        inside = np.where(deg[None, :], True, inside)
        t_all[:, wal] = np.where(inner & inside, t, INF)

    tri = np.flatnonzero(st == 3)
    if tri.size:
        p1 = np.asarray(flat.tri_p1, np.float64)[tri]
        e1 = np.asarray(flat.tri_p2, np.float64)[tri] - p1
        e2 = np.asarray(flat.tri_p3, np.float64)[tri] - p1
        # batched solve of [-d | e1 | e2] [ts, u, v] = o - p1
        m = np.empty((R, tri.size, 3, 3))
        m[..., 0] = -d[:, None, :]
        m[..., 1] = e1[None, :, :]
        m[..., 2] = e2[None, :, :]
        rhs = o[:, None, :] - p1[None, :, :]
        det = np.linalg.det(m)
        sing = det == 0
        m[sing] = np.eye(3)
        sol = np.linalg.solve(m, rhs[..., None])[..., 0]
        ts, u, v = sol[..., 0], sol[..., 1], sol[..., 2]
        if use_mt:
            inner = (np.abs(det) >= 1e-5) & (u >= 0) & (v >= 0) \
                & (u + v <= 1) & (ts > 0)
            t_all[:, tri] = np.where(inner, ts, INF)
        else:
            n = np.asarray(flat.plane_normal, np.float64)[tri]
            pd = np.asarray(flat.plane_d, np.float64)[tri]
            tp, nd = _batch_plane_t(o, d, n, pd)
            inner = (nd > 0) & (tp > 0)
            inside = (u >= 0) & (v >= 0) & (u + v <= 1)
            inside = np.where(sing, True, inside)  # degenerate-tri quirk
            t_all[:, tri] = np.where(inner & inside, tp, INF)

    sid = np.argmin(t_all, axis=1)
    tmin = t_all[np.arange(R), sid]
    hit = tmin < INF
    return tmin, np.where(hit, sid, -1), hit
