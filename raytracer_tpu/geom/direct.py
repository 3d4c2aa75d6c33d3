"""Direct (per-shape, broadcast) intersection math.

Each function maps 1:1 to a reference intersector and is the ground truth
the batched/matmul formulation (geom/batched.py) and the Pallas kernel are
tested against. Shapes of inputs: ray origin/direction ``o``/``d`` are
(..., 3); shape parameters broadcast against them.

Conventions (see SURVEY.md §5 quirk checklist):
- Only INNER counts as a hit anywhere in the pipeline.
- Plane-family INNER requires n.dir > 0 (back-face convention,
  src/shapes/plane.hpp:51, gpu_shader.comp:278).
- Returned ``t`` is the ray parameter; directions are unit length so t equals
  the reference's ``distance(ray.start, hit_point)``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# Python float (not a jnp scalar) so Pallas kernels can close over it
# without capturing a device constant.
INF = 1e30


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def reflect(incident, normal):
    """GLSL reflect(I, N) = I - 2*dot(N, I)*N."""
    return incident - 2.0 * _dot(normal, incident)[..., None] * normal


def intersect_sphere(o, d, center, radius) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sphere quadratic (src/shapes/sphere.hpp:41-60, gpu_shader.comp:246-271).

    INNER iff discriminant D > 0 (strict) and near root t1 > 0. The far-root
    OUTER case (camera inside the sphere) never shades and is dropped.
    Returns (t, inner).
    """
    oc = o - center
    aa = _dot(d, d)
    bb = 2.0 * _dot(d, oc)
    cc = _dot(oc, oc) - radius * radius
    disc = bb * bb - 4.0 * aa * cc
    sqrt_disc = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
    t1 = (-bb - sqrt_disc) / (2.0 * aa)
    inner = (disc > 0) & (t1 > 0)
    return jnp.where(inner, t1, INF), inner


def intersect_plane(o, d, normal, plane_d) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plane n.p + d = 0 (src/shapes/plane.hpp:44-57, gpu_shader.comp:272-286).

    np = n.dir; np == 0 -> NONE (exact compare, as in the reference);
    t = -(d + n.o)/np; INNER iff t > 0 and np > 0 (back-face convention).
    """
    np_ = _dot(d, normal)
    t = -(plane_d + _dot(o, normal)) / jnp.where(np_ == 0, 1.0, np_)
    inner = (np_ > 0) & (t > 0)
    return jnp.where(inner, t, INF), inner


def wall_basis(normal, eps: float = 1e-20):
    """In-plane basis used by Wall::get_intersection (src/shapes/wall.hpp:52-55,
    gpu_shader.comp:305-307): u = normalize(cross(n, (0,1,0))),
    v = normalize(cross(n, u)).

    Reference quirk: when n is parallel to (0,1,0) the cross product is zero
    and normalize() yields NaN; NaN projections fail every bounds comparison,
    so the wall behaves as an INFINITE plane (the (1,0,0) fallback at
    wall.hpp:54 is dead code — length(normalize(0)) is NaN, and NaN < 1e-4 is
    false). We reproduce that behavior *branchlessly*: return a
    ``degenerate`` mask and a zero basis, and callers treat degenerate walls
    as all-inside. This keeps gradients NaN-free while matching images
    exactly (scene 1's floor wall has n=(0,1,0) and relies on this).
    """
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    u_raw = jnp.cross(jnp.broadcast_to(normal, normal.shape), up)
    len2 = _dot(u_raw, u_raw)
    degenerate = len2 < eps
    inv = 1.0 / jnp.sqrt(jnp.where(degenerate, 1.0, len2))
    u = u_raw * inv[..., None]
    v_raw = jnp.cross(normal, u)
    vlen2 = _dot(v_raw, v_raw)
    vinv = 1.0 / jnp.sqrt(jnp.where(vlen2 < eps, 1.0, vlen2))
    v = v_raw * vinv[..., None]
    return u, v, degenerate


def intersect_wall(o, d, normal, plane_d, start, width, height
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wall = plane + rectangle bound (src/shapes/wall.hpp:46-68,
    gpu_shader.comp:287-316)."""
    t, inner = intersect_plane(o, d, normal, plane_d)
    u, v, degenerate = wall_basis(normal)
    hit = o + jnp.where(inner, t, 0.0)[..., None] * d
    local = hit - start
    u_proj = _dot(local, u)
    v_proj = _dot(local, v)
    outside = ((u_proj < 0) | (u_proj > width) | (v_proj < 0)
               | (v_proj > height))
    inside = jnp.where(degenerate, True, ~outside)
    inner = inner & inside
    return jnp.where(inner, t, INF), inner


def intersect_triangle_barycentric(o, d, p1, p2, p3, normal, plane_d
                                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plane hit + barycentric inside test (src/shapes/triangle.hpp:100-130,
    gpu_shader.comp:196-240).

    Reference quirk preserved: a degenerate triangle (denom == 0) yields NaN
    barycentrics in GLSL, whose < 0 comparisons are all false, so the hit
    stays INNER (the whole supporting plane is "inside"). We reproduce that
    with an explicit mask instead of NaNs.
    """
    t, inner = intersect_plane(o, d, normal, plane_d)
    hit = o + jnp.where(inner, t, 0.0)[..., None] * d
    e1 = p2 - p1
    e2 = p3 - p1
    to_point = hit - p1
    d00 = _dot(e1, e1)
    d01 = _dot(e1, e2)
    d11 = _dot(e2, e2)
    d20 = _dot(to_point, e1)
    d21 = _dot(to_point, e2)
    denom = d00 * d11 - d01 * d01
    safe = jnp.where(denom == 0, 1.0, denom)
    v = (d11 * d20 - d01 * d21) / safe
    w = (d00 * d21 - d01 * d20) / safe
    u = 1.0 - v - w
    outside = (u < 0) | (v < 0) | (w < 0)
    inside = jnp.where(denom == 0, True, ~outside)
    inner = inner & inside
    return jnp.where(inner, t, INF), inner


def intersect_triangle_mt(o, d, p1, p2, p3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Moller-Trumbore (gpu_shader.comp:170-195). Double-sided: unlike the
    barycentric path there is no np > 0 back-face convention; |a| < 1e-5
    rejects near-parallel rays. The CPU reference's MT branch is an empty
    stub (src/shapes/triangle.hpp:132-134); this implements the GPU one.
    """
    e1 = p2 - p1
    e2 = p3 - p1
    h = jnp.cross(jnp.broadcast_to(d, jnp.broadcast_shapes(d.shape, e2.shape)),
                  jnp.broadcast_to(e2, jnp.broadcast_shapes(d.shape, e2.shape)))
    a = _dot(e1, h)
    ok = jnp.abs(a) >= 1e-5
    f = 1.0 / jnp.where(ok, a, 1.0)
    s = o - p1
    u = f * _dot(s, h)
    ok = ok & (u >= 0) & (u <= 1)
    q = jnp.cross(jnp.broadcast_to(s, jnp.broadcast_shapes(s.shape, e1.shape)),
                  jnp.broadcast_to(e1, jnp.broadcast_shapes(s.shape, e1.shape)))
    v = f * _dot(d, q)
    ok = ok & (v >= 0) & (u + v <= 1)
    t = f * _dot(e2, q)
    inner = ok & (t > 0)
    return jnp.where(inner, t, INF), inner


def intersect_aabb(o, d, box_min, box_max) -> jnp.ndarray:
    """Slab test (gpu_shader.comp:364-377): hit iff tMax >= tMin and
    tMax > 0. Division by zero components produces +-inf exactly as GLSL."""
    inv = 1.0 / d
    t0 = (box_min - o) * inv
    t1 = (box_max - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tmax >= tmin) & (tmax > 0)
