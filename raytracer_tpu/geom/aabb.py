"""Host-side AABB helpers for the BVH build (numpy).

Reference: src/BoundingBox.hpp. Boxes init to (+inf, -inf) and grow:
  sphere   -> center +- radius                    (BoundingBox.hpp:67-71)
  wall     -> start and Wall::end() corners       (BoundingBox.hpp:73-77)
  triangle -> the three vertices (skipped if any coordinate is non-finite,
              with a warning)                     (BoundingBox.hpp:49-65)
  bare Plane -> silently SKIPPED by the dynamic-cast dispatcher
              (BoundingBox.hpp:87-95) — infinite extent; reference scenes
              never put a bare Plane in the BVH. We mirror that: planes
              contribute nothing to boxes and a warning is emitted.
"""

from __future__ import annotations

import warnings
from typing import Tuple

import numpy as np

from raytracer_tpu.core.scene import (FlatScene, SPHERE, PLANE, WALL, TRIANGLE,
                                      wall_end)


def shape_aabbs(scene: FlatScene) -> Tuple[np.ndarray, np.ndarray]:
    """Per-shape AABBs, shape (N, 3) min / max. Planes get (+inf, -inf)
    (empty) boxes, matching the reference's skip."""
    st = np.asarray(scene.shape_type)
    n = st.shape[0]
    mins = np.full((n, 3), np.inf, np.float32)
    maxs = np.full((n, 3), -np.inf, np.float32)

    sph = st == SPHERE
    if sph.any():
        c = np.asarray(scene.sphere_center)[sph]
        r = np.asarray(scene.sphere_radius)[sph][:, None]
        mins[sph] = c - r
        maxs[sph] = c + r

    wl = st == WALL
    if wl.any():
        start = np.asarray(scene.wall_start)[wl]
        end = np.asarray(wall_end(scene, wl))
        mins[wl] = np.minimum(start, end)
        maxs[wl] = np.maximum(start, end)

    tri = st == TRIANGLE
    if tri.any():
        p = np.stack([np.asarray(scene.tri_p1)[tri],
                      np.asarray(scene.tri_p2)[tri],
                      np.asarray(scene.tri_p3)[tri]], axis=1)  # (T,3,3)
        finite = np.isfinite(p).all(axis=(1, 2))
        if not finite.all():
            warnings.warn("Invalid (non-finite) triangle vertices skipped in "
                          "AABB growth (BoundingBox.hpp:57-64)")
        pm = np.where(finite[:, None, None], p, np.inf)
        px = np.where(finite[:, None, None], p, -np.inf)
        mins[tri] = pm.min(axis=1)
        maxs[tri] = px.max(axis=1)

    if (st == PLANE).any():
        warnings.warn("bare Plane shapes have infinite extent and are "
                      "skipped by AABB growth (BoundingBox.hpp:87-95); do "
                      "not put them in a BVH")
    return mins, maxs


def shape_centers(scene: FlatScene) -> np.ndarray:
    """Split-plane centers used by the BVH partition (src/main.cpp:1127-1153):
    sphere -> center; wall -> (start + end())/2; triangle -> centroid
    (a+b+c)/3 (triangle.hpp:27-29). Bare Plane keeps an UNINITIALIZED center
    in the reference (main.cpp:1129 — `glm::vec3 center;`); we use zeros and
    warn via shape_aabbs."""
    st = np.asarray(scene.shape_type)
    n = st.shape[0]
    centers = np.zeros((n, 3), np.float32)
    sph = st == SPHERE
    centers[sph] = np.asarray(scene.sphere_center)[sph]
    wl = st == WALL
    if wl.any():
        start = np.asarray(scene.wall_start)[wl]
        end = np.asarray(wall_end(scene, wl))
        centers[wl] = (start + end) * 0.5
    tri = st == TRIANGLE
    if tri.any():
        centers[tri] = (np.asarray(scene.tri_p1)[tri]
                        + np.asarray(scene.tri_p2)[tri]
                        + np.asarray(scene.tri_p3)[tri]) / 3.0
    return centers


# ---------------------------------------------------------------------------
# jnp variants (traceable) for on-device per-frame rebuilds.

import jax.numpy as jnp


def wall_end_jnp(normal, start, width, height):
    """Wall::end() (wall.hpp:16-31) as a traceable function; inputs (N,3)/
    (N,)."""
    n = normal
    use_x = jnp.abs(n[:, 0]) > jnp.abs(n[:, 1])
    zeros = jnp.zeros_like(n[:, 0])
    t1 = jnp.where(use_x[:, None],
                   jnp.stack([-n[:, 2], zeros, n[:, 0]], -1),
                   jnp.stack([zeros, -n[:, 2], n[:, 1]], -1))
    t1n = jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t1 = t1 / jnp.where(t1n > 0, t1n, 1.0)
    t2 = jnp.cross(n, t1)
    t2n = jnp.linalg.norm(t2, axis=-1, keepdims=True)
    t2 = t2 / jnp.where(t2n > 0, t2n, 1.0)
    return start + width[:, None] * t1 + height[:, None] * t2


def shape_aabbs_jnp(scene):
    """Traceable per-shape AABBs ((N,3) min/max). Bare planes get ZERO
    boxes (they must not enter a rebuilt BVH; reference scenes never put
    them in one — BoundingBox.hpp:87-95)."""
    from raytracer_tpu.core.scene import SPHERE, PLANE, WALL, TRIANGLE

    st = scene.shape_type
    c = scene.sphere_center
    r = scene.sphere_radius[:, None]
    sph_min, sph_max = c - r, c + r

    end = wall_end_jnp(scene.plane_normal, scene.wall_start,
                       scene.wall_width, scene.wall_height)
    wall_min = jnp.minimum(scene.wall_start, end)
    wall_max = jnp.maximum(scene.wall_start, end)

    tri_min = jnp.minimum(jnp.minimum(scene.tri_p1, scene.tri_p2),
                          scene.tri_p3)
    tri_max = jnp.maximum(jnp.maximum(scene.tri_p1, scene.tri_p2),
                          scene.tri_p3)

    is_s = (st == SPHERE)[:, None]
    is_w = (st == WALL)[:, None]
    is_t = (st == TRIANGLE)[:, None]
    mins = jnp.where(is_s, sph_min,
                     jnp.where(is_w, wall_min,
                               jnp.where(is_t, tri_min, 0.0)))
    maxs = jnp.where(is_s, sph_max,
                     jnp.where(is_w, wall_max,
                               jnp.where(is_t, tri_max, 0.0)))
    return mins, maxs


def shape_centers_jnp(scene):
    """Traceable split/Morton centers (main.cpp:1127-1153 semantics)."""
    from raytracer_tpu.core.scene import SPHERE, WALL, TRIANGLE

    st = scene.shape_type
    end = wall_end_jnp(scene.plane_normal, scene.wall_start,
                       scene.wall_width, scene.wall_height)
    wall_c = (scene.wall_start + end) * 0.5
    tri_c = (scene.tri_p1 + scene.tri_p2 + scene.tri_p3) / 3.0
    is_s = (st == SPHERE)[:, None]
    is_w = (st == WALL)[:, None]
    is_t = (st == TRIANGLE)[:, None]
    return jnp.where(is_s, scene.sphere_center,
                     jnp.where(is_w, wall_c,
                               jnp.where(is_t, tri_c, 0.0)))
