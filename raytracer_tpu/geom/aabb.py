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
