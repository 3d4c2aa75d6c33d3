"""Flat SoA scene representation + host-side scene builder.

The reference serializes polymorphic C++ ``Shape`` objects into a 160-byte
std430 tagged union per shape (``FlatShape``, src/flatStructures.hpp:22-53,
filled by ``serializeShape`` src/main.cpp:994-1066) and uploads an
array-of-structs SSBO. On TPU the idiomatic layout is struct-of-arrays:
each field is a parallel ``jnp`` array over the N shapes, so every
intersection test is a dense vector op over lanes instead of a strided
struct walk.

Field semantics are identical to the reference ABI:

  type          0=sphere 1=plane 2=wall 3=triangle  (flatStructures.hpp:23)
  material.*    color/fresnel/ambient/diffuse/specular/shininess
  sphere        center, radius
  plane         unit normal n, d with plane eq. n.p + d = 0, d = -n.point
                (src/shapes/plane.hpp:28-33)
  wall          start corner, width, height (+ inherited plane fields)
  triangle      p1,p2,p3 (+ inherited plane fields: n = normalize(cross(
                p2-p1, p3-p1)) possibly inverted, d = -n.p1;
                src/shapes/triangle.hpp:84-98)

Unused fields for a given type are zero. ``origin`` mirrors
``Shape::origin`` (sphere center / plane point / wall start / triangle p1)
and is what animations reference (src/main.cpp:1079-1082).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.types import Material

SPHERE, PLANE, WALL, TRIANGLE = 0, 1, 2, 3

_FIELDS = (
    "shape_type",
    "mat_color", "mat_fresnel", "mat_ambient", "mat_diffuse", "mat_specular",
    "mat_shininess",
    "sphere_center", "sphere_radius",
    "plane_normal", "plane_d",
    "wall_start", "wall_width", "wall_height",
    "tri_p1", "tri_p2", "tri_p3",
    "origin", "animated",
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FlatScene:
    """SoA scene arrays over N shapes. All f32 except shape_type (i32) and
    animated (bool)."""

    shape_type: jnp.ndarray       # i32 [N]
    mat_color: jnp.ndarray        # f32 [N, 3]
    mat_fresnel: jnp.ndarray      # f32 [N]
    mat_ambient: jnp.ndarray      # f32 [N]
    mat_diffuse: jnp.ndarray      # f32 [N]
    mat_specular: jnp.ndarray     # f32 [N]
    mat_shininess: jnp.ndarray    # f32 [N]
    sphere_center: jnp.ndarray    # f32 [N, 3]
    sphere_radius: jnp.ndarray    # f32 [N]
    plane_normal: jnp.ndarray     # f32 [N, 3]
    plane_d: jnp.ndarray          # f32 [N]
    wall_start: jnp.ndarray       # f32 [N, 3]
    wall_width: jnp.ndarray       # f32 [N]
    wall_height: jnp.ndarray      # f32 [N]
    tri_p1: jnp.ndarray           # f32 [N, 3]
    tri_p2: jnp.ndarray           # f32 [N, 3]
    tri_p3: jnp.ndarray           # f32 [N, 3]
    origin: jnp.ndarray           # f32 [N, 3]
    animated: jnp.ndarray         # bool [N]

    @property
    def num_shapes(self) -> int:
        return self.shape_type.shape[0]

    def tree_flatten(self):
        return tuple(getattr(self, f) for f in _FIELDS), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def replace(self, **kw) -> "FlatScene":
        return dataclasses.replace(self, **kw)

    def pad_to(self, n: int, pad_type: int = SPHERE) -> "FlatScene":
        """Pad to n shapes with inert entries (zero-radius spheres at the
        origin never produce an INNER hit: discriminant D = (2 d.oc)^2 -
        4|d|^2|oc|^2 <= 0 by Cauchy-Schwarz, and the reference requires
        D > 0 strictly, sphere.hpp:48-50). Used for lane alignment."""
        cur = self.num_shapes
        if n < cur:
            raise ValueError(f"pad_to({n}) below current size {cur}")
        if n == cur:
            return self
        pad = n - cur

        def _pad(arr):
            widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
            return jnp.pad(arr, widths)

        out = {f: _pad(getattr(self, f)) for f in _FIELDS}
        out["shape_type"] = out["shape_type"].at[cur:].set(pad_type)
        return FlatScene(**out)

    def take(self, idx) -> "FlatScene":
        """Gather shapes by index (reorders/slices all parallel arrays)."""
        idx = jnp.asarray(idx)
        return FlatScene(**{f: jnp.take(getattr(self, f), idx, axis=0)
                            for f in _FIELDS})

    def recompute_tri_planes(self) -> "FlatScene":
        """Differentiable plane refresh from triangle vertices — the
        trace of the reference Triangle ctor (src/shapes/triangle.hpp:
        84-130: normal = normalize(cross(p2-p1, p3-p1)), d = -n.p1) so a
        vertex edit/optimization moves the WHOLE triangle geometry
        consistently. Each triangle's original winding ORIENTATION is
        preserved: triangles built with invert_normal or the
        flip-toward-center heuristic keep their flipped sign (taken from
        the currently stored normal, valid while the perturbation does
        not rotate the plane past 90 degrees). NaN-safe for
        non-triangle rows (zero vertices). Required before rendering a
        scene whose tri_p1/p2/p3 were changed WITHOUT SceneBuilder —
        gradients w.r.t. vertices are zero otherwise (plane t and
        shading normals read these stored fields)."""
        e1 = self.tri_p2 - self.tri_p1
        e2 = self.tri_p3 - self.tri_p1
        n = jnp.cross(e1, e2)
        norm2 = jnp.sum(n * n, axis=-1, keepdims=True)
        nn = n * jax.lax.rsqrt(jnp.where(norm2 > 0, norm2, 1.0))
        # preserve original orientation (invert_normal / flip heuristic)
        flip = jnp.where(
            jnp.sum(nn * self.plane_normal, -1, keepdims=True) < 0,
            -1.0, 1.0)
        nn = nn * flip
        is_tri = self.shape_type == TRIANGLE
        pn = jnp.where(is_tri[:, None], nn, self.plane_normal)
        pd = jnp.where(is_tri, -jnp.sum(pn * self.tri_p1, -1),
                       self.plane_d)
        return self.replace(plane_normal=pn, plane_d=pd)


class _BulkRows:
    """Columnar block of ``count`` consecutive shapes (one add_triangles
    call): per-column arrays instead of ``count`` Python dicts, so both the
    append and build() stay vectorized for mesh-sized adds (scene 2 adds
    4022 triangles in two calls)."""

    __slots__ = ("count", "cols")

    def __init__(self, count: int, cols: dict):
        self.count = count
        self.cols = cols                # name -> (count, ...) ndarray


class SceneBuilder:
    """Host-side accumulation of shapes into a FlatScene.

    Plays the role of the reference's ``scene.shapes.push_back`` +
    ``serializeScene`` (src/main.cpp:583-804, 825-846): shapes are appended
    on the host (numpy) and flattened once into device arrays. Entries in
    ``_rows`` are per-shape dicts or columnar ``_BulkRows`` blocks.
    """

    def __init__(self):
        self._rows: List[dict] = []
        self.animated_indices: List[int] = []
        self._n = 0

    def __len__(self):
        return self._n

    def _push(self, row: dict, material: Optional[Material],
              animated: bool) -> int:
        mat = material if material is not None else Material()
        row["mat_color"] = np.asarray(mat.color, np.float32)
        row["mat_fresnel"] = float(mat.fresnel)
        row["mat_ambient"] = float(mat.ambient)
        row["mat_diffuse"] = float(mat.diffuse)
        row["mat_specular"] = float(mat.specular)
        row["mat_shininess"] = float(mat.shininess)
        row["animated"] = animated
        idx = self._n
        self._rows.append(row)
        self._n += 1
        if animated:
            self.animated_indices.append(idx)
        return idx

    def add_sphere(self, center, radius, material: Optional[Material] = None,
                   animated: bool = False) -> int:
        """src/shapes/sphere.hpp:26-31; origin = center."""
        center = np.asarray(center, np.float32)
        return self._push({
            "shape_type": SPHERE,
            "sphere_center": center,
            "sphere_radius": float(radius),
            "origin": center,
        }, material, animated)

    def add_plane(self, normal, point, material: Optional[Material] = None,
                  animated: bool = False) -> int:
        """src/shapes/plane.hpp:28-33: n normalized, d = -n.point,
        origin = point."""
        n = np.asarray(normal, np.float64)
        n = (n / np.linalg.norm(n)).astype(np.float32)
        point = np.asarray(point, np.float32)
        return self._push({
            "shape_type": PLANE,
            "plane_normal": n,
            "plane_d": float(-np.dot(n, point)),
            "origin": point,
        }, material, animated)

    def add_wall(self, start, width, height, normal,
                 material: Optional[Material] = None,
                 animated: bool = False) -> int:
        """src/shapes/wall.hpp:37-40: a Plane through ``start`` bounded to a
        width x height rectangle in the (u, v) basis derived in
        get_intersection (wall.hpp:52-55)."""
        n = np.asarray(normal, np.float64)
        n = (n / np.linalg.norm(n)).astype(np.float32)
        start = np.asarray(start, np.float32)
        return self._push({
            "shape_type": WALL,
            "plane_normal": n,
            "plane_d": float(-np.dot(n, start)),
            "wall_start": start,
            "wall_width": float(width),
            "wall_height": float(height),
            "origin": start,
        }, material, animated)

    def add_triangle(self, p1, p2, p3, material: Optional[Material] = None,
                     invert_normal: bool = False,
                     animated: bool = False) -> int:
        """src/shapes/triangle.hpp:46,84-98: plane normal =
        normalize(cross(p2-p1, p3-p1)), optionally inverted
        (invert_normal also flips d); d = -n.p1; origin = p1."""
        p1 = np.asarray(p1, np.float32)
        p2 = np.asarray(p2, np.float32)
        p3 = np.asarray(p3, np.float32)
        n = np.cross((p2 - p1).astype(np.float64), (p3 - p1).astype(np.float64))
        norm = np.linalg.norm(n)
        n = (n / norm).astype(np.float32) if norm > 0 else np.zeros(3, np.float32)
        if invert_normal:
            n = -n
        return self._push({
            "shape_type": TRIANGLE,
            "plane_normal": n,
            "plane_d": float(-np.dot(n.astype(np.float64), p1.astype(np.float64))),
            "tri_p1": p1, "tri_p2": p2, "tri_p3": p3,
            "origin": p1,
        }, material, animated)

    def add_triangles(self, vertices: np.ndarray,
                      material: Optional[Material] = None,
                      flip_toward_center: Optional[np.ndarray] = None,
                      animated: bool = False) -> List[int]:
        """Bulk-add triangles from a (T, 3, 3) vertex array (vectorized —
        per-triangle numpy calls dominate scene-2 generation otherwise).

        If ``flip_toward_center`` is given, replicates the mesh-import
        heuristic (src/mesh.hpp:163-189): any triangle whose normal satisfies
        dot(normal, center) > 0 is inverted.
        """
        v = np.asarray(vertices, np.float64)
        p1, p2, p3 = v[:, 0], v[:, 1], v[:, 2]
        n = np.cross(p2 - p1, p3 - p1)
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        n = np.divide(n, norm, out=np.zeros_like(n), where=norm > 0)
        if flip_toward_center is not None:
            c = np.asarray(flip_toward_center, np.float64)
            flip = (n @ c) > 0.0
            n = np.where(flip[:, None], -n, n)
        d = -(n * p1).sum(-1)

        mat = material if material is not None else Material()
        cnt = int(v.shape[0])
        p1f = p1.astype(np.float32)

        def full(val, shape=()):
            return np.broadcast_to(
                np.asarray(val), (cnt,) + shape).copy()

        cols = {
            "shape_type": full(TRIANGLE).astype(np.int32),
            "plane_normal": n.astype(np.float32),
            "plane_d": d.astype(np.float32),
            "tri_p1": p1f,
            "tri_p2": p2.astype(np.float32),
            "tri_p3": p3.astype(np.float32),
            "origin": p1f.copy(),
            "mat_color": full(np.asarray(mat.color, np.float32), (3,)),
            "mat_fresnel": full(np.float32(mat.fresnel)),
            "mat_ambient": full(np.float32(mat.ambient)),
            "mat_diffuse": full(np.float32(mat.diffuse)),
            "mat_specular": full(np.float32(mat.specular)),
            "mat_shininess": full(np.float32(mat.shininess)),
            "animated": full(bool(animated)),
        }
        start = self._n
        self._rows.append(_BulkRows(cnt, cols))
        self._n += cnt
        ids = list(range(start, start + cnt))
        if animated:
            self.animated_indices.extend(ids)
        return ids

    def set_material(self, idx: int, material: Material):
        vals = {
            "mat_color": np.asarray(material.color, np.float32),
            "mat_fresnel": float(material.fresnel),
            "mat_ambient": float(material.ambient),
            "mat_diffuse": float(material.diffuse),
            "mat_specular": float(material.specular),
            "mat_shininess": float(material.shininess),
        }
        pos = 0
        for row in self._rows:
            if isinstance(row, _BulkRows):
                if pos <= idx < pos + row.count:
                    for k, v in vals.items():
                        row.cols[k][idx - pos] = v
                    return
                pos += row.count
            else:
                if pos == idx:
                    row.update(vals)
                    return
                pos += 1
        raise IndexError(idx)

    def build(self) -> FlatScene:
        n = self._n
        if n == 0:
            raise ValueError("empty scene")

        def col(name, shape, dtype, default=0):
            out = np.full((n,) + shape, default, dtype)
            pos = 0
            for row in self._rows:
                if isinstance(row, _BulkRows):
                    if name in row.cols:
                        out[pos:pos + row.count] = row.cols[name]
                    pos += row.count
                else:
                    if name in row:
                        out[pos] = row[name]
                    pos += 1
            return out

        return FlatScene(
            shape_type=jnp.asarray(col("shape_type", (), np.int32)),
            mat_color=jnp.asarray(col("mat_color", (3,), np.float32)),
            mat_fresnel=jnp.asarray(col("mat_fresnel", (), np.float32)),
            mat_ambient=jnp.asarray(col("mat_ambient", (), np.float32)),
            mat_diffuse=jnp.asarray(col("mat_diffuse", (), np.float32)),
            mat_specular=jnp.asarray(col("mat_specular", (), np.float32)),
            mat_shininess=jnp.asarray(col("mat_shininess", (), np.float32)),
            sphere_center=jnp.asarray(col("sphere_center", (3,), np.float32)),
            sphere_radius=jnp.asarray(col("sphere_radius", (), np.float32)),
            plane_normal=jnp.asarray(col("plane_normal", (3,), np.float32)),
            plane_d=jnp.asarray(col("plane_d", (), np.float32)),
            wall_start=jnp.asarray(col("wall_start", (3,), np.float32)),
            wall_width=jnp.asarray(col("wall_width", (), np.float32)),
            wall_height=jnp.asarray(col("wall_height", (), np.float32)),
            tri_p1=jnp.asarray(col("tri_p1", (3,), np.float32)),
            tri_p2=jnp.asarray(col("tri_p2", (3,), np.float32)),
            tri_p3=jnp.asarray(col("tri_p3", (3,), np.float32)),
            origin=jnp.asarray(col("origin", (3,), np.float32)),
            animated=jnp.asarray(col("animated", (), bool, False)),
        )


def wall_end(scene_np: "FlatScene", idx=None) -> np.ndarray:
    """``Wall::end()`` (src/shapes/wall.hpp:16-31): opposite corner computed
    with the *tangent* basis (different from the intersection's (u,v) basis —
    an intentional reference quirk). Used by the BVH build for wall AABBs and
    centers (src/main.cpp:1134-1137, BoundingBox.hpp:73-77).

    Operates on numpy views; vectorized over shapes.
    """
    n = np.asarray(scene_np.plane_normal, np.float32)
    start = np.asarray(scene_np.wall_start, np.float32)
    w = np.asarray(scene_np.wall_width, np.float32)
    h = np.asarray(scene_np.wall_height, np.float32)
    if idx is not None:
        n, start, w, h = n[idx], start[idx], w[idx], h[idx]
    flat = n.ndim == 1
    if flat:
        n, start = n[None], start[None]
        w, h = np.atleast_1d(w), np.atleast_1d(h)
    use_x = np.abs(n[:, 0]) > np.abs(n[:, 1])
    t1 = np.where(use_x[:, None],
                  np.stack([-n[:, 2], np.zeros_like(n[:, 0]), n[:, 0]], -1),
                  np.stack([np.zeros_like(n[:, 0]), -n[:, 2], n[:, 1]], -1))
    t1n = np.linalg.norm(t1, axis=-1, keepdims=True)
    t1 = np.divide(t1, t1n, out=np.zeros_like(t1), where=t1n > 0)
    t2 = np.cross(n, t1)
    t2n = np.linalg.norm(t2, axis=-1, keepdims=True)
    t2 = np.divide(t2, t2n, out=np.zeros_like(t2), where=t2n > 0)
    end = start + w[:, None] * t1 + h[:, None] * t2
    return end[0] if flat else end
