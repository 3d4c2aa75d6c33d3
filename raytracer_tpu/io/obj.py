"""Minimal OBJ parser.

The reference imports models through Assimp with triangulation
(src/model.hpp:53: aiProcess_Triangulate | GenSmoothNormals | FlipUVs |
CalcTangentSpace) but the render path only ever consumes triangulated
POSITIONS (Mesh::mesh2triangles, src/mesh.hpp:163-189 — normals are
recomputed geometrically per triangle). So a positions-only OBJ parser with
fan triangulation reproduces the consumed behavior.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def load_obj(path: str) -> Dict[str, np.ndarray]:
    """Parse an OBJ file into {object_name: (T, 3, 3) float32 triangles}.

    Supports v / f (with v, v/vt, v/vt/vn, v//vn forms, negative indices),
    o/g object grouping, fan triangulation of n-gons. Everything else is
    ignored.
    """
    verts: List[List[float]] = []
    objects: Dict[str, List] = {}
    current = "default"

    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif tag in ("o", "g") and len(parts) > 1:
                current = parts[1]
            elif tag == "f":
                idx = []
                for p in parts[1:]:
                    s = p.split("/")[0]
                    i = int(s)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                tris = objects.setdefault(current, [])
                for k in range(1, len(idx) - 1):  # fan triangulation
                    tris.append((idx[0], idx[k], idx[k + 1]))

    v = np.asarray(verts, np.float32)
    return {name: v[np.asarray(t, np.int64)]
            for name, t in objects.items() if t}


def obj_to_triangles(path: str) -> np.ndarray:
    """All triangles of all objects concatenated, (T, 3, 3) f32."""
    meshes = load_obj(path)
    if not meshes:
        return np.zeros((0, 3, 3), np.float32)
    return np.concatenate(list(meshes.values()), axis=0)
