"""Model/Mesh convenience layer (io/model.py) + scene-2 smoke render."""

import numpy as np
import pytest

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.core.types import Material
from raytracer_tpu.io.model import Model
from raytracer_tpu.render import wavefront
from raytracer_tpu.render.reference import render as render_ref
from raytracer_tpu.scenes import generate_scene2

OBJ = """
o cube_face
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
f 1 2 3 4
o lone
v 3 3 3
v 4 3 3
v 3 4 3
f 5 6 7
"""


def test_model_load_and_place(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(OBJ)
    m = Model(str(p))
    assert len(m) == 2
    assert m.meshes[0].num_triangles == 2
    m.meshes[0].origin = np.array([10, 0, 0], np.float32)
    world = m.meshes[0].world_triangles()
    assert world[:, :, 0].min() >= 10.0

    b = SceneBuilder()
    ids = m.meshes[0].add_to(b, Material(color=(1, 0, 0)))
    assert len(ids) == 2
    s = b.build()
    assert s.num_shapes == 2


OBJ_FULL = """
o quad
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
o bare
v 0 0 5
v 1 0 5
v 0 1 5
f 5 6 7
"""


def test_full_attributes(tmp_path):
    """load_obj_full extracts the reference's processMesh attribute set
    (positions/normals/UVs/tangents, model.hpp:86-168) with the Assimp
    postprocess semantics (FlipUVs, GenSmoothNormals, CalcTangentSpace)."""
    from raytracer_tpu.io.obj import load_obj_full

    p = tmp_path / "full.obj"
    p.write_text(OBJ_FULL)
    meshes = load_obj_full(str(p))
    quad = meshes["quad"]
    assert quad.positions.shape == (2, 3, 3)
    # explicit vn used, unit-normalized
    np.testing.assert_allclose(quad.normals, [[[0, 0, 1]] * 3] * 2)
    # FlipUVs: v -> 1-v, so vt (0,0) becomes (0,1)
    np.testing.assert_allclose(quad.uvs[0, 0], [0, 1])
    # tangent space: +X-aligned tangent for this parameterization, and
    # orthogonal to the normal
    np.testing.assert_allclose(quad.tangents[0, 0], [1, 0, 0], atol=1e-6)
    assert abs(np.dot(quad.tangents[0, 0], quad.normals[0, 0])) < 1e-6
    assert np.linalg.norm(quad.bitangents[0, 0]) > 0.99

    # mesh without vn/vt: smooth normals generated, zero UVs/tangents
    bare = meshes["bare"]
    n = bare.normals[0, 0]
    np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(bare.uvs, 0.0)
    np.testing.assert_allclose(bare.tangents, 0.0)


def test_smooth_normals_shared_vertices(tmp_path):
    """GenSmoothNormals analogue: a vertex shared by two slanted faces
    gets the area-weighted average normal, not either face normal."""
    from raytracer_tpu.io.obj import load_obj_full

    # two triangles sharing edge (v1, v3), tilted like a tent
    p = tmp_path / "tent.obj"
    p.write_text("""
v 0 0 0
v 1 0 1
v 0 1 0
v -1 0 1
f 1 2 3
f 1 3 4
""")
    m = load_obj_full(str(p))["default"]
    # shared corner v1 appears in both triangles with the SAME smoothed
    # normal
    n_a = m.normals[0, 0]
    n_b = m.normals[1, 0]
    np.testing.assert_allclose(n_a, n_b, atol=1e-6)
    # and it is unit length; the two face normals (-1,0,1)/sqrt2 and
    # (1,0,1)/sqrt2 average to +z exactly
    assert abs(np.linalg.norm(n_a) - 1) < 1e-6
    np.testing.assert_allclose(n_a, [0, 0, 1], atol=1e-6)


def test_model_attributes_flag(tmp_path):
    p = tmp_path / "full.obj"
    p.write_text(OBJ_FULL)
    m = Model(str(p), attributes=True)
    assert len(m) == 2
    quad = m.meshes[0]
    assert quad.normals is not None and quad.uvs is not None
    assert quad.triangles.shape == quad.normals.shape
    # attribute-loaded meshes still feed the geometry pipeline identically
    b = SceneBuilder()
    ids = quad.add_to(b, Material(color=(1, 1, 1)))
    assert len(ids) == 2


def test_scene2_smoke_render():
    """4122-shape car scene renders through the BVH path and shows
    non-background content."""
    sc = generate_scene2()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    cfg = RenderConfig(width=24, height=18, max_bounces=1, ray_chunk=432)
    img = np.asarray(wavefront.render(sc.flat, bvh, sc.camera, sc.light,
                                      cfg))
    assert np.isfinite(img).all()
    from raytracer_tpu.render import shading
    import jax.numpy as jnp
    ys = np.arange(cfg.height) / cfg.height
    bg = np.broadcast_to(
        np.asarray(shading.background(jnp.asarray(ys)))[:, None, :],
        img.shape)
    assert (np.abs(img - bg).max(-1) > 1e-3).sum() > 20
