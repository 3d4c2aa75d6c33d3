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
