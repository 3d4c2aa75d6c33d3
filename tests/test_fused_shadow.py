"""Fused closest+shadow kernel (pallas_split.USE_FUSED_SHADOW): one pallas
launch per bounce must render bit-identically to the two-launch path —
the shadow ray is derived in-kernel with exactly whitted.trace's formulas
(origin p + n*shadow_eps, direction normalize(light-p, eps=1e-30),
occluded iff hit distance < light distance; gpu_shader.comp:466-480)."""

import numpy as np
import pytest

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.core.types import Light, Material
from raytracer_tpu.render import pallas_split
from raytracer_tpu.scenes import generate_scene1, generate_scene2


@pytest.fixture
def fused_flag():
    old = pallas_split.USE_FUSED_SHADOW
    yield
    pallas_split.USE_FUSED_SHADOW = old
    pallas_split._render_impl.clear_cache()


def _small_scene():
    """Sphere + triangle + wall with a shadow-casting layout: covers every
    in-kernel shadow interaction at a fraction of scene 1's interpret cost."""
    b = SceneBuilder()
    b.add_sphere((0, -0.6, -4), 0.7, Material(color=(0.9, 0.2, 0.2),
                 specular=0.6, fresnel=0.5))
    b.add_sphere((1.2, 0.5, -6), 0.8, Material(color=(0.2, 0.9, 0.3)))
    b.add_triangle((-2.5, -1, -5), (-0.5, -1, -5), (-1.5, 1.2, -5))
    b.add_wall((-20, 2, -20), 40, 40, (0, 1, 0))
    scene = b.build()
    cam = cam_ops.from_euler(position=(0, 0, 0), fov_deg=60, aspect=4 / 3)
    light = Light((0, 4, -2), (1, 1, 1), 6.0)
    return scene, cam, light


def _pair(flat, camera, light, cfg, bvh_max_depth=8, tri_max_depth=None):
    lin = linearize(build_bvh(flat, bvh_max_depth))
    split = pallas_split.prepare(flat, lin, tri_max_depth=tri_max_depth)
    pallas_split.USE_FUSED_SHADOW = False
    pallas_split._render_impl.clear_cache()
    base = np.asarray(pallas_split.render(flat, lin, camera, light, cfg,
                                          split=split))
    pallas_split.USE_FUSED_SHADOW = True
    pallas_split._render_impl.clear_cache()
    fused = np.asarray(pallas_split.render(flat, lin, camera, light, cfg,
                                           split=split))
    return base, fused


def test_scene1_fused_matches_twolaunch(fused_flag):
    """Full production scene (spheres + degenerate-basis floor wall +
    1209 triangles), 3 bounces, default knobs."""
    sc = generate_scene1()
    cfg = RenderConfig(width=32, height=24, max_bounces=3,
                       tile_h=8, tile_w=128)
    base, fused = _pair(sc.flat, sc.camera, sc.light, cfg,
                        bvh_max_depth=sc.bvh_max_depth)
    np.testing.assert_allclose(fused, base, atol=1e-6)


@pytest.mark.parametrize("kw", [
    {},
    {"use_fresnel": False},
    {"use_mt": True},
    {"max_bounces": 1},
])
def test_small_scene_fused_matches_twolaunch(fused_flag, kw):
    """Knob coverage (fresnel / MT triangle test / single bounce) on the
    small shadow scene — same contract, ~20x cheaper in interpret mode."""
    scene, cam, light = _small_scene()
    params = dict(width=32, height=24, max_bounces=3, tile_h=8, tile_w=128,
                  use_fresnel=True)
    params.update(kw)
    base, fused = _pair(scene, cam, light, RenderConfig(**params))
    np.testing.assert_allclose(fused, base, atol=1e-6)


def test_scene2_subset_fused_matches_twolaunch(fused_flag):
    """Scene 2's distinguishing load for the fused kernel is its LARGE
    mixed-type pre-pass (100 spheres + walls). A 1-in-4 non-triangle /
    1-in-8 triangle subset keeps that structure; the full scene's
    cross-renderer parity is pinned by test_scene2_parity.py."""
    import numpy as _np

    cfg = RenderConfig(width=24, height=18, max_bounces=2,
                       tile_h=8, tile_w=128)
    sc = generate_scene2()
    st = _np.asarray(sc.flat.shape_type)
    non_tri = _np.flatnonzero(st != 3)[::4]
    tri = _np.flatnonzero(st == 3)[::8]
    flat = sc.flat.take(_np.sort(_np.concatenate([non_tri, tri])))
    base, fused = _pair(flat, sc.camera, sc.light, cfg, tri_max_depth=8)
    np.testing.assert_allclose(fused, base, atol=1e-6)


def test_shadows_disabled_ignores_fused(fused_flag):
    """With shadows off the fused path must not engage (no wasted second
    traversal, identical image)."""
    scene, cam, light = _small_scene()
    cfg = RenderConfig(width=32, height=24, max_bounces=2,
                       enable_shadows=False, tile_h=8, tile_w=128)
    base, fused = _pair(scene, cam, light, cfg)
    np.testing.assert_allclose(fused, base, atol=0.0)
