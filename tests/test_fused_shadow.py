"""Fused closest+shadow kernel (pallas_split.USE_FUSED_SHADOW): one pallas
launch per bounce must render bit-identically to the two-launch path —
the shadow ray is derived in-kernel with exactly whitted.trace's formulas
(origin p + n*shadow_eps, direction normalize(light-p, eps=1e-30),
occluded iff hit distance < light distance; gpu_shader.comp:466-480)."""

import numpy as np
import pytest

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import pallas_split
from raytracer_tpu.scenes import generate_scene1, generate_scene2


@pytest.fixture
def fused_flag():
    old = pallas_split.USE_FUSED_SHADOW
    yield
    pallas_split.USE_FUSED_SHADOW = old
    pallas_split._render_impl.clear_cache()


def _pair(sc, cfg):
    lin = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, lin, tri_max_depth=20)
    pallas_split.USE_FUSED_SHADOW = False
    pallas_split._render_impl.clear_cache()
    base = np.asarray(pallas_split.render(sc.flat, lin, sc.camera,
                                          sc.light, cfg, split=split))
    pallas_split.USE_FUSED_SHADOW = True
    pallas_split._render_impl.clear_cache()
    fused = np.asarray(pallas_split.render(sc.flat, lin, sc.camera,
                                           sc.light, cfg, split=split))
    return base, fused


@pytest.mark.parametrize("kw", [
    {},
    {"use_fresnel": False},
    {"use_mt": True},
])
def test_scene1_fused_matches_twolaunch(fused_flag, kw):
    cfg = RenderConfig(width=48, height=36, max_bounces=3,
                       tile_h=8, tile_w=128, **kw)
    base, fused = _pair(generate_scene1(), cfg)
    np.testing.assert_allclose(fused, base, atol=1e-6)


def test_scene2_fused_matches_twolaunch(fused_flag):
    cfg = RenderConfig(width=24, height=18, max_bounces=2,
                       tile_h=8, tile_w=128)
    base, fused = _pair(generate_scene2(), cfg)
    np.testing.assert_allclose(fused, base, atol=1e-6)


def test_shadows_disabled_ignores_fused(fused_flag):
    """With shadows off the fused path must not engage (no wasted second
    traversal, identical image)."""
    cfg = RenderConfig(width=32, height=24, max_bounces=2,
                       enable_shadows=False, tile_h=8, tile_w=128)
    base, fused = _pair(generate_scene1(), cfg)
    np.testing.assert_allclose(fused, base, atol=0.0)
