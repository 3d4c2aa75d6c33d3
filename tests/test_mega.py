"""Full-Whitted megakernel parity (interpret mode)."""

import numpy as np
import pytest

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import pallas_mega, wavefront
from raytracer_tpu.scenes import generate_scene1, generate_scene3

CFG = RenderConfig(width=32, height=24, max_bounces=3, ray_chunk=768,
                   tile_h=8, tile_w=128)


@pytest.mark.parametrize("kw", [{}, {"use_fresnel": True}, {"use_mt": True},
                                {"enable_shadows": False}])
def test_mega_matches_wavefront_scene1(kw):
    sc = generate_scene1()
    lin = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    cfg = CFG.replace(**kw)
    img_w = np.asarray(wavefront.render(sc.flat, lin, sc.camera, sc.light,
                                        cfg))
    img_m = np.asarray(pallas_mega.render(sc.flat, lin, sc.camera,
                                          sc.light, cfg))
    np.testing.assert_allclose(img_m, img_w, atol=1e-4)


def test_mega_scene3():
    sc = generate_scene3()
    lin = linearize(build_bvh(sc.flat, 0))
    img_w = np.asarray(wavefront.render(sc.flat, lin, sc.camera, sc.light,
                                        CFG))
    img_m = np.asarray(pallas_mega.render(sc.flat, lin, sc.camera,
                                          sc.light, CFG))
    np.testing.assert_allclose(img_m, img_w, atol=1e-4)
