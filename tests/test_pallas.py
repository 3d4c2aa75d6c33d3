"""Pallas megakernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import pallas_kernel, wavefront
from raytracer_tpu.render.reference import render as render_ref
from raytracer_tpu.scenes import generate_scene1, generate_scene3

CFG = RenderConfig(width=32, height=24, max_bounces=3, use_bvh=False,
                   ray_chunk=768, tile_h=8, tile_w=128)


def test_scene3_pallas_matches_oracle():
    sc = generate_scene3()
    img_p = np.asarray(pallas_kernel.render(sc.flat, None, sc.camera,
                                            sc.light, CFG))
    img_o = np.asarray(render_ref(sc.flat, sc.camera, sc.light, CFG))
    np.testing.assert_allclose(img_p, img_o, atol=1e-5)


@pytest.mark.parametrize("use_mt,use_fresnel", [(False, False), (True, False),
                                                (False, True)])
def test_scene1_pallas_matches_wavefront(use_mt, use_fresnel):
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    cfg = CFG.replace(use_bvh=True, use_mt=use_mt, use_fresnel=use_fresnel)
    img_p = np.asarray(pallas_kernel.render(sc.flat, bvh, sc.camera,
                                            sc.light, cfg))
    img_w = np.asarray(wavefront.render(sc.flat, bvh, sc.camera, sc.light,
                                        cfg))
    np.testing.assert_allclose(img_p, img_w, atol=1e-4)


def test_type_sort_roundtrip():
    sc = generate_scene1()
    perm, counts = pallas_kernel.sort_scene_by_type(sc.flat)
    assert sum(counts) == sc.num_shapes
    st = np.asarray(sc.flat.shape_type)[np.asarray(perm)]
    assert (np.diff(st) >= 0).all()  # sorted by type
