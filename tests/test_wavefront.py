"""BVH wavefront renderer parity vs the brute-force oracle.

The correct oracle for useBVH=true is the brute-force scan WITH per-shape
leaf-box gating (accel.linearize.shape_leaf_boxes): BVH traversal only sees
a shape when its leaf AABB is hit, which visibly clips scene 1's
infinite-plane floor wall — reference behavior, not a bug."""

import numpy as np
import pytest

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.accel.linearize import shape_leaf_boxes
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import wavefront
from raytracer_tpu.render.reference import render as render_ref
from raytracer_tpu.scenes import generate_scene1, generate_scene3

CFG = RenderConfig(width=48, height=36, max_bounces=3, use_bvh=True,
                   ray_chunk=432)


@pytest.mark.parametrize("use_mt", [False, True])
def test_scene1_bvh_matches_box_oracle(use_mt):
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    cfg = CFG.replace(use_mt=use_mt)
    img_bvh = np.asarray(wavefront.render(sc.flat, bvh, sc.camera, sc.light,
                                          cfg))
    lb = shape_leaf_boxes(bvh, sc.num_shapes)
    img_oracle = np.asarray(render_ref(sc.flat, sc.camera, sc.light, cfg,
                                       leaf_boxes=lb))
    np.testing.assert_allclose(img_bvh, img_oracle, atol=2e-5)


def test_scene1_bvh_fresnel_matches(use_mt=False):
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    cfg = CFG.replace(use_fresnel=True, width=32, height=24, ray_chunk=256)
    img_bvh = np.asarray(wavefront.render(sc.flat, bvh, sc.camera, sc.light,
                                          cfg))
    lb = shape_leaf_boxes(bvh, sc.num_shapes)
    img_oracle = np.asarray(render_ref(sc.flat, sc.camera, sc.light, cfg,
                                       leaf_boxes=lb))
    np.testing.assert_allclose(img_bvh, img_oracle, atol=2e-5)


def test_scene3_trivial_bvh():
    sc = generate_scene3()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    assert bvh.num_nodes == 1
    img_bvh = np.asarray(wavefront.render(sc.flat, bvh, sc.camera, sc.light,
                                          CFG))
    lb = shape_leaf_boxes(bvh, sc.num_shapes)
    img_oracle = np.asarray(render_ref(sc.flat, sc.camera, sc.light, CFG,
                                       leaf_boxes=lb))
    np.testing.assert_allclose(img_bvh, img_oracle, atol=2e-5)


def test_bvh_differs_from_linear_scan_only_by_leaf_clipping():
    """Without box gating the images differ exactly where the infinite
    floor extends beyond its leaf box."""
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    img_bvh = np.asarray(wavefront.render(sc.flat, bvh, sc.camera, sc.light,
                                          CFG))
    img_plain = np.asarray(render_ref(sc.flat, sc.camera, sc.light, CFG))
    assert np.abs(img_bvh - img_plain).max() > 1e-3  # the clip is visible
