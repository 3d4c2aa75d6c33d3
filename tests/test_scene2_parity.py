"""Scene-2 (car, 4122 shapes) cross-renderer parity at small resolution —
exercises the BVH depth-25 path, mixed wheel/road/sphere materials, and
the kernels at the largest shape count."""

import numpy as np
import pytest

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.accel.linearize import shape_leaf_boxes
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import pallas_split, wavefront
from raytracer_tpu.render.reference import render as render_ref
from raytracer_tpu.scenes import generate_scene2

CFG = RenderConfig(width=24, height=18, max_bounces=2, use_bvh=True,
                   ray_chunk=432, tile_h=8, tile_w=128)


@pytest.fixture(scope="module")
def scene2():
    sc = generate_scene2()
    lin = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    return sc, lin


def test_wavefront_matches_box_oracle(scene2):
    sc, lin = scene2
    img_w = np.asarray(wavefront.render(sc.flat, lin, sc.camera, sc.light,
                                        CFG))
    lb = shape_leaf_boxes(lin, sc.num_shapes)
    img_o = np.asarray(render_ref(sc.flat, sc.camera, sc.light, CFG,
                                  leaf_boxes=lb))
    np.testing.assert_allclose(img_w, img_o, atol=2e-5)


def test_split_kernel_matches_wavefront(scene2):
    """Full 4122-shape scene through the production kernel. One bounce:
    interpret-mode cost is per-wave, and traversal/pre-pass coverage at
    this shape count is identical per wave (multi-bounce parity is pinned
    on scene 1 and the subset below)."""
    sc, lin = scene2
    cfg = CFG.replace(max_bounces=1)
    img_w = np.asarray(wavefront.render(sc.flat, lin, sc.camera, sc.light,
                                        cfg))
    img_s = np.asarray(pallas_split.render(sc.flat, lin, sc.camera,
                                           sc.light, cfg))
    np.testing.assert_allclose(img_s, img_w, atol=1e-4)


def test_split_kernel_mt_matches_wavefront_subset(scene2):
    """Moller-Trumbore in-kernel triangle test on scene-2 geometry: a
    1-in-4 / 1-in-8 subset keeps every type interaction at ~10x less
    interpret cost than the full scene."""
    sc, _ = scene2
    st = np.asarray(sc.flat.shape_type)
    keep = np.sort(np.concatenate([np.flatnonzero(st != 3)[::4],
                                   np.flatnonzero(st == 3)[::8]]))
    flat = sc.flat.take(keep)
    lin = linearize(build_bvh(flat, 10))
    cfg = CFG.replace(use_mt=True)
    img_w = np.asarray(wavefront.render(flat, lin, sc.camera, sc.light,
                                        cfg))
    img_s = np.asarray(pallas_split.render(flat, lin, sc.camera,
                                           sc.light, cfg))
    np.testing.assert_allclose(img_s, img_w, atol=1e-4)


def test_scene2_no_degenerate_walls(scene2):
    """Scene 2 has no infinite walls, so BVH and non-BVH images agree
    up to shadow-epsilon differences at the same shadow epsilon."""
    sc, lin = scene2
    img_bvh = np.asarray(wavefront.render(sc.flat, lin, sc.camera,
                                          sc.light, CFG))
    img_plain = np.asarray(render_ref(sc.flat, sc.camera, sc.light, CFG))
    np.testing.assert_allclose(img_bvh, img_plain, atol=2e-5)
