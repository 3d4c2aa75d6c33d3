"""On-device animated pipeline (render/dynamic.py)."""

import jax
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render.dynamic import make_frame_fn
from raytracer_tpu.scenes import generate_scene1

CFG = RenderConfig(width=32, height=24, max_bounces=2, ray_chunk=768,
                   tile_h=8, tile_w=128)


def test_animated_frames_differ_and_converge():
    sc = generate_scene1()
    frame = make_frame_fn(sc, CFG, renderer="wavefront")
    flat = sc.flat
    img0, flat = jax.block_until_ready(frame(flat, sc.camera, sc.light,
                                             0.0, 1 / 30))
    img1, flat = jax.block_until_ready(frame(flat, sc.camera, sc.light,
                                             0.8, 1 / 30))
    a, b = np.asarray(img0), np.asarray(img1)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-3  # spheres moved

    # same elapsed time -> same image (bounce is absolute-time)
    img0b, _ = frame(sc.flat, sc.camera, sc.light, 0.0, 1 / 30)
    np.testing.assert_allclose(np.asarray(img0b), a, atol=1e-6)


def test_animated_pallas_matches_wavefront():
    sc = generate_scene1()
    f_w = make_frame_fn(sc, CFG, renderer="wavefront")
    f_p = make_frame_fn(sc, CFG, renderer="pallas")
    iw, _ = f_w(sc.flat, sc.camera, sc.light, 0.5, 1 / 30)
    ip, _ = f_p(sc.flat, sc.camera, sc.light, 0.5, 1 / 30)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(iw), atol=2e-5)
