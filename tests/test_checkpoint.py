"""Checkpoint / resume round-trip (io/checkpoint.py)."""

import numpy as np

from raytracer_tpu.core.scene import _FIELDS
from raytracer_tpu.io.checkpoint import load_scene, save_scene
from raytracer_tpu.scenes import generate_scene3


def test_roundtrip(tmp_path):
    sc = generate_scene3()
    p = str(tmp_path / "ckpt.npz")
    save_scene(p, sc.flat, sc.camera, sc.light,
               extra={"step": np.int32(7), "loss": np.float32(0.25)})
    flat, cam, light, extra = load_scene(p)
    for f in _FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(flat, f)),
                                      np.asarray(getattr(sc.flat, f)))
    np.testing.assert_allclose(np.asarray(cam.position),
                               np.asarray(sc.camera.position))
    np.testing.assert_allclose(np.asarray(light.position),
                               np.asarray(sc.light.position))
    assert int(extra["step"]) == 7
    assert float(extra["loss"]) == 0.25


def test_scene_only(tmp_path):
    sc = generate_scene3()
    p = str(tmp_path / "s.npz")
    save_scene(p, sc.flat)
    flat, cam, light, extra = load_scene(p)
    assert cam is None and light is None and extra == {}
    assert flat.num_shapes == sc.flat.num_shapes
