"""Camera tests against reference semantics (src/camera.hpp)."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core import camera as cam


def test_default_orientation():
    # yaw -90, pitch 0 -> front (0,0,-1), right (1,0,0), up (0,1,0)
    c = cam.from_euler()
    np.testing.assert_allclose(np.asarray(c.front), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.right), [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.up), [0, 1, 0], atol=1e-6)


def test_look_at():
    c = cam.from_euler(position=(0, 0, 10))
    c = cam.look_at(c, (0, 0, 0))
    np.testing.assert_allclose(np.asarray(c.front), [0, 0, -1], atol=1e-6)
    c2 = cam.look_at(cam.from_euler(position=(10, 0, 0)), (0, 0, 0))
    np.testing.assert_allclose(np.asarray(c2.front), [-1, 0, 0], atol=1e-6)


def test_center_ray_is_front():
    c = cam.from_euler(position=(1, 2, 3), fov_deg=60, aspect=4 / 3)
    o, d = cam.get_rays(c, jnp.float32(0), jnp.float32(0))
    np.testing.assert_allclose(np.asarray(o), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), np.asarray(c.front), atol=1e-6)


def test_corner_ray_fov():
    # ndc (0, 1): image-plane point = pos + front + tan(fov/2)*up
    c = cam.from_euler(fov_deg=60, aspect=1)
    _, d = cam.get_rays(c, jnp.float32(0), jnp.float32(1))
    expected = np.array([0, np.tan(np.deg2rad(30)), -1])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(np.asarray(d), expected, atol=1e-6)


def test_pixel_ndc_flip():
    # reference: ndc = (2x/W - 1, 1 - 2y/H)  (main.cpp:852)
    nx, ny = cam.pixel_ndc(4, 2)
    assert nx.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(nx[0]), [-1, -0.5, 0, 0.5])
    np.testing.assert_allclose(np.asarray(ny[:, 0]), [1, 0])


def test_move_up_is_negative_up():
    # reference quirk: UP subtracts Up (camera.hpp:86-89)
    c = cam.from_euler(position=(0, 0, 0))
    c2 = cam.move(c, "up", delta_time=1.0, speed=1.0)
    assert float(c2.position[1]) < 0


def test_mouse_look_pitch_clamp():
    c = cam.from_euler()
    c2 = cam.mouse_look(c, 0.0, 10000.0)  # huge upward offset
    _, pitch = cam.yaw_pitch_of(c2)
    assert abs(float(pitch) - 89.0) < 1e-3
