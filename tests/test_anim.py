"""Animation tests (reference: main.cpp:1079-1109)."""

import numpy as np

from raytracer_tpu.anim import animate_scene, bounce_spheres, rotate_wheels
from raytracer_tpu.scenes import generate_scene1, generate_scene2


def test_bounce_sphere_formula():
    sc = generate_scene1()
    t = 1.7
    flat2 = bounce_spheres(sc.flat, sc.bounce_params, t)
    for idx, amp, freq in sc.bounce_params:
        y0 = float(sc.flat.origin[idx, 1])
        expected = y0 + amp * np.sin(freq * t)
        assert np.isclose(float(flat2.sphere_center[idx, 1]), expected,
                          atol=1e-5)
        # x/z untouched
        np.testing.assert_allclose(np.asarray(flat2.sphere_center[idx, ::2]),
                                   np.asarray(sc.flat.sphere_center[idx, ::2]))
    # non-animated spheres untouched
    np.testing.assert_array_equal(np.asarray(flat2.sphere_center[3]),
                                  np.asarray(sc.flat.sphere_center[3]))


def test_wheel_rotation_preserves_center_distance():
    sc = generate_scene2()
    flat2 = rotate_wheels(sc.flat, sc.wheels, delta_time=0.3)
    w = sc.wheels[0]
    idx = np.asarray(w["indices"])
    c = np.asarray(w["center"])
    before = np.asarray(sc.flat.tri_p1)[idx] - c
    after = np.asarray(flat2.tri_p1)[idx] - c
    np.testing.assert_allclose(np.linalg.norm(before, axis=-1),
                               np.linalg.norm(after, axis=-1), rtol=1e-4)
    # z preserved (rotation about z axis)
    np.testing.assert_allclose(before[:, 2], after[:, 2], atol=1e-5)
    # actually rotated
    assert np.abs(before[:, :2] - after[:, :2]).max() > 1e-3


def test_wheel_rotation_stale_plane_quirk():
    """plane_normal / plane_d must NOT change (main.cpp:1101-1106 quirk)."""
    sc = generate_scene2()
    flat2 = rotate_wheels(sc.flat, sc.wheels, delta_time=0.5)
    np.testing.assert_array_equal(np.asarray(flat2.plane_normal),
                                  np.asarray(sc.flat.plane_normal))
    np.testing.assert_array_equal(np.asarray(flat2.plane_d),
                                  np.asarray(sc.flat.plane_d))


def test_wheel_rotation_refresh_planes():
    sc = generate_scene2()
    flat2 = rotate_wheels(sc.flat, sc.wheels, delta_time=0.5,
                          refresh_planes=True)
    idx = np.asarray(sc.wheels[0]["indices"])
    assert np.abs(np.asarray(flat2.plane_normal)[idx]
                  - np.asarray(sc.flat.plane_normal)[idx]).max() > 1e-4
    # untouched triangles (body/road) keep their planes
    body = [i for i in range(2000)]
    np.testing.assert_array_equal(np.asarray(flat2.plane_normal)[body],
                                  np.asarray(sc.flat.plane_normal)[body])


def test_animate_scene_dispatch():
    s1 = generate_scene1()
    f1 = animate_scene(s1, s1.flat, elapsed_time=2.0, delta_time=0.1)
    assert np.abs(np.asarray(f1.sphere_center)
                  - np.asarray(s1.flat.sphere_center)).max() > 1e-3
    s2 = generate_scene2()
    f2 = animate_scene(s2, s2.flat, elapsed_time=2.0, delta_time=0.1)
    assert np.abs(np.asarray(f2.tri_p1)
                  - np.asarray(s2.flat.tri_p1)).max() > 1e-4
