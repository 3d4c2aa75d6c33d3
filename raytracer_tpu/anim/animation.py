"""Animations as pure scene transforms (jit-able).

Reference: bounceSphere (src/main.cpp:1079-1082), updateWheelAnimations
(main.cpp:1084-1109), driven per frame from the render loop
(main.cpp:438-457) with per-frame partial SSBO re-upload (updateScene,
main.cpp:981-992). Here each step is ``scene -> scene`` on the SoA arrays.

QUIRK (preserved): rotating a wheel triangle updates its vertices a/b/c
ONLY — the inherited Plane fields m_normal and d are NEVER recomputed
(main.cpp:1101-1106), and serializeShape then uploads the STALE plane
normal/d alongside the fresh vertices. The GLSL barycentric intersector
consumes planeNormal/planeD (gpu_shader.comp:201-215), so animated wheels
are tested against their original planes in barycentric mode. We reproduce
this exactly by updating tri_p1/2/3 and leaving plane_normal/plane_d
untouched; pass refresh_planes=True for the physically-correct variant.
"""

from __future__ import annotations

from typing import Iterable, List, Tuple

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.scene import FlatScene


def bounce_spheres(scene: FlatScene,
                   bounce_params: Iterable[Tuple[int, float, float]],
                   elapsed_time) -> FlatScene:
    """center.y = origin.y + amplitude * sin(frequency * t)
    (main.cpp:1079-1082). ``bounce_params``: (shape_idx, amplitude, freq).
    """
    t = jnp.asarray(elapsed_time, jnp.float32)
    centers = scene.sphere_center
    for idx, amp, freq in bounce_params:
        new_y = scene.origin[idx, 1] + amp * jnp.sin(freq * t)
        centers = centers.at[idx, 1].set(new_y)
    return scene.replace(sphere_center=centers)


def _rotation_matrix(axis, angle):
    """glm::rotate equivalent: rotation about ``axis`` by ``angle`` rad."""
    axis = jnp.asarray(axis, jnp.float32)
    axis = axis / jnp.linalg.norm(axis)
    x, y, z = axis[0], axis[1], axis[2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    one_c = 1.0 - c
    return jnp.array([
        [c + x * x * one_c, x * y * one_c - z * s, x * z * one_c + y * s],
        [y * x * one_c + z * s, c + y * y * one_c, y * z * one_c - x * s],
        [z * x * one_c - y * s, z * y * one_c + x * s, c + z * z * one_c],
    ], jnp.float32)


def rotate_wheels(scene: FlatScene, wheels: List[dict], delta_time,
                  rotation_speed: float = 1.0,
                  refresh_planes: bool = False) -> FlatScene:
    """Rotate each wheel's triangles about its center by
    rotation_speed * delta_time around the wheel axis (main.cpp:1084-1109):
    p' = T(center) * R(axis, theta) * T(-center) * p.
    """
    angle = jnp.asarray(rotation_speed, jnp.float32) * jnp.asarray(
        delta_time, jnp.float32)
    p1, p2, p3 = scene.tri_p1, scene.tri_p2, scene.tri_p3
    pn, pd = scene.plane_normal, scene.plane_d

    for wheel in wheels:
        idx = jnp.asarray(np.asarray(wheel["indices"], np.int32))
        center = jnp.asarray(wheel["center"], jnp.float32)
        rot = _rotation_matrix(wheel["axis"], angle)

        def xform(p):
            sel = jnp.take(p, idx, axis=0)
            return (sel - center) @ rot.T + center

        a, b, c = xform(p1), xform(p2), xform(p3)
        p1 = p1.at[idx].set(a)
        p2 = p2.at[idx].set(b)
        p3 = p3.at[idx].set(c)
        if refresh_planes:
            n = jnp.cross(b - a, c - a)
            # keep orientation consistent with the (possibly flipped) stale
            # normal so the back-face convention is stable
            n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
            sign = jnp.sign(jnp.sum(n * jnp.take(pn, idx, axis=0), -1,
                                    keepdims=True))
            sign = jnp.where(sign == 0, 1.0, sign)
            n = n * sign
            pn = pn.at[idx].set(n)
            pd = pd.at[idx].set(-jnp.sum(n * a, -1))

    return scene.replace(tri_p1=p1, tri_p2=p2, tri_p3=p3,
                         plane_normal=pn, plane_d=pd)


def animate_scene(scene_meta, flat: FlatScene, elapsed_time, delta_time,
                  refresh_planes: bool = False) -> FlatScene:
    """One animation tick for a scenes.Scene (main.cpp:438-457): bounce the
    scene-1 spheres by absolute time, rotate scene-2 wheels by delta time."""
    if scene_meta.bounce_params:
        flat = bounce_spheres(flat, scene_meta.bounce_params, elapsed_time)
    if scene_meta.wheels:
        flat = rotate_wheels(flat, scene_meta.wheels, delta_time,
                             refresh_planes=refresh_planes)
    return flat
