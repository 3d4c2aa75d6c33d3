"""Oracle renderer behavior tests (reference semantics,
gpu_shader.comp:433-624)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.core.types import Light, Material
from raytracer_tpu.render import shading
from raytracer_tpu.render.cpu_fallback import render as render_cpu
from raytracer_tpu.render.reference import render as render_ref
from raytracer_tpu.scenes import generate_scene3

CFG = RenderConfig(width=64, height=48, max_bounces=3, use_bvh=False,
                   ray_chunk=1024)


def _simple_scene(specular=0.0):
    """One diffuse sphere in front of the camera, light above-front."""
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.0, Material(color=(1, 0, 0), fresnel=0,
                 ambient=0.1, diffuse=1.0, specular=specular))
    scene = b.build()
    cam = cam_ops.from_euler(position=(0, 0, 0), fov_deg=60,
                             aspect=CFG.width / CFG.height)
    light = Light((0, 3, 0), (1, 1, 1), 5.0)
    return scene, cam, light


def test_background_on_miss():
    scene, cam, light = _simple_scene()
    # aim camera away from the sphere
    cam = cam_ops.look_at(cam, (0, 0, 10))
    img = np.asarray(render_ref(scene, cam, light, CFG))
    ys = np.arange(CFG.height) / CFG.height
    expected = np.asarray(shading.background(jnp.asarray(ys)))
    np.testing.assert_allclose(img, np.broadcast_to(
        expected[:, None, :], img.shape), atol=1e-5)


def test_sphere_visible_and_red():
    scene, cam, light = _simple_scene()
    img = np.asarray(render_ref(scene, cam, light, CFG))
    cy, cx = CFG.height // 2, CFG.width // 2
    center = img[cy, cx]
    assert center[0] > 0.05          # lit red channel
    assert center[1] < 1e-6 and center[2] < 1e-6  # red material kills G/B


def test_diffuse_terminates_one_bounce():
    # specular == 0 -> no reflection ray -> bounces beyond 1 change nothing
    scene, cam, light = _simple_scene(specular=0.0)
    img1 = np.asarray(render_ref(scene, cam, light, CFG.replace(max_bounces=1)))
    img3 = np.asarray(render_ref(scene, cam, light, CFG.replace(max_bounces=3)))
    np.testing.assert_allclose(img1, img3, atol=1e-6)


def test_specular_adds_reflection():
    scene, cam, light = _simple_scene(specular=0.5)
    img1 = np.asarray(render_ref(scene, cam, light, CFG.replace(max_bounces=1)))
    img3 = np.asarray(render_ref(scene, cam, light, CFG.replace(max_bounces=3)))
    assert np.abs(img1 - img3).max() > 1e-4


def test_shadow_factor():
    """An occluder between light and floor darkens the floor point by x0.3.

    Geometry honors the y-down back-face convention: the floor at y=+2 with
    n=(0,1,0) is INNER for downward (+y) camera rays; the occluder at y=1
    with n=(0,-1,0) is INNER only for upward (-y) shadow rays, so it blocks
    light without being visible to the camera. Both walls use the
    degenerate-basis (infinite plane) quirk.
    """
    b = SceneBuilder()
    b.add_wall((-50, 2, -50), 100, 100, (0, 1, 0),
               Material(color=(1, 1, 1), ambient=0.0, diffuse=1.0,
                        specular=0.0))
    scene_open = b.build()
    # occluder plane at y=3, BEYOND the floor from the camera (so primary
    # rays find the floor first) but between floor and the light at y=5:
    # shadow rays travel +y and hit it INNER (n=(0,1,0), degenerate basis).
    b.add_wall((-2, 3, -7), 4, 4, (0, 1, 0),
               Material(color=(1, 1, 1), specular=0.0))
    scene_blocked = b.build()

    cam = cam_ops.from_euler(position=(0, 0, 0), aspect=1.0)
    cam = cam_ops.look_at(cam, (0, 2, -5))
    light = Light((0, 5, -5), (1, 1, 1), 10.0)
    cfg = RenderConfig(width=32, height=32, max_bounces=1, use_bvh=False,
                       ray_chunk=1024)
    img_open = np.asarray(render_ref(scene_open, cam, light, cfg))
    img_blk = np.asarray(render_ref(scene_blocked, cam, light, cfg))
    c = 16
    po, pb = img_open[c, c], img_blk[c, c]
    assert po.max() > 1e-3, "floor not visible — test geometry broken"
    ratio = pb / np.maximum(po, 1e-9)
    np.testing.assert_allclose(ratio, shading.SHADOW_FACTOR, atol=1e-3)


def test_fresnel_mode_differs():
    scene, cam, light = _simple_scene(specular=0.5)
    img = np.asarray(render_ref(scene, cam, light, CFG))
    imgf = np.asarray(render_ref(scene, cam, light,
                                 CFG.replace(use_fresnel=True)))
    assert np.abs(img - imgf).max() > 1e-5


def test_mt_matches_barycentric_primary_hits():
    """MT and barycentric agree on primary visibility for back-face (INNER)
    hits. Compared through the CPU fallback (no shadow pass) because the
    GPU shadow pass DIFFERS between the modes by design: MT is double-sided,
    so a surface whose normal points away from the light re-intersects
    itself at t ~ epsilon and self-shadows (reference behavior of
    gpu_shader.comp:170-195 + :469)."""
    sc = generate_scene3()
    cfg = CFG.replace(max_bounces=1)
    img_b = np.asarray(render_cpu(sc.flat, sc.camera, sc.light, cfg))
    img_m = np.asarray(render_cpu(sc.flat, sc.camera, sc.light,
                                  cfg.replace(use_mt=True)))
    # the two tests make independent fp edge decisions; allow a couple of
    # boundary pixels to flip, everything else must agree
    diff = np.abs(img_b - img_m).max(axis=-1)
    assert (diff > 1e-4).sum() <= 2
    both = (img_b.max(-1) > 0) & (img_m.max(-1) > 0)
    np.testing.assert_allclose(img_b[both], img_m[both], atol=1e-3)


def test_mt_self_shadow_quirk():
    """In MT mode scene3's triangle (normal away from the light)
    self-shadows: every hit pixel is exactly x0.3 of the barycentric
    render."""
    sc = generate_scene3()
    cfg = CFG.replace(max_bounces=1)
    img_b = np.asarray(render_ref(sc.flat, sc.camera, sc.light, cfg))
    img_m = np.asarray(render_ref(sc.flat, sc.camera, sc.light,
                                  cfg.replace(use_mt=True)))
    # restrict to pixels the triangle covers in BOTH modes (edge pixels can
    # flip between the tests); use the shadow-free CPU renders as the mask
    cb = np.asarray(render_cpu(sc.flat, sc.camera, sc.light, cfg))
    cm = np.asarray(render_cpu(sc.flat, sc.camera, sc.light,
                               cfg.replace(use_mt=True)))
    hit = (cb.max(-1) > 0) & (cm.max(-1) > 0)
    assert hit.sum() > 5
    np.testing.assert_allclose(img_m[hit], img_b[hit] * shading.SHADOW_FACTOR,
                               rtol=1e-3)


def test_scene3_triangle_visible():
    sc = generate_scene3()
    img = np.asarray(render_ref(sc.flat, sc.camera, sc.light, CFG))
    ys = np.arange(CFG.height) / CFG.height
    bg = np.broadcast_to(
        np.asarray(shading.background(jnp.asarray(ys)))[:, None, :],
        img.shape)
    assert (np.abs(img - bg).max(axis=-1) > 1e-3).sum() > 10


def test_cpu_fallback_semantics():
    """CPU path: no attenuation, no shadow, black background
    (main.cpp:848-894)."""
    scene, cam, light = _simple_scene()
    cam2 = cam_ops.look_at(cam, (0, 0, 10))  # miss everything
    img = np.asarray(render_cpu(scene, cam2, light, CFG))
    np.testing.assert_allclose(img, 0.0, atol=1e-7)  # black, not gradient
    img_hit = np.asarray(render_cpu(scene, cam, light, CFG))
    assert img_hit.max() > 0


def test_render_is_jittable_and_cached():
    scene, cam, light = _simple_scene()
    img1 = render_ref(scene, cam, light, CFG)
    img2 = render_ref(scene, cam, light, CFG)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_gradients_flow():
    """Pixel gradients w.r.t. sphere center/material exist and are finite
    (the inverse-rendering prerequisite)."""
    scene, cam, light = _simple_scene()
    cfg = RenderConfig(width=16, height=16, max_bounces=2, use_bvh=False,
                       ray_chunk=256)

    def loss(center):
        s = scene.replace(sphere_center=scene.sphere_center.at[0].set(center))
        img = render_ref(s, cam, light, cfg)
        return jnp.sum(img)

    g = jax.grad(loss)(jnp.asarray([0.0, 0.0, -5.0], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
