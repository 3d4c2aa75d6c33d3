"""Gradient correctness: oracle autodiff vs finite differences vs the
differentiable kernel path (SURVEY.md §4 implication: pixel gradients
checked against finite differences)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.core.types import Light, Material
from raytracer_tpu.render import pallas_split
from raytracer_tpu.render.reference import render as render_ref

CFG = RenderConfig(width=24, height=18, max_bounces=2, use_bvh=False,
                   ray_chunk=432, tile_h=8, tile_w=128)


def _scene():
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.2, Material(color=(0.9, 0.3, 0.2), fresnel=0,
                 ambient=0.2, diffuse=0.8, specular=0.4))
    b.add_sphere((1.5, 0.8, -7), 0.8, Material(color=(0.2, 0.8, 0.3)))
    b.add_triangle((-3, -1, -6), (-1, -1, -6), (-2, 1, -6))
    scene = b.build()
    cam = cam_ops.from_euler(position=(0, 0, 0), fov_deg=60,
                             aspect=CFG.width / CFG.height)
    light = Light((0, 3, 0), (1, 1, 1), 6.0)
    return scene, cam, light


def test_oracle_grad_matches_finite_differences():
    scene, cam, light = _scene()

    def loss(radius):
        s = scene.replace(sphere_radius=scene.sphere_radius.at[0].set(radius))
        return jnp.sum(render_ref(s, cam, light, CFG))

    g = float(jax.grad(loss)(jnp.float32(1.2)))
    eps = 1e-3
    fd = (float(loss(jnp.float32(1.2 + eps)))
          - float(loss(jnp.float32(1.2 - eps)))) / (2 * eps)
    assert np.isclose(g, fd, rtol=0.05), (g, fd)


@pytest.mark.parametrize("field", ["mat_color", "sphere_center",
                                   "sphere_radius"])
def test_kernel_grads_match_oracle(field):
    """Kernel-path gradients (stop-grad hits + re-derived t) equal oracle
    autodiff gradients where the discrete structure is identical."""
    scene, cam, light = _scene()
    bvh = linearize(build_bvh(scene, 4))
    cfg = CFG.replace(use_bvh=True)
    split = pallas_split.prepare(scene, bvh)

    def loss_oracle(v):
        s = scene.replace(**{field: v})
        from raytracer_tpu.accel.linearize import shape_leaf_boxes
        lb = shape_leaf_boxes(bvh, scene.num_shapes)
        return jnp.sum(render_ref(s, cam, light, cfg, leaf_boxes=lb))

    def loss_kernel(v):
        s = scene.replace(**{field: v})
        # NOTE: split tables hold the ORIGINAL geometry for traversal; the
        # gradient flows through the scene arrays via the re-derivation.
        return jnp.sum(pallas_split.render(s, bvh, cam, light, cfg,
                                           split=split, differentiable=True))

    v0 = getattr(scene, field)
    g_o = np.asarray(jax.grad(loss_oracle)(v0))
    g_k = np.asarray(jax.grad(loss_kernel)(v0))
    assert np.isfinite(g_k).all()
    np.testing.assert_allclose(g_k, g_o, rtol=1e-3, atol=1e-5)


def _recompute_planes(s):
    """Differentiable plane refresh from triangle vertices — now the
    library method FlatScene.recompute_tri_planes (this alias keeps the
    call sites readable)."""
    return s.recompute_tri_planes()


def _tri_scene():
    """Like _scene() but with the triangle WOUND to face the camera
    (plane INNER needs n.dir > 0, plane.hpp:51 — _scene()'s triangle has
    normal +z against -z rays and is never hittable, so vertex grads
    through it are trivially zero)."""
    b = SceneBuilder()
    b.add_sphere((0, 0, -5), 1.2, Material(color=(0.9, 0.3, 0.2), fresnel=0,
                 ambient=0.2, diffuse=0.8, specular=0.4))
    b.add_sphere((1.5, 0.8, -7), 0.8, Material(color=(0.2, 0.8, 0.3)))
    b.add_triangle((-3, -1, -6), (-2, 1, -6), (-1, -1, -6),
                   Material(color=(0.8, 0.7, 0.2), specular=0.3))
    scene = b.build()
    cam = cam_ops.from_euler(position=(0, 0, 0), fov_deg=60,
                             aspect=CFG.width / CFG.height)
    light = Light((0, 3, 0), (1, 1, 1), 6.0)
    return scene, cam, light


@pytest.mark.parametrize("field", ["tri_p1", "tri_p2", "tri_p3"])
def test_kernel_tri_vertex_grads_match_oracle(field):
    """Triangle-VERTEX gradients (SURVEY §7.6 names them as targets;
    VERDICT r2 item 5): kernel path vs oracle autodiff, with the plane
    re-derived from the perturbed vertices on both sides."""
    scene, cam, light = _tri_scene()
    bvh = linearize(build_bvh(scene, 4))
    cfg = CFG.replace(use_bvh=True)
    split = pallas_split.prepare(scene, bvh)
    from raytracer_tpu.accel.linearize import shape_leaf_boxes
    lb = shape_leaf_boxes(bvh, scene.num_shapes)

    def loss_oracle(v):
        s = _recompute_planes(scene.replace(**{field: v}))
        return jnp.sum(render_ref(s, cam, light, cfg, leaf_boxes=lb))

    def loss_kernel(v):
        s = _recompute_planes(scene.replace(**{field: v}))
        return jnp.sum(pallas_split.render(s, bvh, cam, light, cfg,
                                           split=split,
                                           differentiable=True))

    v0 = getattr(scene, field)
    g_o = np.asarray(jax.grad(loss_oracle)(v0))
    g_k = np.asarray(jax.grad(loss_kernel)(v0))
    assert np.isfinite(g_k).all()
    # the triangle row carries nonzero signal
    assert np.abs(g_k[2]).max() > 0
    np.testing.assert_allclose(g_k, g_o, rtol=1e-3, atol=1e-5)


def test_tri_vertex_grad_matches_finite_differences():
    """Anchor the vertex gradient to finite differences (not just the two
    autodiff paths agreeing with each other)."""
    scene, cam, light = _tri_scene()

    def loss(x):
        p1 = scene.tri_p1.at[2, 0].set(x)
        s = _recompute_planes(scene.replace(tri_p1=p1))
        return jnp.sum(render_ref(s, cam, light, CFG))

    x0 = jnp.float32(scene.tri_p1[2, 0])
    g = float(jax.grad(loss)(x0))
    eps = 1e-3
    fd = (float(loss(x0 + eps)) - float(loss(x0 - eps))) / (2 * eps)
    assert np.isclose(g, fd, rtol=0.05), (g, fd)


def test_light_and_camera_grads_match_oracle():
    """Kernel-path camera/light gradients equal oracle autodiff gradients
    (not just finite — VERDICT r1 item 9)."""
    scene, cam, light = _scene()
    bvh = linearize(build_bvh(scene, 4))
    cfg = CFG.replace(use_bvh=True)
    split = pallas_split.prepare(scene, bvh)

    def make_loss(render_fn):
        def loss(lp, cp):
            lt = Light(lp, light.base_color, light.intensity)
            c2 = type(cam)(cp, cam.front, cam.up, cam.right, cam.fov_deg,
                           cam.aspect)
            return jnp.sum(render_fn(scene, c2, lt))
        return loss

    from raytracer_tpu.accel.linearize import shape_leaf_boxes
    lb = shape_leaf_boxes(bvh, scene.num_shapes)
    loss_oracle = make_loss(
        lambda s, c, l: render_ref(s, c, l, cfg, leaf_boxes=lb))
    loss_kernel = make_loss(
        lambda s, c, l: pallas_split.render(s, bvh, c, l, cfg, split=split,
                                            differentiable=True))

    gl_o, gc_o = jax.grad(loss_oracle, argnums=(0, 1))(light.position,
                                                       cam.position)
    gl_k, gc_k = jax.grad(loss_kernel, argnums=(0, 1))(light.position,
                                                       cam.position)
    assert np.isfinite(np.asarray(gl_k)).all()
    assert np.isfinite(np.asarray(gc_k)).all()
    assert np.abs(np.asarray(gl_k)).max() > 0
    np.testing.assert_allclose(np.asarray(gl_k), np.asarray(gl_o),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_k), np.asarray(gc_o),
                               rtol=1e-3, atol=1e-5)
