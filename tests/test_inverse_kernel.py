"""Inverse rendering THROUGH the production split kernel (VERDICT r2
item 3): a multi-step fit where every step refreshes the prepared
tables from the current geometry (update_dynamic), so hit decisions
track the optimized sphere as it moves — unlike the single-step grad
checks in test_grad.py, which hold a stale split."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.core.types import Light, Material
from raytracer_tpu.diff import fit_scene_params, make_kernel_renderer
from raytracer_tpu.render import pallas_split

CFG = RenderConfig(width=32, height=24, max_bounces=2, use_bvh=True,
                   ray_chunk=768, tile_h=8, tile_w=128)


def test_kernel_path_fit_converges():
    b = SceneBuilder()
    b.add_sphere((0.2, -0.1, -5.0), 1.0,
                 Material(color=(0.9, 0.2, 0.1), fresnel=0, specular=0.2))
    b.add_wall((-20, 2, -20), 40, 40, (0, 1, 0),
               Material(color=(0.4, 0.4, 0.7), specular=0))
    scene = b.build()
    cam = cam_ops.from_euler(position=(0, 0, 0), fov_deg=60,
                             aspect=CFG.width / CFG.height)
    light = Light((0, -3, 0), (1, 1, 1), 6.0)
    bvh = linearize(build_bvh(scene, 4))
    split = pallas_split.prepare(scene, bvh)
    renderer = make_kernel_renderer(bvh, split)

    target = renderer(scene, cam, light, CFG)

    # start with the sphere displaced far enough that a STALE split
    # (prepare()-time boxes/rows) would mis-gate its hits
    init = {
        "sphere_center": scene.sphere_center.at[0].set(
            jnp.array([-0.5, 0.4, -4.4], jnp.float32)),
        "mat_color": scene.mat_color.at[0].set(
            jnp.array([0.3, 0.6, 0.7], jnp.float32)),
    }
    params, history = fit_scene_params(
        scene, cam, light, CFG, target, init, steps=30, lr=4.0,
        renderer=renderer)

    assert len(history) == 30
    assert np.isfinite(history).all()
    # converging: the fit must beat the initial loss decisively
    assert history[-1] < 0.35 * history[0], history
    # and actually move the center toward the truth
    err0 = np.linalg.norm(np.asarray(init["sphere_center"][0])
                          - np.asarray(scene.sphere_center[0]))
    err1 = np.linalg.norm(np.asarray(params["sphere_center"][0])
                          - np.asarray(scene.sphere_center[0]))
    assert err1 < 0.6 * err0, (err0, err1)


def test_kernel_path_mesh_vertex_and_light_grads():
    """Triangle-VERTEX + light-position gradients through the
    production-kernel renderer (VERDICT r3 item 7). Regression guard:
    replacing tri_p1/p2/p3 WITHOUT FlatScene.recompute_tri_planes gives
    EXACTLY zero vertex gradients (plane t and shading normals read the
    stored plane fields) — the fit must use the library refresh."""
    import jax

    b = SceneBuilder()
    # wound to FACE the -z camera rays (plane INNER needs n.dir > 0)
    b.add_triangle((-1.2, -0.8, -5), (0, 1.2, -5), (1.2, -0.8, -5),
                   Material(color=(0.8, 0.7, 0.2), fresnel=0,
                            specular=0.3))
    b.add_wall((-20, 2, -20), 40, 40, (0, 1, 0),
               Material(color=(0.4, 0.4, 0.7), specular=0))
    scene = b.build()
    cam = cam_ops.from_euler(position=(0, 0, 0), fov_deg=60,
                             aspect=CFG.width / CFG.height)
    light = Light((0, -3, 0), (1, 1, 1), 6.0)
    bvh = linearize(build_bvh(scene, 4))
    split = pallas_split.prepare(scene, bvh)
    renderer = make_kernel_renderer(bvh, split)
    target = renderer(scene, cam, light, CFG)

    def loss(delta, light_pos):
        s = scene.replace(
            tri_p1=scene.tri_p1 + delta, tri_p2=scene.tri_p2 + delta,
            tri_p3=scene.tri_p3 + delta).recompute_tri_planes()
        lt = Light(light_pos, light.base_color, light.intensity)
        img = renderer(s, cam, lt, CFG)
        return jnp.mean((img - target) ** 2)

    d0 = jnp.array([0.15, -0.1, 0.05], jnp.float32)
    lp0 = jnp.asarray(light.position) + jnp.array([0.4, -0.3, 0.2])
    gd, gl = jax.grad(loss, argnums=(0, 1))(d0, lp0)
    assert np.isfinite(np.asarray(gd)).all()
    assert np.isfinite(np.asarray(gl)).all()
    assert np.abs(np.asarray(gd)).max() > 0, "vertex grad vanished"
    assert np.abs(np.asarray(gl)).max() > 0, "light grad vanished"

    # the structural-zero failure mode: WITHOUT the plane refresh the
    # vertex gradient is exactly zero (documents why it is required)
    def loss_stale(delta):
        s = scene.replace(
            tri_p1=scene.tri_p1 + delta, tri_p2=scene.tri_p2 + delta,
            tri_p3=scene.tri_p3 + delta)
        img = renderer(s, cam, light, CFG)
        return jnp.mean((img - target) ** 2)

    gs = jax.grad(loss_stale)(d0)
    assert float(np.abs(np.asarray(gs)).max()) == 0.0
