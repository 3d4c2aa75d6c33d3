"""Inverse rendering example: recover a sphere's position and color from a
target image by gradient descent — the capability the reference's hand-tuned
ImGui material editor (src/main.cpp:384-429) hints at, made automatic.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/inverse.py
(or on TPU: python examples/inverse.py)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import SceneBuilder
from raytracer_tpu.core.types import Light, Material
from raytracer_tpu.diff import fit_scene_params
from raytracer_tpu.io import write_png
from raytracer_tpu.render.reference import render as render_ref


def main():
    cfg = RenderConfig(width=64, height=48, max_bounces=2, use_bvh=False,
                       ray_chunk=1024)
    b = SceneBuilder()
    b.add_sphere((0.3, -0.2, -5), 1.0, Material(color=(0.9, 0.2, 0.1),
                                                fresnel=0, specular=0.2))
    b.add_wall((-20, 2, -20), 40, 40, (0, 1, 0),
               Material(color=(0.4, 0.4, 0.7), specular=0))
    scene = b.build()
    cam = cam_ops.from_euler(position=(0, 0, 0), fov_deg=60,
                             aspect=cfg.width / cfg.height)
    light = Light((0, -3, 0), (1, 1, 1), 6.0)

    target = render_ref(scene, cam, light, cfg)
    write_png("inverse_target.png", np.asarray(target))

    # perturb: wrong position and color
    init = {
        "sphere_center": scene.sphere_center.at[0].set(
            jnp.array([-0.4, 0.3, -4.5], jnp.float32)),
        "mat_color": scene.mat_color.at[0].set(
            jnp.array([0.2, 0.6, 0.8], jnp.float32)),
    }
    img0 = render_ref(scene.replace(**init), cam, light, cfg)
    write_png("inverse_init.png", np.asarray(img0))

    params, history = fit_scene_params(scene, cam, light, cfg, target, init,
                                       steps=200, lr=2.0)
    print(f"loss: {history[0]:.6f} -> {history[-1]:.6f}")
    print("recovered center:", np.asarray(params["sphere_center"][0]),
          "true:", np.asarray(scene.sphere_center[0]))
    print("recovered color:", np.asarray(params["mat_color"][0]),
          "true:", np.asarray(scene.mat_color[0]))

    img1 = render_ref(scene.replace(**params), cam, light, cfg)
    write_png("inverse_fit.png", np.asarray(img1))
    assert history[-1] < history[0] * 0.1, "optimization failed to converge"


if __name__ == "__main__":
    main()
