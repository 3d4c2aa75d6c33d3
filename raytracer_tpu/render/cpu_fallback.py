"""Parity port of the reference's slow CPU renderer.

Reference: cpuRayTracer (src/main.cpp:848-894) + the CPU phong
(main.cpp:553-581). Semantics differ from the GPU kernel on purpose:
single primary bounce, NO shadows, NO reflections, NO light attenuation,
black (not gradient) background. Kept because the reference exposes it as a
user-facing mode (the ImGui ``rtxon`` toggle, main.cpp:377) and as a second
cross-check implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import FlatScene
from raytracer_tpu.core.types import Camera, Light
from raytracer_tpu.geom import batched
from raytracer_tpu.render import shading


@partial(jax.jit, static_argnames=("cfg",))
def render(scene: FlatScene, camera: Camera, light: Light,
           cfg: RenderConfig) -> jnp.ndarray:
    """Single-bounce unshadowed Phong, black background. (H, W, 3)."""
    h, w = cfg.height, cfg.width
    o, d = cam_ops.camera_rays(camera, w, h)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    cache = batched.precompute(scene)

    chunk = min(cfg.ray_chunk, o.shape[0])
    n_rays = o.shape[0]
    pad = (-n_rays) % chunk
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    k = o.shape[0] // chunk

    def body(args):
        o_, d_ = args
        t, sid, hit = batched.closest_hit(cache, o_, d_, cfg.use_mt)
        p = o_ + t[:, None] * d_
        n = batched.shape_normal(scene, sid, p)
        color = shading.phong(
            p, n, d_, light.position, light.color,
            jnp.take(scene.mat_color, sid, axis=0),
            jnp.take(scene.mat_ambient, sid, axis=0),
            jnp.take(scene.mat_diffuse, sid, axis=0),
            jnp.take(scene.mat_specular, sid, axis=0),
            jnp.take(scene.mat_shininess, sid, axis=0),
            attenuate=False)  # CPU phong has no 1/d attenuation
        return jnp.where(hit[:, None], color, 0.0)

    colors = jax.lax.map(body, (o.reshape(k, chunk, 3),
                                d.reshape(k, chunk, 3)))
    return colors.reshape(-1, 3)[:n_rays].reshape(h, w, 3)
