"""The brute-force oracle renderer (pure jax.numpy, no acceleration).

This is the framework's ground truth: the reference's useBVH=false GPU path
(gpu_shader.comp:522-620) — closest hit by linear scan over all shapes —
with the shared Whitted loop from render/whitted.py. Differentiable
end-to-end; every other renderer must allclose() this one at fp32.

Rays are processed in chunks via lax.map so peak memory stays at
O(ray_chunk * num_shapes) regardless of resolution.
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
from raytracer_tpu.render import shading, whitted


def trace_chunked(scene: FlatScene, light: Light, o, d, bg,
                  cfg: RenderConfig, leaf_boxes=None) -> jnp.ndarray:
    """Trace R rays in ray_chunk-sized chunks. o, d, bg: (R, 3)."""
    cache = batched.precompute(scene)

    def closest(o_, d_):
        return batched.closest_hit(cache, o_, d_, cfg.use_mt, leaf_boxes)

    n_rays = o.shape[0]
    chunk = min(cfg.ray_chunk, n_rays)
    pad = (-n_rays) % chunk
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        bg = jnp.pad(bg, ((0, pad), (0, 0)))
    k = o.shape[0] // chunk
    o = o.reshape(k, chunk, 3)
    d = d.reshape(k, chunk, 3)
    bg = bg.reshape(k, chunk, 3)

    def body(args):
        o_, d_, bg_ = args
        return whitted.trace(scene, light, closest, o_, d_, bg_, cfg)

    colors = jax.lax.map(body, (o, d, bg))
    colors = colors.reshape(k * chunk, 3)
    return colors[:n_rays]


@partial(jax.jit, static_argnames=("cfg",))
def render(scene: FlatScene, camera: Camera, light: Light, cfg: RenderConfig,
           leaf_boxes=None) -> jnp.ndarray:
    """Render an (H, W, 3) image — the oracle path.

    Equivalent of one glDispatchCompute frame (src/main.cpp:352-353) with
    useBVH=false semantics for the closest-hit. Pass ``leaf_boxes`` (from
    accel.linearize.shape_leaf_boxes) to emulate useBVH=true VISIBILITY
    exactly while keeping the brute-force scan — the oracle for BVH
    renderers. cfg.use_bvh additionally selects the reference's shadow
    epsilon (1e-3 vs 1e-5).
    """
    h, w = cfg.height, cfg.width
    o, d = cam_ops.camera_rays(camera, w, h)
    ys = jnp.arange(h, dtype=jnp.float32) / h
    bg = shading.background(ys)                      # (H, 3)
    bg = jnp.broadcast_to(bg[:, None, :], (h, w, 3))
    colors = trace_chunked(scene, light, o.reshape(-1, 3), d.reshape(-1, 3),
                           bg.reshape(-1, 3), cfg, leaf_boxes)
    return colors.reshape(h, w, 3)
