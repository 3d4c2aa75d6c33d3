"""raytracer_tpu — a TPU-native differentiable Whitted ray-tracing framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of the reference
OpenGL compute-shader ray tracer (Junacik99/opengl-ray-tracer):

- scene model: SoA pytree of shape/material arrays (reference: std430 tagged
  union `FlatShape`, src/flatStructures.hpp:7-108)
- renderers: pure functions ``render(scene, camera, light, config) -> image``
  - ``render.reference``: brute-force jax.numpy oracle (reference:
    src/shaders/gpu_shader.comp:522-620, the useBVH=false path)
  - ``render.wavefront``: BVH-accelerated wavefront renderer (reference:
    src/shaders/gpu_shader.comp:380-430 intersectScene2)
  - ``render.pallas_kernel``: the Pallas TPU megakernel
- accel: host median-split BVH (reference: src/main.cpp:1111-1193) and
  stackless linearization for vectorized traversal
- parallel: shard_map image-plane sharding over a device mesh
- diff: end-to-end differentiability + inverse rendering

Everything is float32 by default, matching the reference's GLSL precision.
"""

__version__ = "0.1.0"

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core.types import Material, Light, Camera
from raytracer_tpu.core.scene import FlatScene, SceneBuilder

__all__ = [
    "RenderConfig",
    "Material",
    "Light",
    "Camera",
    "FlatScene",
    "SceneBuilder",
]
