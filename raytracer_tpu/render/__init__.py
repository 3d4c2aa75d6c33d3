from raytracer_tpu.render import shading
from raytracer_tpu.render.reference import render as render_reference
from raytracer_tpu.render.cpu_fallback import render as render_cpu_style

__all__ = ["shading", "render_reference", "render_cpu_style"]

# Heavier renderers are imported lazily by callers to keep import time low:
#   raytracer_tpu.render.wavefront     — BVH via XLA gathers
#   raytracer_tpu.render.pallas_kernel — brute-force TPU megakernel
#   raytracer_tpu.render.pallas_bvh    — packet-traversal kernel
#   raytracer_tpu.render.pallas_split  — split-phase kernel (production)
#   raytracer_tpu.render.dynamic       — animate+rebuild+render in one jit
