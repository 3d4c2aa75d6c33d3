from raytracer_tpu.render import shading
from raytracer_tpu.render.reference import render as render_reference
from raytracer_tpu.render.cpu_fallback import render as render_cpu_style

__all__ = ["shading", "render_reference", "render_cpu_style"]
