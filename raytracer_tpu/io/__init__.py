from raytracer_tpu.io.image import write_png, to_uint8
from raytracer_tpu.io.obj import load_obj, obj_to_triangles

__all__ = ["write_png", "to_uint8", "load_obj", "obj_to_triangles"]
