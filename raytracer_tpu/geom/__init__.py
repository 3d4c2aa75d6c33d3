from raytracer_tpu.geom import direct, batched, aabb
from raytracer_tpu.geom.batched import GeomCache, precompute, intersect_scene

__all__ = ["direct", "batched", "aabb", "GeomCache", "precompute",
           "intersect_scene"]
