from raytracer_tpu.anim.animation import (bounce_spheres, rotate_wheels,
                                          animate_scene)

__all__ = ["bounce_spheres", "rotate_wheels", "animate_scene"]
