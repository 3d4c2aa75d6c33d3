from raytracer_tpu.scenes.generators import (generate_scene1, generate_scene2,
                                             generate_scene3, Scene,
                                             generate_scene)

__all__ = ["generate_scene1", "generate_scene2", "generate_scene3", "Scene",
           "generate_scene"]
