from raytracer_tpu.core.types import Material, Light, Camera
from raytracer_tpu.core.scene import FlatScene, SceneBuilder
from raytracer_tpu.core import camera

__all__ = ["Material", "Light", "Camera", "FlatScene", "SceneBuilder", "camera"]
