from raytracer_tpu.utils.timing import FrameTimer, benchmark

__all__ = ["FrameTimer", "benchmark"]
