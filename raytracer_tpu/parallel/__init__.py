from raytracer_tpu.parallel.sharding import (make_mesh, render_sharded,
                                             trace_sharded)

__all__ = ["make_mesh", "render_sharded", "trace_sharded"]
