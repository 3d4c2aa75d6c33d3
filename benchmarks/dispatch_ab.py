"""A/B: bench.py's call pattern (module-level jit _render_impl with args)
vs an outer jit closure capturing scene/split as constants. Diagnoses the
61ms-vs-20ms discrepancy seen in profile_split."""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE)
import jax
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import pallas_split
from raytracer_tpu.scenes import generate_scene1


def timed(fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                   ray_chunk=480000, tile_h=16, tile_w=128)
sc = generate_scene1()
bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
split = pallas_split.prepare(sc.flat, bvh)

# A: bench.py pattern — args flow into the module-level jit
a = timed(lambda: pallas_split.render(sc.flat, bvh, sc.camera, sc.light,
                                      cfg, split=split))
print(f"A bench-pattern: {a:.2f} ms ({1e3/a:.1f} fps)", flush=True)

# B: outer jit, scene/split closure-captured as embedded constants
full = jax.jit(lambda c: pallas_split.render(sc.flat, None, c, sc.light,
                                             cfg, split=split))
b = timed(lambda: full(sc.camera))
print(f"B outer-jit-constants: {b:.2f} ms ({1e3/b:.1f} fps)", flush=True)

# C: outer jit, everything as arguments
full_args = jax.jit(
    lambda flat, sp, c, l: pallas_split.render(flat, None, c, l, cfg,
                                               split=sp))
c = timed(lambda: full_args(sc.flat, split, sc.camera, sc.light))
print(f"C outer-jit-args: {c:.2f} ms ({1e3/c:.1f} fps)", flush=True)
