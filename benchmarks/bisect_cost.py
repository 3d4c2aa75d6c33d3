"""Where do the ~12ms of kernel time per frame go? On-chip bisection of
the production frame (scene 1, 800x600): bounce count, shadows on/off,
prepass/traversal gating (RUN_PREPASS / RUN_TRAVERSAL produce WRONG
images — timing only)."""
import json
import os
import sys
import time

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


def main():
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)

    def run(tag, bounces=3, shadows=True, prepass=True, traversal=True):
        pallas_split.RUN_PREPASS = prepass
        pallas_split.RUN_TRAVERSAL = traversal
        pallas_split._render_impl.clear_cache()
        cfg = RenderConfig(width=800, height=600, max_bounces=bounces,
                           use_bvh=True, ray_chunk=480000,
                           tile_h=16, tile_w=128,
                           enable_shadows=shadows)
        fn = lambda: pallas_split.render(sc.flat, bvh, sc.camera,
                                         sc.light, cfg, split=split)
        ms = timed(fn)
        print(json.dumps({"tag": tag, "ms": round(ms, 2),
                          "fps": round(1e3 / ms, 1)}), flush=True)
        pallas_split.RUN_PREPASS = True
        pallas_split.RUN_TRAVERSAL = True

    run("full_3b")
    run("bounces_1", bounces=1)
    run("bounces_2", bounces=2)
    run("no_shadows_3b", shadows=False)
    run("no_prepass_3b", prepass=False)
    run("no_traversal_3b", traversal=False)
    run("no_shadows_1b", bounces=1, shadows=False)


if __name__ == "__main__":
    main()
