"""A/B the on-device attribute resolve kernel vs the XLA row gather on
the production frame (scene 1, 800x600x3)."""
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
import numpy as np

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
    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=128)
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    fn = lambda: pallas_split.render(sc.flat, bvh, sc.camera, sc.light,
                                     cfg, split=split)
    imgs = {}
    for flag in (False, True):
        pallas_split.USE_RESOLVE_KERNEL = flag
        pallas_split._render_impl.clear_cache()
        t0 = time.perf_counter()
        imgs[flag] = np.asarray(jax.block_until_ready(fn()))
        compile_s = time.perf_counter() - t0
        ms = timed(fn)
        print(json.dumps({"resolve_kernel": flag, "ms": round(ms, 2),
                          "fps": round(1e3 / ms, 1),
                          "compile_s": round(compile_s, 1)}), flush=True)
    diff = float(np.abs(imgs[True] - imgs[False]).max())
    print(json.dumps({"max_abs_diff": diff}), flush=True)


if __name__ == "__main__":
    main()
