"""Quick in-session frame-rate A/B across scenes and hybrid settings.

Pipelined 50-frame streams with jiggled cameras (NOTES_r4: identical
dispatches get deduped on this attachment), min-of-rounds within ONE
quiet process. Not the official bench — a working tool for kernel A/Bs.

Usage: python benchmarks/frame_ab.py [scene1 scene1_sort scene2 ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import pallas_split
from raytracer_tpu.scenes import generate_scene


def jiggle(cam, n=8):
    return [type(cam)(cam.position + 1e-4 * i, cam.front, cam.up,
                      cam.right, cam.fov_deg, cam.aspect)
            for i in range(n)]


def bench_one(scene_id, sort_bounces, frames=50, rounds=3):
    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       tile_h=16, tile_w=128, sort_bounces=sort_bounces)
    sc = generate_scene(scene_id, aspect=800 / 600)
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    cams = jiggle(sc.camera)
    fn = lambda i: pallas_split.render(sc.flat, bvh, cams[i % 8], sc.light,
                                       cfg, split=split)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(0))
    compile_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(i) for i in range(frames)]
        jax.block_until_ready(outs)
        best = max(best, frames / (time.perf_counter() - t0))
    return {"fps": round(best, 2), "ms": round(1e3 / best, 2),
            "compile_s": round(compile_s, 1)}


CASES = {
    "scene1": (1, False),
    "scene1_sort": (1, True),
    "scene2": (2, False),
    "scene2_sort": (2, True),
}


def main():
    names = sys.argv[1:] or ["scene1", "scene1_sort", "scene2",
                             "scene2_sort"]
    out = {}
    for name in names:
        sid, sort = CASES[name]
        out[name] = bench_one(sid, sort)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
