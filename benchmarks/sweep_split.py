"""On-chip sweep of split-kernel tuning knobs: TRI_UNROLL x TRI_LEAF_TARGET
x tile shape. One JSON line per config; all configs in one process (the
persistent compile cache + healthy compiles are 3-16 s; a wedged compile
kills the process, so configs print as they complete and the sweep can be
resumed by rerunning with --skip N).

Usage: python benchmarks/sweep_split.py [--skip N] [--frames 20]
"""

import argparse
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
from raytracer_tpu.render import pallas_split, split_scene
from raytracer_tpu.scenes import generate_scene1

# (TRI_UNROLL, TRI_LEAF_TARGET, tile_h, tile_w)
CONFIGS = [
    (16, 96, 16, 128),    # production baseline
    (16, 128, 16, 128),
    (24, 96, 16, 128),
    (24, 144, 16, 128),
    (32, 128, 16, 128),
    (32, 192, 16, 128),
    (16, 96, 8, 128),
    (32, 128, 8, 128),
    (16, 96, 32, 128),
    (8, 96, 16, 128),
    (8, 48, 16, 128),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", type=int, default=0)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--configs", type=str, default=None,
                    help="semicolon list 'u,leaf,th,tw;...' overriding CONFIGS")
    args = ap.parse_args()

    configs = CONFIGS
    if args.configs:
        configs = [tuple(int(x) for x in c.split(","))
                   for c in args.configs.split(";") if c]

    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))

    for idx, (u, leaf, th, tw) in enumerate(configs):
        if idx < args.skip:
            continue
        pallas_split.TRI_UNROLL = u
        split_scene.TRI_LEAF_TARGET = leaf
        pallas_split._render_impl.clear_cache()
        cfg = RenderConfig(width=800, height=600, max_bounces=3,
                           use_bvh=True, ray_chunk=480000,
                           tile_h=th, tile_w=tw)
        split = pallas_split.prepare(sc.flat, bvh)
        fn = lambda: pallas_split.render(sc.flat, bvh, sc.camera, sc.light,
                                         cfg, split=split)
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn() for _ in range(args.frames)]
        jax.block_until_ready(outs)
        fps = args.frames / (time.perf_counter() - t0)
        print(json.dumps({"idx": idx, "unroll": u, "leaf": leaf,
                          "tile": f"{th}x{tw}", "fps": round(fps, 2),
                          "m_nodes": split.m,
                          "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
