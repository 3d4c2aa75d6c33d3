"""Frame-level A/B of cfg.second_sort (3-launch double-sorted hybrid)
vs the production 2-launch hybrid on scene 2 (VERDICT r3 item 5).

Methodology = bench.py's: jiggled cameras (dedup defeat), 50-frame
pipelined streams, max of 3 streams per variant, variants interleaved
in one quiet process.

Usage: python benchmarks/second_sort_ab.py [--scene 2] [--frames 50]
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import pallas_split
from raytracer_tpu.scenes import generate_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=2)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--streams", type=int, default=3)
    args = ap.parse_args()

    cfg0 = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                        ray_chunk=480000, tile_h=16, tile_w=128,
                        sort_bounces=True)
    sc = generate_scene(args.scene, aspect=800 / 600)
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    cams = [type(sc.camera)(sc.camera.position + 1e-4 * i, sc.camera.front,
                            sc.camera.up, sc.camera.right,
                            sc.camera.fov_deg, sc.camera.aspect)
            for i in range(8)]

    variants = {
        "hybrid": cfg0,
        "hybrid2sort": cfg0.replace(second_sort=True),
    }
    fns, imgs = {}, {}
    for name, cfg in variants.items():
        fn = (lambda cfg: lambda i=0: pallas_split.render(
            sc.flat, bvh, cams[i % 8], sc.light, cfg, split=split))(cfg)
        t0 = time.perf_counter()
        imgs[name] = np.asarray(jax.block_until_ready(fn()))
        print(json.dumps({"variant": name,
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        fns[name] = fn

    diff = float(np.max(np.abs(imgs["hybrid"] - imgs["hybrid2sort"])))
    best = {name: 0.0 for name in fns}
    for _ in range(args.streams):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            outs = [fn(i) for i in range(args.frames)]
            jax.block_until_ready(outs)
            fps = args.frames / (time.perf_counter() - t0)
            best[name] = max(best[name], fps)
    out = {f"{k}_fps": round(v, 2) for k, v in best.items()}
    out["max_abs_diff"] = diff
    out["scene"] = args.scene
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
