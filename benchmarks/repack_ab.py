"""A/B: hybrid re-pack variants on scene 2 (round-5 perf campaign).

Variants: baseline payload sort / gather re-pack (2-col sort + bulk
take) / continuation tile 8x128 / both. Measures pipelined FPS and pins
bit-exactness vs the baseline hybrid frame.

Usage: python benchmarks/repack_ab.py [scene]
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.render import pallas_split, wholeframe
from raytracer_tpu.scenes import generate_scene


def main():
    sid = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sc = generate_scene(sid, aspect=800 / 600)
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       tile_h=16, tile_w=128, sort_bounces=True)
    cams = [type(sc.camera)(sc.camera.position + 1e-4 * i, sc.camera.front,
                            sc.camera.up, sc.camera.right, sc.camera.fov_deg,
                            sc.camera.aspect) for i in range(8)]

    variants = [
        ("baseline", False, None),
        ("gather", True, None),
        ("cont8x128", False, (8, 128)),
        ("gather_cont8", True, (8, 128)),
    ]
    ref_img = None
    out = {}
    for name, gather, cont in variants:
        wholeframe.USE_GATHER_REPACK = gather
        wholeframe.CONT_TILE = cont
        pallas_split._render_impl.clear_cache()
        fn = lambda i: pallas_split.render(sc.flat, bvh, cams[i % 8],
                                           sc.light, cfg, split=split)
        t0 = time.perf_counter()
        img = jax.block_until_ready(fn(0))
        compile_s = time.perf_counter() - t0
        if ref_img is None:
            ref_img = np.asarray(img)
            diff = 0.0
        else:
            diff = float(np.max(np.abs(np.asarray(img) - ref_img)))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(i) for i in range(50)]
            jax.block_until_ready(outs)
            best = max(best, 50 / (time.perf_counter() - t0))
        out[name] = {"fps": round(best, 2), "ms": round(1e3 / best, 2),
                     "max_abs_vs_baseline": diff,
                     "compile_s": round(compile_s, 1)}
        print(json.dumps({name: out[name]}), flush=True)
    wholeframe.USE_GATHER_REPACK = False
    wholeframe.CONT_TILE = None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
