"""Capture a real device timeline of the production frame with
jax.profiler (works through the axon tunnel) and print the per-op busy
times — the ground truth that wall-clock pipelined timing approximates.

Round-2 finding: the pallas wholeframe kernel IS the frame (37.8 ms
busy over 5 frames = 7.6 ms/frame; every XLA op around it < 0.15 ms),
and a 20-frame pipelined stream under-reports sustained throughput by
~12% vs the device floor (ramp-up bubbles — use >= 50-frame streams).

Usage: python benchmarks/profile_trace.py [--scene 2] [--frames 5]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

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
from raytracer_tpu.scenes import generate_scene1, generate_scene2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=1)
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args()
    sc = (generate_scene1 if args.scene == 1 else generate_scene2)()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=128)
    fn = lambda: pallas_split.render(sc.flat, bvh, sc.camera, sc.light,
                                     cfg, split=split)
    jax.block_until_ready(fn())

    tracedir = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tracedir)
    outs = [fn() for _ in range(args.frames)]
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()

    (path,) = glob.glob(os.path.join(tracedir, "plugins", "profile",
                                     "*", "*.trace.json.gz"))
    with gzip.open(path) as f:
        tr = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            durs[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total = 0.0
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:15]:
        if name.startswith("jit__render"):
            continue  # the enclosing program; its ops are listed below
        total += d
        print(json.dumps({"op": name[:70], "busy_ms": round(d / 1e3, 3),
                          "count": cnt[name],
                          "ms_per_frame": round(d / 1e3 / args.frames, 3)}))
    print(json.dumps({"device_busy_ms_per_frame":
                      round(total / 1e3 / args.frames, 3),
                      "trace": path}))


if __name__ == "__main__":
    main()
