"""Offline census: per-launch TREE CHOICE for the hybrid's continuation.

The hybrid's two launches can consume DIFFERENT SplitScenes (separate
pallas_calls): bounce 1 keeps the production SAH/leaf-96 tree; the
continuation walks the SORTED stream, whose tiles are coherent — a
deeper tree (smaller leaves) may cut tested rows, or a shallower one may
cut iteration latency. This replays the sorted bounce>=2 streams against
SAH trees of several leaf sizes and reports modeled cost:
  cost_ms = (leaf_iters*2048 + internal_iters*42 + prepass) / rate
            + iters * iter_latency

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python benchmarks/cont_tree_eval.py --scene 2
"""
import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.render import pallas_split, split_scene
from raytracer_tpu.scenes import generate_scene

_spec = importlib.util.spec_from_file_location(
    "roofline", os.path.join(os.path.dirname(__file__), "roofline.py"))
roofline = importlib.util.module_from_spec(_spec)
sys.modules["roofline"] = roofline
_spec.loader.exec_module(roofline)

_spec2 = importlib.util.spec_from_file_location(
    "sort_eval", os.path.join(os.path.dirname(__file__), "sort_eval.py"))
sort_eval = importlib.util.module_from_spec(_spec2)
sys.modules["sort_eval"] = sort_eval
_spec2.loader.exec_module(sort_eval)

RATE = 2.2e9          # in-situ vreg-ops/s (NOTES_r4 model)
ITER_LAT = 0.29e-6    # s per walk iteration (benchmarks/iter_latency.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=2)
    ap.add_argument("--leaves", default="32,48,64,96,128")
    args = ap.parse_args()
    cache = os.path.join("/tmp", f"walk_streams_s{args.scene}_800x600.npz")
    if not os.path.exists(cache):
        sys.exit(f"run benchmarks/roofline.py --scene {args.scene} first")
    z = np.load(cache)
    streams = [(str(z[f"name{i}"]), z[f"o{i}"], z[f"d{i}"])
               for i in range(int(z["n"]))]
    # continuation = every walk after the first closest+shadow pair
    cont = streams[2:]

    sc = generate_scene(args.scene, aspect=800 / 600)
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))

    old = split_scene.SAH_LEAF_TARGET
    out = {}
    try:
        for leaf in [int(x) for x in args.leaves.split(",")]:
            split_scene.SAH_LEAF_TARGET = leaf
            split = pallas_split.prepare(sc.flat, bvh, tri_builder="sah")
            tot_leaf = tot_int = tot_live = 0
            for name, o, d in cont:
                key = sort_eval.sort_key(o, d)
                perm = np.argsort(key, kind="stable")
                r = roofline.simulate_walk(split, o[perm], d[perm])
                tot_leaf += r["leaf_iters"]
                tot_int += r["internal_iters"]
                tot_live += r["live_tiles"]
            pre = tot_live * (split.n_sph * 17 + (split.n_other
                                                  - split.n_sph) * 45) * 2
            vregs = tot_leaf * 2048 + tot_int * 42 + pre
            iters = tot_leaf + tot_int
            ms = vregs / RATE * 1e3 + iters * ITER_LAT * 1e3
            out[leaf] = {"m": split.m, "leaf_iters": tot_leaf,
                         "internal_iters": tot_int,
                         "live_tiles": tot_live,
                         "modeled_ms": round(ms, 2)}
            print(json.dumps({leaf: out[leaf]}), flush=True)
    finally:
        split_scene.SAH_LEAF_TARGET = old
    print(json.dumps(out))


if __name__ == "__main__":
    main()
