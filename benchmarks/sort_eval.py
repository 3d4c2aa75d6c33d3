"""Offline ray-reordering eval: would sorting divergent-wave rays into
coherent packets cut the packet-walk's leaf-visit union? (The census
shows 83-88% of leaf tests come from bounce/shadow waves whose 2048-lane
tiles visit nearly the whole tree.)

Replays each recorded production stream through the walk simulator
AFTER reordering live rays by a (direction-octant, origin-Morton) key,
parked rays compacted to the tail. Reports leaf/internal iterations
sorted vs unsorted. Pure numpy — measures the upper bound before any
kernel engineering.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python benchmarks/sort_eval.py --scene 2 [--stride 2]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.render import pallas_split
from raytracer_tpu.scenes import generate_scene
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "roofline", os.path.join(os.path.dirname(__file__), "roofline.py"))
roofline = importlib.util.module_from_spec(_spec)
sys.modules["roofline"] = roofline
_spec.loader.exec_module(roofline)


def morton3(x, y, z, bits=7):
    """Interleave 3x bits-bit ints."""
    out = np.zeros_like(x, dtype=np.int64)
    for b in range(bits):
        out |= ((x >> b) & 1).astype(np.int64) << (3 * b + 2)
        out |= ((y >> b) & 1).astype(np.int64) << (3 * b + 1)
        out |= ((z >> b) & 1).astype(np.int64) << (3 * b)
    return out


def sort_key(o, d):
    live = o[:, 0] < 1e30
    octant = ((d[:, 0] > 0).astype(np.int64) * 4
              + (d[:, 1] > 0).astype(np.int64) * 2
              + (d[:, 2] > 0).astype(np.int64))
    lo = np.where(live[:, None], o, 0.0).min(0)
    hi = np.where(live[:, None], o, 0.0).max(0)
    span = np.maximum(hi - lo, 1e-6)
    q = ((o - lo) / span * 127).clip(0, 127).astype(np.int64)
    m = morton3(q[:, 0], q[:, 1], q[:, 2])
    key = octant << 60 | m
    return np.where(live, key, np.int64(1) << 62)   # parked to the tail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=2)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--key", default="octant_morton",
                    choices=["octant_morton", "morton_only", "dir_morton"])
    args = ap.parse_args()
    cache = os.path.join("/tmp", f"walk_streams_s{args.scene}_800x600.npz")
    if not os.path.exists(cache):
        sys.exit(f"run benchmarks/roofline.py --scene {args.scene} first")
    z = np.load(cache)
    streams = [(str(z[f"name{i}"]), z[f"o{i}"], z[f"d{i}"])
               for i in range(int(z["n"]))]

    sc = generate_scene(args.scene, aspect=800 / 600)
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)

    tile = roofline.TILE_H * roofline.TILE_W
    out = []
    for wi, (name, o, d) in enumerate(streams):
        if args.stride > 1:
            g = o.shape[0] // tile
            o = o.reshape(g, tile, 3)[::args.stride].reshape(-1, 3)
            d = d.reshape(g, tile, 3)[::args.stride].reshape(-1, 3)
        base = roofline.simulate_walk(split, o, d)
        if args.key == "morton_only":
            key = sort_key(o, d) & ((np.int64(1) << 60) - 1) \
                | (sort_key(o, d) >> 62 << 62)
        elif args.key == "dir_morton":
            dq = ((d + 1) * 63.5).clip(0, 127).astype(np.int64)
            m = morton3(dq[:, 0], dq[:, 1], dq[:, 2])
            live = o[:, 0] < 1e30
            key = np.where(live, m, np.int64(1) << 62)
        else:
            key = sort_key(o, d)
        perm = np.argsort(key, kind="stable")
        srt = roofline.simulate_walk(split, o[perm], d[perm])
        rec = {"walk": f"{wi}:{name}",
               "leaf_iters": [base["leaf_iters"], srt["leaf_iters"]],
               "internal_iters": [base["internal_iters"],
                                  srt["internal_iters"]],
               "live_tiles": [base["live_tiles"], srt["live_tiles"]]}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    tot = {k: [sum(r[k][0] for r in out), sum(r[k][1] for r in out)]
           for k in ("leaf_iters", "internal_iters", "live_tiles")}
    tot["leaf_reduction"] = round(tot["leaf_iters"][0]
                                  / max(tot["leaf_iters"][1], 1), 2)
    print(json.dumps({"totals": tot, "key": args.key}, indent=1))


if __name__ == "__main__":
    main()
