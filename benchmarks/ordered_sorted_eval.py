"""Offline census: octant-ordered (near-child-first) traversal layouts
evaluated on the SORTED continuation streams (round 5).

Round-3 measured octant ordering as a dead end on UNSORTED packets
(1.1% fewer iterations — 2048 divergent lanes visit the union of their
subtrees regardless of order). The hybrid changed the premise: after the
re-pack, every tile is OCTANT-PURE by construction (the sort key's top
bits are the direction octant), so near-child-first ordering should
tighten t_best early and let the contents-contained t-cull prune far
subtrees. This replays the production streams sorted by the hybrid's key
through (a) the default DFS layout and (b) the per-tile octant layout.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python benchmarks/ordered_sorted_eval.py --scene 2
"""
import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax.numpy as jnp

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.accel.sah import build_sah
from raytracer_tpu.core.scene import TRIANGLE
from raytracer_tpu.geom.aabb import shape_aabbs, shape_centers
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

_spec3 = importlib.util.spec_from_file_location(
    "owe", os.path.join(os.path.dirname(__file__), "ordered_walk_eval.py"))
owe = importlib.util.module_from_spec(_spec3)
sys.modules["owe"] = owe
_spec3.loader.exec_module(owe)


class FakeSplit:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=2)
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

    # rebuild the production tri tree (SAH) for the octant layouts
    st = np.asarray(sc.flat.shape_type)
    tri_ids = np.nonzero(st == TRIANGLE)[0].astype(np.int32)
    mins, maxs = shape_aabbs(sc.flat)
    centers = shape_centers(sc.flat)
    tbvh = build_sah(aabbs=(mins[tri_ids], maxs[tri_ids]),
                     centers=centers[tri_ids],
                     leaf_target=split_scene.SAH_LEAF_TARGET)
    octs = owe.octant_linearizations(tbvh, None)

    tile = roofline.TILE_H * roofline.TILE_W
    out = []
    for wi, (name, o, d) in enumerate(streams):
        key = sort_eval.sort_key(o, d)
        perm = np.argsort(key, kind="stable")
        o, d = o[perm], d[perm]
        base = roofline.simulate_walk(split, o, d)

        g = o.shape[0] // tile
        oi, ol, lt = 0, 0, 0
        for ti in range(g):
            sl = slice(ti * tile, (ti + 1) * tile)
            live = o[sl, 0] < 1e30
            if not live.any():
                continue
            lt += 1
            octant = 0
            for a in range(3):
                if np.mean(d[sl, a][live] < 0) > 0.5:
                    octant |= 1 << a
            b_, ls_, lc_, sk_ = octs[octant]
            fake = FakeSplit()
            fake.nodes = np.concatenate(
                [b_, np.zeros((b_.shape[0], 2), np.float32)], axis=1)
            fake.leaf_start, fake.leaf_count, fake.skip = ls_, lc_, sk_
            fake.tri_rows = split.tri_rows
            fake.m = split.m
            fake.pre_rows = split.pre_rows
            fake.n_other, fake.n_sph = split.n_other, split.n_sph
            r = roofline.simulate_walk(fake, o[sl], d[sl])
            oi += r["internal_iters"]
            ol += r["leaf_iters"]
        rec = {"walk": f"{wi}:{name}",
               "leaf_iters": [base["leaf_iters"], ol],
               "internal_iters": [base["internal_iters"], oi],
               "live_tiles": lt}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    tot = {k: [sum(r[k][0] for r in out), sum(r[k][1] for r in out)]
           for k in ("leaf_iters", "internal_iters")}
    tot["leaf_reduction"] = round(
        tot["leaf_iters"][0] / max(tot["leaf_iters"][1], 1), 3)
    tot["iter_reduction"] = round(
        (tot["leaf_iters"][0] + tot["internal_iters"][0])
        / max(tot["leaf_iters"][1] + tot["internal_iters"][1], 1), 3)
    print(json.dumps({"totals": tot}, indent=1))


if __name__ == "__main__":
    main()
