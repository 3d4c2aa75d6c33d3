"""Offline evaluation: would OCTANT-ORDERED traversal (near child first,
given the tile's majority direction signs) cut walk iterations?

The production skip-pointer walk visits children in one baked DFS order
(exact — closest-hit min is order-independent), so t-culling tightens
late when the far side is baked first. Baking EIGHT DFS orders (one per
direction-sign octant, near child first along each node's dominant child
separation axis) and picking per tile by majority sign would tighten
t_best earlier and prune more subtrees.

This script replays the production ray streams (shared cache with
roofline.py) through a numpy walk simulator under (a) the default order
and (b) the per-tile octant order, reporting iteration counts. Run
roofline.py first (or let this record the streams).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
           python benchmarks/ordered_walk_eval.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import benchmarks.roofline as R
from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.accel import bvh as bvh_mod
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core.scene import TRIANGLE
from raytracer_tpu.geom.aabb import shape_aabbs, shape_centers
from raytracer_tpu.render import pallas_split
from raytracer_tpu.scenes import generate_scene1

import jax.numpy as jnp


def octant_linearizations(tbvh, default_lin):
    """Eight (bounds, leaf_start, leaf_count, skip) node layouts of the
    same tree, leaf_start pointing into the DEFAULT perm's spans."""
    # default DFS: node id -> (start, count) in default perm
    spans = {}
    cursor = [0]

    def walk_default(node):
        if tbvh.left[node] == -1:
            cnt = int(tbvh.count[node])
            spans[node] = (cursor[0], cnt)
            cursor[0] += cnt
        else:
            walk_default(int(tbvh.left[node]))
            walk_default(int(tbvh.right[node]))

    walk_default(tbvh.root)

    m = tbvh.num_nodes
    outs = []
    centers = (np.asarray(tbvh.bounds_min) + np.asarray(tbvh.bounds_max)) \
        * 0.5
    for octant in range(8):
        neg = [(octant >> a) & 1 for a in range(3)]  # 1 = negative dir
        bounds = np.zeros((m, 6), np.float32)
        leaf_start = np.zeros(m, np.int32)
        leaf_count = np.zeros(m, np.int32)
        skip = np.zeros(m, np.int32)
        order = []

        def visit(node):
            me = len(order)
            order.append(node)
            bounds[me, 0:3] = tbvh.bounds_min[node]
            bounds[me, 3:6] = tbvh.bounds_max[node]
            if tbvh.left[node] == -1:
                st, cnt = spans[node]
                leaf_start[me] = st
                leaf_count[me] = cnt
            else:
                l, r = int(tbvh.left[node]), int(tbvh.right[node])
                diff = np.abs(centers[l] - centers[r])
                axis = int(np.argmax(diff))
                l_first = centers[l][axis] <= centers[r][axis]
                if neg[axis]:
                    l_first = not l_first
                a, b = (l, r) if l_first else (r, l)
                visit(a)
                visit(b)
            skip[me] = len(order)

        visit(tbvh.root)
        outs.append((bounds, leaf_start, leaf_count, skip))
    return outs


class FakeSplit:
    pass


def main():
    cfg = RenderConfig(width=R.W, height=R.H, max_bounces=R.BOUNCES,
                       use_bvh=True, ray_chunk=R.W * R.H,
                       tile_h=R.TILE_H, tile_w=R.TILE_W)
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)

    cache = os.path.join("/tmp", f"walk_streams_s1_{R.W}x{R.H}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        streams = [(str(z[f"name{i}"]), z[f"o{i}"], z[f"d{i}"])
                   for i in range(int(z["n"]))]
    else:
        streams, img = R.record_walk_streams(sc, bvh, cfg)
        np.savez(cache, n=len(streams), img=img,
                 **{f"name{i}": nm for i, (nm, _, _) in enumerate(streams)},
                 **{f"o{i}": o for i, (_, o, _) in enumerate(streams)},
                 **{f"d{i}": d for i, (_, _, d) in enumerate(streams)})

    # rebuild the tri-only tree exactly as SplitScene.__init__ does
    st = np.asarray(sc.flat.shape_type)
    tri_ids = np.nonzero(st == TRIANGLE)[0].astype(np.int32)
    mins, maxs = shape_aabbs(sc.flat)
    centers = shape_centers(sc.flat)
    sub = sc.flat.take(jnp.asarray(tri_ids))
    depth = pallas_split._auto_tri_depth(len(tri_ids))
    tbvh = bvh_mod.build_bvh(sub, depth,
                             aabbs=(mins[tri_ids], maxs[tri_ids]),
                             centers=centers[tri_ids])
    octs = octant_linearizations(tbvh, None)

    tile = R.TILE_H * R.TILE_W
    totals = {"default": 0, "ordered": 0,
              "default_leaf": 0, "ordered_leaf": 0}
    for name, o, d in streams:
        base = R.simulate_walk(split, o, d)
        totals["default"] += base["internal_iters"] + base["leaf_iters"]
        totals["default_leaf"] += base["leaf_iters"]

        # per-tile octant pick, then simulate with that layout
        g = o.shape[0] // tile
        oi, ol = 0, 0
        for ti in range(g):
            sl = slice(ti * tile, (ti + 1) * tile)
            if not (o[sl, 0] < 1e30).any():
                continue
            live = o[sl, 0] < 1e30
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
            s = R.simulate_walk(fake, o[sl], d[sl])
            oi += s["internal_iters"] + s["leaf_iters"]
            ol += s["leaf_iters"]
        totals["ordered"] += oi
        totals["ordered_leaf"] += ol
        print(json.dumps({"walk": name,
                          "default": base["internal_iters"]
                          + base["leaf_iters"],
                          "default_leaf": base["leaf_iters"],
                          "ordered": oi, "ordered_leaf": ol}), flush=True)
    totals["iter_ratio"] = round(totals["ordered"]
                                 / max(totals["default"], 1), 4)
    totals["leaf_ratio"] = round(totals["ordered_leaf"]
                                 / max(totals["default_leaf"], 1), 4)
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
