"""Offline tree-quality eval: replay the recorded production ray streams
(benchmarks/roofline.py's cache) through the packet-walk simulator for a
set of triangle-tree variants, and rank them by the vector-op model —
no TPU time spent until a variant wins on paper.

The tree is a pure performance choice (contained shapes => any tree is
exact, render/pallas_split.py module docstring), so this is a safe A/B:
only leaf/internal iteration counts change.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/roofline.py --scene 2
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/tree_eval.py --scene 2
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.render import pallas_split, split_scene
from raytracer_tpu.scenes import generate_scene
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "roofline", os.path.join(os.path.dirname(__file__), "roofline.py"))
roofline = importlib.util.module_from_spec(_spec)
sys.modules["roofline"] = roofline
_spec.loader.exec_module(roofline)


def census(split, streams, stride=1):
    """stride > 1 subsamples tiles uniformly — counts scale ~1/stride for
    every variant alike, preserving the ranking at a fraction of the
    simulation cost."""
    totals = {"internal_iters": 0, "leaf_iters": 0, "live_tiles": 0,
              "tiles": 0, "tri_rows_tested": 0}
    tile = roofline.TILE_H * roofline.TILE_W
    for name, o, d in streams:
        if stride > 1:
            g = o.shape[0] // tile
            o = o.reshape(g, tile, 3)[::stride].reshape(-1, 3)
            d = d.reshape(g, tile, 3)[::stride].reshape(-1, 3)
        s = roofline.simulate_walk(split, o, d)
        for k in totals:
            totals[k] += s[k]
    ops_leaf = (pallas_split.TRI_UNROLL
                * (roofline.OPS_TRI_TEST + roofline.OPS_LEAF_EXTRA)) \
        * roofline.VREGS_PER_TILE
    ops_internal = roofline.OPS_SLAB * roofline.VREGS_PER_TILE
    ops_pre = (split.n_sph * roofline.OPS_PRE_SPHERE
               + (split.n_other - split.n_sph) * roofline.OPS_PRE_PW) \
        * roofline.VREGS_PER_TILE
    vreg_ops = (totals["leaf_iters"] * ops_leaf
                + totals["internal_iters"] * ops_internal
                + totals["live_tiles"] * ops_pre)
    totals["est_vreg_ops"] = int(vreg_ops)
    totals["sol_fps"] = round(roofline.VPU_VREG_OPS_PER_S / vreg_ops, 1)
    return totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=2)
    ap.add_argument("--variants", default=(
        "sah96,sbvh96x2,sbvh96x3,sbvh64x2,sah64,sah128,sbvh128x2"))
    ap.add_argument("--stride", type=int, default=1)
    args = ap.parse_args()

    cache = os.path.join("/tmp", f"walk_streams_s{args.scene}_800x600.npz")
    if not os.path.exists(cache):
        sys.exit(f"run benchmarks/roofline.py --scene {args.scene} first "
                 f"(missing {cache})")
    z = np.load(cache)
    streams = [(str(z[f"name{i}"]), z[f"o{i}"], z[f"d{i}"])
               for i in range(int(z["n"]))]

    sc = generate_scene(args.scene, aspect=800 / 600)
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))

    import raytracer_tpu.accel.sah as sah_mod
    results = {}
    old_leaf = split_scene.SAH_LEAF_TARGET
    old_build = sah_mod.build_sah
    try:
        for v in args.variants.split(","):
            base = "sbvh" if v.startswith("sbvh") else "sah"
            rest = v[len(base):]
            leaf, _, refs = rest.partition("x")
            split_scene.SAH_LEAF_TARGET = int(leaf)
            if refs:
                sah_mod.build_sah = (
                    lambda *a, _f=float(refs), **k: old_build(
                        *a, **{**k, "max_refs_factor": _f}))
            else:
                sah_mod.build_sah = old_build
            split = pallas_split.prepare(sc.flat, bvh, tri_builder=base)
            r = census(split, streams, args.stride)
            r["n_tri_refs"] = split.n_tri
            r["m_nodes"] = split.m
            results[v] = r
            print(json.dumps({v: r}), flush=True)
    finally:
        split_scene.SAH_LEAF_TARGET = old_leaf
        sah_mod.build_sah = old_build
    best = min(results, key=lambda k: results[k]["est_vreg_ops"])
    print(json.dumps({"best": best, "ranking": sorted(
        results, key=lambda k: results[k]["est_vreg_ops"])}, indent=1))


if __name__ == "__main__":
    main()
