"""A/B: canonical resolve ids. The wholeframe kernel's material resolve
loops over the DISTINCT winning shape ids per tile per bounce; on mesh
tiles that's up to hundreds of iterations while the mesh shares ~3
materials. Remapping the gid column to min-gid-per-distinct-material is
bit-exact for the wholeframe forward path (the resolve only reads
material columns, identical for every shape in a group) and collapses
the loop to <= #materials iterations.

Usage: python benchmarks/resolve_rid_ab.py [--scene 2]
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
from raytracer_tpu.scenes import generate_scene1, generate_scene2


def canonical_ids(scene):
    mat = np.stack([
        np.asarray(scene.mat_color[:, 0]), np.asarray(scene.mat_color[:, 1]),
        np.asarray(scene.mat_color[:, 2]), np.asarray(scene.mat_ambient),
        np.asarray(scene.mat_diffuse), np.asarray(scene.mat_specular),
        np.asarray(scene.mat_fresnel), np.asarray(scene.mat_shininess),
    ], axis=1)
    _, inv = np.unique(mat, axis=0, return_inverse=True)
    canon = np.zeros(scene.num_shapes, np.int64)
    for g in range(scene.num_shapes - 1, -1, -1):
        canon[inv[g]] = g
    return canon[inv]  # min gid per group


def timed(fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=1)
    args = ap.parse_args()
    sc = (generate_scene1 if args.scene == 1 else generate_scene2)()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=128)

    fn_a = lambda: pallas_split.render(sc.flat, bvh, sc.camera, sc.light,
                                       cfg, split=split)
    img_a = np.asarray(fn_a())
    ms_a = timed(fn_a)

    canon = canonical_ids(sc.flat).astype(np.float32)
    tri = np.array(split.tri_rows)
    n_tri_rows = tri.shape[0]
    gid_col = tri[:, pallas_split.T_GID].astype(np.int64)
    valid = (np.arange(n_tri_rows) < split.n_tri)
    tri[valid, pallas_split.T_GID] = canon[gid_col[valid]]
    pre = np.array(split.pre_rows)
    pv = np.arange(pre.shape[0]) < split.n_other
    pre[pv, pallas_split.G_GID] = canon[
        pre[pv, pallas_split.G_GID].astype(np.int64)]
    split_b = split.replace_leaves(tri_rows=jax.numpy.asarray(tri),
                                   pre_rows=jax.numpy.asarray(pre))
    fn_b = lambda: pallas_split.render(sc.flat, bvh, sc.camera, sc.light,
                                       cfg, split=split_b)
    img_b = np.asarray(fn_b())
    ms_b = timed(fn_b)

    print(json.dumps({
        "scene": args.scene,
        "baseline_ms": round(ms_a, 2), "baseline_fps": round(1e3 / ms_a, 1),
        "rid_ms": round(ms_b, 2), "rid_fps": round(1e3 / ms_b, 1),
        "max_abs_diff": float(np.abs(img_a - img_b).max()),
    }), flush=True)


if __name__ == "__main__":
    main()
