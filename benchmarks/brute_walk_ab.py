"""A/B: STATIC BRUTE closest-hit (all triangles, fully unrolled,
tree-reduced, zero data-dependent control) vs the production walk, on a
recorded production ray stream.

Motivation: divergent bounce-2/3 walks average 23-34 while-iterations
per live tile at ~0.29us serial latency each; a straight-line pass over
all 1211 scene-1 triangles is ~82k vreg-ops of pure pipelineable vector
work — faster IFF the in-situ achieved VPU throughput exceeds ~50% of
the measured elementwise peak. This measures that directly.

Usage: python benchmarks/brute_walk_ab.py [--stream 2]
(run benchmarks/roofline.py once first to record the streams)
"""
import argparse
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.geom.direct import INF
from raytracer_tpu.render import pallas_split
from raytracer_tpu.render.pallas_split import (_tri_test, _closest_pass,
                                               _reduce_candidates,
                                               _pre_sphere, _pre_planewall,
                                               G_GID, T_GID)
from raytracer_tpu.scenes import generate_scene1

TH, TW = 16, 128
W, H = 800, 600


def brute_kernel(pre_ref, tri_ref, rays_ref, t_ref, gid_ref,
                 *, n_tri, n_other, n_sph, chunk=32):
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    aa = dx * dx + dy * dy + dz * dz
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz
    shape = ox.shape
    t0 = jnp.full(shape, INF, jnp.float32)
    g0 = jnp.full(shape, -1.0, jnp.float32)

    def run_all(carry):
        cands = []
        for i in range(n_other):
            if i < n_sph:
                t, inner = _pre_sphere(pre_ref, i, ox, oy, oz, dx, dy, dz,
                                       aa)
            else:
                t, inner = _pre_planewall(pre_ref, i, ox, oy, oz,
                                          dx, dy, dz,
                                          inv_dx, inv_dy, inv_dz)
            cands.append((jnp.where(inner, t, INF), pre_ref[i, G_GID]))
        winners = [_reduce_candidates(cands)] if cands else []
        # static straight-line brute over every triangle, tree-reduced
        # in chunks (left-wins ties == row order == the walk's DFS order)
        for lo in range(0, n_tri, chunk):
            cc = []
            for row in range(lo, min(lo + chunk, n_tri)):
                t, inner = _tri_test(tri_ref, row, ox, oy, oz, dx, dy, dz,
                                     False)
                cc.append((jnp.where(inner, t, INF), tri_ref[row, T_GID]))
            winners.append(_reduce_candidates(cc))
        best = _reduce_candidates(winners)
        better = best[0] < carry[0]
        return (jnp.where(better, best[0], carry[0]),
                jnp.where(better, best[1], carry[1]))

    res = jax.lax.cond(jnp.any(ox < 1e30), run_all, lambda c: c, (t0, g0))
    t_ref[0] = res[0]
    gid_ref[0] = res[1]


def baseline_kernel(ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
                    rays_ref, t_ref, gid_ref, *, m, n_other, n_sph,
                    unroll):
    t, g = _closest_pass(
        ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
        rays_ref[0, 0], rays_ref[1, 0], rays_ref[2, 0],
        rays_ref[3, 0], rays_ref[4, 0], rays_ref[5, 0],
        m=m, n_other=n_other, n_sph=n_sph, use_mt=False,
        with_normals=False, unroll=unroll)
    t_ref[0] = t
    gid_ref[0] = g


def run(fn, rays, reps=30):
    jax.block_until_ready(fn(rays))
    t0 = time.perf_counter()
    outs = [fn(rays) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps * 1e3, outs[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", type=int, default=2)
    args = ap.parse_args()
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)

    z = np.load(f"/tmp/walk_streams_s1_{W}x{H}.npz")
    o_b = jnp.asarray(z[f"o{args.stream}"])
    d_b = jnp.asarray(z[f"d{args.stream}"])
    g = o_b.shape[0] // (TH * TW)
    rays = jnp.stack([o_b[:, 0], o_b[:, 1], o_b[:, 2],
                      d_b[:, 0], d_b[:, 1], d_b[:, 2]]) \
        .reshape(6, g, TH, TW).transpose(1, 0, 2, 3)

    kern_b = functools.partial(brute_kernel, n_tri=split.n_tri,
                               n_other=split.n_other, n_sph=split.n_sph)
    fn_brute = jax.jit(lambda r: pl.pallas_call(
        kern_b,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(split.pre_rows.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.tri_rows.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, TH, TW), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0))
                   for _ in range(2)],
        out_shape=[jax.ShapeDtypeStruct((g, TH, TW), jnp.float32)
                   for _ in range(2)],
    )(split.pre_rows, split.tri_rows, r))

    kern_w = functools.partial(baseline_kernel, m=split.m,
                               n_other=split.n_other, n_sph=split.n_sph,
                               unroll=pallas_split.TRI_UNROLL)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(split.nodes.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.pre_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.tri_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, TH, TW), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, TH, TW), lambda i, *_: (i, 0, 0))
                   for _ in range(2)],
    )
    fn_walk = jax.jit(lambda r: pl.pallas_call(
        kern_w, grid_spec=spec,
        out_shape=[jax.ShapeDtypeStruct((g, TH, TW), jnp.float32)
                   for _ in range(2)],
    )(split.leaf_start, split.leaf_count, split.skip, split.nodes,
      split.pre_rows, split.tri_rows, rays))

    ms_w, out_w = run(fn_walk, rays)
    t_c = time.perf_counter()
    ms_b, out_b = run(fn_brute, rays)
    compile_s = time.perf_counter() - t_c
    tw_, tb_ = np.asarray(out_w[0]), np.asarray(out_b[0])
    gw_, gb_ = np.asarray(out_w[1]), np.asarray(out_b[1])
    print(json.dumps({
        "stream": args.stream,
        "walk_ms": round(ms_w, 3),
        "brute_ms": round(ms_b, 3),
        "speedup": round(ms_w / ms_b, 3),
        "t_bitexact": bool((tw_ == tb_).all()),
        "gid_equal_frac": float(np.mean(gw_ == gb_)),
        "brute_compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
