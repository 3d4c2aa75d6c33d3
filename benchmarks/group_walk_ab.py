"""A/B: grouped one-level walk vs the production skip-pointer walk, as
STANDALONE closest-hit launches on fixed primary rays (scene 1).

Motivation (benchmarks/iter_latency.py): every while-loop iteration of
the production walk costs ~0.29us of serial latency on v5e REGARDLESS
of its vector work (the any() -> scalar -> branch round-trip); a
tile-walk averages ~13 dependent iterations. The grouped walk replaces
the tree with G contiguous DFS-span groups: G INDEPENDENT slab probes +
any()s (they pipeline - no control dependency between them), then a
static chain of lax.cond-gated test blocks, one per group.

Usage: python benchmarks/group_walk_ab.py [--groups 16]
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
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.geom.direct import INF
from raytracer_tpu.render import pallas_split, whitted
from raytracer_tpu.render.pallas_split import _tri_test, _closest_pass
from raytracer_tpu.render.pallas_bvh import _block_shape
from raytracer_tpu.scenes import generate_scene1

TH, TW = 16, 128
W, H = 800, 600


def make_groups(split, n_groups):
    """Partition the DFS-ordered tri rows into contiguous groups of
    ~equal size; box = union of member tri AABBs."""
    n = split.n_tri
    tri = np.asarray(split.tri_rows)[:n]
    p1 = tri[:, 10:13]
    p2 = p1 + tri[:, 4:7]
    p3 = p1 + tri[:, 7:10]
    tmin = np.minimum(np.minimum(p1, p2), p3)
    tmax = np.maximum(np.maximum(p1, p2), p3)
    edges = np.linspace(0, n, n_groups + 1).astype(np.int32)
    boxes = np.zeros((max(n_groups, 8), 8), np.float32)
    spans = []
    for g in range(n_groups):
        lo, hi = int(edges[g]), int(edges[g + 1])
        spans.append((lo, hi - lo))
        boxes[g, 0:3] = tmin[lo:hi].min(0)
        boxes[g, 3:6] = tmax[lo:hi].max(0)
    return jnp.asarray(boxes), spans


def grouped_kernel(boxes_ref, pre_ref, tri_ref, rays_ref, t_ref, gid_ref,
                   *, spans, n_other, n_sph, unroll):
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

    # pre-pass (same as production, tree-reduced)
    from raytracer_tpu.render.pallas_split import (_pre_sphere,
                                                   _pre_planewall,
                                                   _reduce_candidates,
                                                   G_GID)
    cands = []
    for i in range(n_other):
        if i < n_sph:
            t, inner = _pre_sphere(pre_ref, i, ox, oy, oz, dx, dy, dz, aa)
        else:
            t, inner = _pre_planewall(pre_ref, i, ox, oy, oz, dx, dy, dz,
                                      inv_dx, inv_dy, inv_dz)
        cands.append((jnp.where(inner, t, INF), pre_ref[i, G_GID]))
    t_best, gid_best = _reduce_candidates(cands) if cands else (t0, g0)

    # probe pass: G independent slab tests + any()s (no serial deps)
    anys = []
    for g, (lo, cnt) in enumerate(spans):
        b0x = boxes_ref[g, 0]
        b0y = boxes_ref[g, 1]
        b0z = boxes_ref[g, 2]
        b1x = boxes_ref[g, 3]
        b1y = boxes_ref[g, 4]
        b1z = boxes_ref[g, 5]
        tx0 = (b0x - ox) * inv_dx
        tx1 = (b1x - ox) * inv_dx
        ty0 = (b0y - oy) * inv_dy
        ty1 = (b1y - oy) * inv_dy
        tz0 = (b0z - oz) * inv_dz
        tz1 = (b1z - oz) * inv_dz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                       jnp.maximum(ty0, ty1)),
                           jnp.maximum(tz0, tz1))
        anys.append(jnp.any((tmax >= tmin) & (tmax > 0)
                            & (tmin <= t_best)))

    # test chain: one cond per group, static unrolled U-blocks inside
    for g, (lo, cnt) in enumerate(spans):
        def test_group(carry, lo=lo, cnt=cnt):
            t_best, gid_best = carry
            for k in range(0, cnt, unroll):
                for j in range(unroll):
                    if k + j >= cnt:
                        break
                    row = lo + k + j
                    t, inner = _tri_test(tri_ref, row, ox, oy, oz,
                                         dx, dy, dz, False)
                    better = inner & (t < t_best)
                    t_best = jnp.where(better, t, t_best)
                    gid_best = jnp.where(better, tri_ref[row, 18],
                                         gid_best)
            return (t_best, gid_best)

        t_best, gid_best = jax.lax.cond(anys[g], test_group,
                                        lambda c: c, (t_best, gid_best))

    t_ref[0] = t_best
    gid_ref[0] = gid_best


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


def run(fn, rays, label, reps=30):
    jax.block_until_ready(fn(rays))
    t0 = time.perf_counter()
    outs = [fn(rays) for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    return ms, outs[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=16)
    ap.add_argument("--stream", type=int, default=-1,
                    help="replay cached walk stream N (from roofline.py; "
                         "0=primary closest, 2/4=bounce closest, odd="
                         "shadow); -1 = generate primary rays")
    args = ap.parse_args()
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    boxes, spans = make_groups(split, args.groups)

    bh, bw = _block_shape(TH * TW)
    if args.stream >= 0:
        z = np.load(f"/tmp/walk_streams_s1_{W}x{H}.npz")
        o_b = jnp.asarray(z[f"o{args.stream}"])
        d_b = jnp.asarray(z[f"d{args.stream}"])
    else:
        o, d = cam_ops.camera_rays(sc.camera, W, H)

        def to_blocks(x, fill):
            hp = -(-H // bh) * bh
            wp = -(-W // bw) * bw
            x = jnp.pad(x, ((0, hp - H), (0, wp - W), (0, 0)),
                        constant_values=fill)
            x = x.reshape(hp // bh, bh, wp // bw, bw, 3)
            return x.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

        o_b = to_blocks(o, whitted.PARK_ORIGIN)
        d_b = to_blocks(d, whitted._PARK_DIR)
    g = o_b.shape[0] // (TH * TW)
    rays = jnp.stack([o_b[:, 0], o_b[:, 1], o_b[:, 2],
                      d_b[:, 0], d_b[:, 1], d_b[:, 2]]) \
        .reshape(6, g, TH, TW).transpose(1, 0, 2, 3)

    kern_g = functools.partial(grouped_kernel, spans=spans,
                               n_other=split.n_other, n_sph=split.n_sph,
                               unroll=pallas_split.TRI_UNROLL)
    fn_g = jax.jit(lambda r: pl.pallas_call(
        kern_g,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(boxes.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
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
    )(boxes, split.pre_rows, split.tri_rows, r))

    kern_b = functools.partial(baseline_kernel, m=split.m,
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
    fn_b = jax.jit(lambda r: pl.pallas_call(
        kern_b, grid_spec=spec,
        out_shape=[jax.ShapeDtypeStruct((g, TH, TW), jnp.float32)
                   for _ in range(2)],
    )(split.leaf_start, split.leaf_count, split.skip, split.nodes,
      split.pre_rows, split.tri_rows, rays))

    t_compile = time.perf_counter()
    ms_b, out_b = run(fn_b, rays, "baseline")
    t_b_compile = time.perf_counter() - t_compile
    t_compile = time.perf_counter()
    ms_g, out_g = run(fn_g, rays, "grouped")
    t_g_compile = time.perf_counter() - t_compile

    tb, gb = np.asarray(out_b[0]), np.asarray(out_b[1])
    tg, gg = np.asarray(out_g[0]), np.asarray(out_g[1])
    print(json.dumps({
        "groups": args.groups,
        "baseline_ms": round(ms_b, 3),
        "grouped_ms": round(ms_g, 3),
        "speedup": round(ms_b / ms_g, 3),
        "t_allclose": bool(np.allclose(tb, tg, rtol=1e-6, atol=1e-6,
                                       equal_nan=True)),
        "gid_equal_frac": float(np.mean(gb == gg)),
        "compile_s": {"baseline": round(t_b_compile, 1),
                      "grouped": round(t_g_compile, 1)},
    }), flush=True)


if __name__ == "__main__":
    main()
