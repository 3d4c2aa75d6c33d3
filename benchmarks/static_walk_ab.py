"""A/B: STATIC-BAKED DFS walk (tree structure + triangle/pre constants
compiled into the program as float immediates, nested scalar conds
instead of the while loop) vs the production while-walk, on recorded
production ray streams.

Motivation (VERDICT r3 item 1c): the brute-mix calibration showed the
intersection mix achieves ~2.2e9 vreg-ops/s with constants baked vs
1.6-1.9e9 with per-iteration scalar VMEM loads — a 15-35% achieved-rate
gap taxed on every triangle test. For a STATIC scene the tree and the
triangle rows are compile-time constants, so the whole walk can be
emitted as a static nested-cond DFS with zero scalar loads and zero
pointer machinery. Traversal order, probe conditions and fold order are
IDENTICAL to the while walk (probe node with entry t_best; if any lane
probes: leaf -> fold its rows in order, internal -> left subtree then
right), so t/gid must be bit-exact.

Variants:
  walk        production _closest_pass (while loop, VMEM scalars)
  static      baked tree + tris + pre rows (fully static scene)
  static_dynpre  baked tree + tris; pre rows stay a VMEM operand
              (production-viable for scene 1's sphere-only animation)

Usage: python benchmarks/static_walk_ab.py [--stream 0] [--scene 1]
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
from raytracer_tpu.render.pallas_split import (
    _ConstRows, _closest_pass, _pre_planewall, _pre_sphere,
    _reduce_candidates, _tri_test, T_GID)
from raytracer_tpu.scenes import generate_scene

TH, TW = 16, 128
W, H = 800, 600


def static_closest(tree, tri_rows, pre_ref, ox, oy, oz, dx, dy, dz,
                   *, n_other, n_sph, use_gram):
    """Statically-unrolled DFS closest-hit: same visit order, probe
    predicates and fold order as _closest_pass's while walk, with every
    tree/triangle scalar a compile-time immediate."""
    leaf_start, leaf_count, skip, boxes = tree
    tri_ref = _ConstRows(tri_rows)
    aa = dx * dx + dy * dy + dz * dz
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz
    shape = ox.shape
    t0 = jnp.full(shape, INF, jnp.float32)
    g0 = jnp.full(shape, -1.0, jnp.float32)

    def run_prepass(carry):
        cands = []
        for i in range(n_other):
            if i < n_sph:
                t, inner = _pre_sphere(pre_ref, i, ox, oy, oz, dx, dy, dz,
                                       aa)
            else:
                t, inner = _pre_planewall(pre_ref, i, ox, oy, oz,
                                          dx, dy, dz,
                                          inv_dx, inv_dy, inv_dz)
            from raytracer_tpu.render.pallas_split import G_GID
            cands.append((jnp.where(inner, t, INF), pre_ref[i, G_GID]))
        if not cands:
            return carry
        best = _reduce_candidates(cands)
        better = best[0] < carry[0]
        return tuple(jnp.where(better, nb, c)
                     for nb, c in zip(best, carry))

    def probe(n, t_best):
        b0x, b0y, b0z, b1x, b1y, b1z = (jnp.float32(float(boxes[n, c]))
                                        for c in range(6))
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
        return jnp.any((tmax >= tmin) & (tmax > 0) & (tmin <= t_best))

    def leaf_tests(n, carry):
        t_best, gid_best = carry
        for row in range(int(leaf_start[n]),
                         int(leaf_start[n]) + int(leaf_count[n])):
            t, inner = _tri_test(tri_ref, row, ox, oy, oz, dx, dy, dz,
                                 False, use_gram)
            better = inner & (t < t_best)
            t_best = jnp.where(better, t, t_best)
            gid_best = jnp.where(better, tri_ref[row, T_GID], gid_best)
        return (t_best, gid_best)

    def walk(n, carry):
        if leaf_count[n] > 0:
            def taken(c):
                return leaf_tests(n, c)
        else:
            left = n + 1
            right = int(skip[left])

            def taken(c):
                return walk(right, walk(left, c))
        return jax.lax.cond(probe(n, carry[0]), taken, lambda c: c, carry)

    def run_all(carry):
        carry = run_prepass(carry)
        return walk(0, carry)

    return jax.lax.cond(jnp.any(ox < 1e30), run_all, lambda c: c,
                        (t0, g0))


def run(fn, rays, reps=30):
    jax.block_until_ready(fn(rays))
    t0 = time.perf_counter()
    outs = [fn(rays) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps * 1e3, outs[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stream", type=int, default=0)
    ap.add_argument("--scene", type=int, default=1)
    ap.add_argument("--variants", default="walk,static,static_dynpre")
    args = ap.parse_args()
    sc = generate_scene(args.scene, aspect=W / H)
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)

    z = np.load(f"/tmp/walk_streams_s{args.scene}_{W}x{H}.npz")
    o_b = jnp.asarray(z[f"o{args.stream}"])
    d_b = jnp.asarray(z[f"d{args.stream}"])
    g = o_b.shape[0] // (TH * TW)
    rays = jnp.stack([o_b[:, 0], o_b[:, 1], o_b[:, 2],
                      d_b[:, 0], d_b[:, 1], d_b[:, 2]]) \
        .reshape(6, g, TH, TW).transpose(1, 0, 2, 3)

    tree = (np.asarray(split.leaf_start), np.asarray(split.leaf_count),
            np.asarray(split.skip), np.asarray(split.nodes))
    tri_np = np.asarray(split.tri_rows)
    pre_np = np.asarray(split.pre_rows)
    use_gram = True

    def make_static(dynpre):
        def kern(*refs):
            if dynpre:
                pre_ref, rays_ref, t_ref, gid_ref = refs
            else:
                rays_ref, t_ref, gid_ref = refs
                pre_ref = _ConstRows(pre_np)
            # block is (1, 6, TH, TW): index [0, c]
            t, gid = static_closest(
                tree, tri_np, pre_ref,
                rays_ref[0, 0], rays_ref[0, 1], rays_ref[0, 2],
                rays_ref[0, 3], rays_ref[0, 4], rays_ref[0, 5],
                n_other=split.n_other, n_sph=split.n_sph,
                use_gram=use_gram)
            t_ref[0] = t
            gid_ref[0] = gid

        in_specs = [pl.BlockSpec((1, 6, TH, TW), lambda i: (i, 0, 0, 0))]
        operands = [rays]
        if dynpre:
            in_specs.insert(0, pl.BlockSpec(split.pre_rows.shape,
                                            lambda i: (0, 0),
                                            memory_space=pltpu.VMEM))
            operands.insert(0, split.pre_rows)
        f = jax.jit(lambda *ops: pl.pallas_call(
            kern, grid=(g,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0))
                       for _ in range(2)],
            out_shape=[jax.ShapeDtypeStruct((g, TH, TW), jnp.float32)
                       for _ in range(2)],
        )(*ops))
        if dynpre:
            return lambda r: f(split.pre_rows, r)
        return lambda r: f(r)

    def walk_kernel(ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
                    rays_ref, t_ref, gid_ref):
        # block is (1, 6, TH, TW): index [0, c]
        t, gid = _closest_pass(
            ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
            rays_ref[0, 0], rays_ref[0, 1], rays_ref[0, 2],
            rays_ref[0, 3], rays_ref[0, 4], rays_ref[0, 5],
            m=split.m, n_other=split.n_other, n_sph=split.n_sph,
            use_mt=False, use_gram=use_gram, with_normals=False,
            unroll=pallas_split.TRI_UNROLL)
        t_ref[0] = t
        gid_ref[0] = gid

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
        walk_kernel, grid_spec=spec,
        out_shape=[jax.ShapeDtypeStruct((g, TH, TW), jnp.float32)
                   for _ in range(2)],
    )(split.leaf_start, split.leaf_count, split.skip, split.nodes,
      split.pre_rows, split.tri_rows, r))

    res = {"stream": args.stream, "scene": args.scene,
           "n_tri": split.n_tri, "m": split.m}
    ref_out = None
    for v in args.variants.split(","):
        t_c = time.perf_counter()
        if v == "walk":
            fn = fn_walk
        elif v == "static":
            fn = make_static(dynpre=False)
        elif v == "static_dynpre":
            fn = make_static(dynpre=True)
        else:
            continue
        ms, out = run(fn, rays)
        res[v + "_ms"] = round(ms, 3)
        res[v + "_compile_s"] = round(time.perf_counter() - t_c, 1)
        if ref_out is None:
            ref_out = out
        else:
            res[v + "_t_bitexact"] = bool(
                (np.asarray(out[0]) == np.asarray(ref_out[0])).all())
            res[v + "_gid_equal_frac"] = float(
                np.mean(np.asarray(out[1]) == np.asarray(ref_out[1])))
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
