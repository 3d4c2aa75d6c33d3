"""A/B: K INDEPENDENT walk state machines per kernel program (K adjacent
tiles advance in lockstep through one while loop) vs the production
one-tile-per-program walk, on recorded production ray streams.

Motivation (VERDICT r3 item 1 / frame decomposition): the scene-1 frame
is ~5358 internal + ~3461 leaf iterations; each while iteration pays
~0.29us of serial any()->scalar->branch latency (iter_latency.py) and
each grid step ~3.7us fixed (grid_overhead.py). Merging K ADJACENT
tiles into one program with K independent (ptr, k, t, gid) states:
  - grid steps drop Kx (fixed cost /K);
  - the K sides' cross-lane any() latencies overlap within an
    iteration, so iteration latency is paid ~Sigma max(iters) instead
    of Sigma sum(iters) — adjacent tiles have near-equal walk lengths,
    so max ~ avg;
  - each side keeps ITS OWN traversal decisions: no union-coherence
    loss (the measured reason single-state 32x128 tiles lose,
    pallas_split.py:141) and no cross-walk imbalance (the measured
    reason the shadow/closest walk merge lost, pallas_split.py:117-129
    — those were DIFFERENT walk types with unbalanced lengths).
Traversal order, probe predicates and fold order per side are IDENTICAL
to _closest_pass's walk, so per-side t must be bit-exact.

Variants: walk (production), dual (K=2), quad (K=4).

Usage: python benchmarks/dual_walk_ab.py [--stream 0] [--scene 1]
(run benchmarks/roofline.py once first to record the streams)
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
    G_GID, T_GID, _closest_pass, _pre_planewall, _pre_sphere,
    _reduce_candidates, _tri_test)
from raytracer_tpu.scenes import generate_scene

TH, TW = 16, 128
W, H = 800, 600
PARK = 1e30


def multi_closest(ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
                  side_rays, *, m, n_other, n_sph, use_gram, unroll):
    """K independent walks in one lockstep while loop. side_rays is a
    list of (ox, oy, oz, dx, dy, dz) component tuples, one per side;
    side s mirrors _closest_pass exactly (same prepass, probe
    predicate, leaf fold order)."""
    n_sides = len(side_rays)
    sides = []
    for (ox, oy, oz, dx, dy, dz) in side_rays:
        sides.append(dict(
            ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
            aa=dx * dx + dy * dy + dz * dz,
            ix=1.0 / dx, iy=1.0 / dy, iz=1.0 / dz,
            alive=jnp.any(ox < PARK)))

    def run_prepass(sd, carry):
        cands = []
        for i in range(n_other):
            if i < n_sph:
                t, inner = _pre_sphere(pre_ref, i, sd["ox"], sd["oy"],
                                       sd["oz"], sd["dx"], sd["dy"],
                                       sd["dz"], sd["aa"])
            else:
                t, inner = _pre_planewall(pre_ref, i, sd["ox"], sd["oy"],
                                          sd["oz"], sd["dx"], sd["dy"],
                                          sd["dz"], sd["ix"], sd["iy"],
                                          sd["iz"])
            cands.append((jnp.where(inner, t, INF), pre_ref[i, G_GID]))
        if not cands:
            return carry
        best = _reduce_candidates(cands)
        better = best[0] < carry[0]
        return tuple(jnp.where(better, nb, c)
                     for nb, c in zip(best, carry))

    def side_step(sd, ptr, k, t_best, gid_best):
        """One production body iteration for one side (mirrors
        _closest_pass.body with USE_LEAF_COND, plain leaf fold)."""
        entering = k == 0

        def probe_node(_):
            b0x = nodes_ref[ptr, 0]
            b0y = nodes_ref[ptr, 1]
            b0z = nodes_ref[ptr, 2]
            b1x = nodes_ref[ptr, 3]
            b1y = nodes_ref[ptr, 4]
            b1z = nodes_ref[ptr, 5]
            tx0 = (b0x - sd["ox"]) * sd["ix"]
            tx1 = (b1x - sd["ox"]) * sd["ix"]
            ty0 = (b0y - sd["oy"]) * sd["iy"]
            ty1 = (b1y - sd["oy"]) * sd["iy"]
            tz0 = (b0z - sd["oz"]) * sd["iz"]
            tz1 = (b1z - sd["oz"]) * sd["iz"]
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            probe = (tmax >= tmin) & (tmax > 0) & (tmin <= t_best)
            return jnp.any(probe)

        any_hit = jax.lax.cond(entering, probe_node,
                               lambda _: jnp.bool_(False), 0)
        st = ls_ref[ptr]
        cnt = lc_ref[ptr]
        sk = sk_ref[ptr]
        is_leaf = cnt > 0
        start_leaf = entering & any_hit & is_leaf
        in_leaf = start_leaf | jnp.logical_not(entering)

        def leaf_tests(carry):
            t_best, gid_best = carry
            for j in range(unroll):
                row = st + k + j
                t, inner = _tri_test(tri_ref, row, sd["ox"], sd["oy"],
                                     sd["oz"], sd["dx"], sd["dy"],
                                     sd["dz"], False, use_gram)
                better = inner & ((k + j) < cnt) & (t < t_best) if j \
                    else inner & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                gid_best = jnp.where(better, tri_ref[row, T_GID], gid_best)
            return (t_best, gid_best)

        t_best, gid_best = jax.lax.cond(in_leaf, leaf_tests, lambda c: c,
                                        (t_best, gid_best))
        k_next = k + unroll
        leaf_done = in_leaf & (k_next >= cnt)
        go_deeper = entering & any_hit & jnp.logical_not(is_leaf)
        stay = (in_leaf & jnp.logical_not(leaf_done)).astype(jnp.int32)
        deeper = go_deeper.astype(jnp.int32)
        new_ptr = stay * ptr + (1 - stay) * (deeper * (ptr + 1)
                                             + (1 - deeper) * sk)
        new_k = stay * k_next
        return new_ptr, new_k, t_best, gid_best

    inits = []
    for sd in sides:
        t0 = jnp.full(sd["ox"].shape, INF, jnp.float32)
        g0 = jnp.full(sd["ox"].shape, -1.0, jnp.float32)
        t_i, g_i = jax.lax.cond(sd["alive"],
                                lambda c, sd=sd: run_prepass(sd, c),
                                lambda c: c, (t0, g0))
        # a parked side never enters the loop: ptr starts at m
        ptr_i = jnp.where(sd["alive"], jnp.int32(0), jnp.int32(m))
        inits.extend([ptr_i, jnp.int32(0), t_i, g_i])

    def cond(state):
        live = [state[4 * s] < m for s in range(n_sides)]
        out = live[0]
        for l in live[1:]:
            out = out | l
        return out

    def body(state):
        out = []
        for s, sd in enumerate(sides):
            ptr, k, t_b, g_b = state[4 * s: 4 * s + 4]
            ptr, k, t_b, g_b = jax.lax.cond(
                ptr < m,
                lambda p, kk, tt, gg, sd=sd: side_step(sd, p, kk, tt, gg),
                lambda p, kk, tt, gg: (p, kk, tt, gg),
                ptr, k, t_b, g_b)
            out.extend([ptr, k, t_b, g_b])
        return tuple(out)

    state = jax.lax.while_loop(cond, body, tuple(inits))
    return ([state[4 * s + 2] for s in range(n_sides)],
            [state[4 * s + 3] for s in range(n_sides)])


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
    ap.add_argument("--variants", default="walk,dual,quad")
    ap.add_argument("--reps", type=int, default=30)
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

    use_gram = True
    U = pallas_split.TRI_UNROLL

    def make_multi(n_sides):
        gp = ((g + n_sides - 1) // n_sides) * n_sides
        if gp != g:
            pad = jnp.full((gp - g, 6, TH, TW), 2e30, jnp.float32)
            rays_p = jnp.concatenate([rays, pad], axis=0)
        else:
            rays_p = rays
        grid = gp // n_sides

        def kern(ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
                 rays_ref, t_ref, gid_ref):
            side_rays = [tuple(rays_ref[0, s, c] for c in range(6))
                         for s in range(n_sides)]
            ts, gs = multi_closest(
                ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
                side_rays, m=split.m, n_other=split.n_other,
                n_sph=split.n_sph, use_gram=use_gram, unroll=U)
            for s in range(n_sides):
                t_ref[0, s] = ts[s]
                gid_ref[0, s] = gs[s]

        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(split.nodes.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(split.pre_rows.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(split.tri_rows.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_sides, 6, TH, TW),
                             lambda i, *_: (i, 0, 0, 0, 0)),
            ],
            out_specs=[pl.BlockSpec((1, n_sides, TH, TW),
                                    lambda i, *_: (i, 0, 0, 0))
                       for _ in range(2)],
        )
        rays_b = rays_p.reshape(grid, n_sides, 6, TH, TW)
        f = jax.jit(lambda r: pl.pallas_call(
            kern, grid_spec=spec,
            out_shape=[jax.ShapeDtypeStruct((grid, n_sides, TH, TW),
                                            jnp.float32)
                       for _ in range(2)],
        )(split.leaf_start, split.leaf_count, split.skip, split.nodes,
          split.pre_rows, split.tri_rows, r))

        def fn(_):
            t, gid = f(rays_b)
            return (t.reshape(gp, TH, TW)[:g], gid.reshape(gp, TH, TW)[:g])
        return fn

    def make_sub(n_sub):
        """n_sub independent walks over row-slices of the EXISTING
        (TH, TW) tile: same grid, same resident vector bytes as the
        production walk (each side's carries are (TH/n_sub, TW)), so no
        extra register pressure — unlike the cross-tile dual/quad."""
        hh = TH // n_sub

        def kern(ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
                 rays_ref, t_ref, gid_ref):
            side_rays = [tuple(rays_ref[0, c, s * hh:(s + 1) * hh]
                               for c in range(6))
                         for s in range(n_sub)]
            ts, gs = multi_closest(
                ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
                side_rays, m=split.m, n_other=split.n_other,
                n_sph=split.n_sph, use_gram=use_gram, unroll=U)
            t_ref[0] = jnp.concatenate(ts, axis=0)
            gid_ref[0] = jnp.concatenate(gs, axis=0)

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
        f = jax.jit(lambda r: pl.pallas_call(
            kern, grid_spec=spec,
            out_shape=[jax.ShapeDtypeStruct((g, TH, TW), jnp.float32)
                       for _ in range(2)],
        )(split.leaf_start, split.leaf_count, split.skip, split.nodes,
          split.pre_rows, split.tri_rows, r))
        return lambda r: f(r)

    def walk_kernel(ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
                    rays_ref, t_ref, gid_ref):
        # block is (1, 6, TH, TW): index [0, c] (NOT the production
        # kernel's [c, 0], whose rays blocks are component-first)
        t, gid = _closest_pass(
            ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
            rays_ref[0, 0], rays_ref[0, 1], rays_ref[0, 2],
            rays_ref[0, 3], rays_ref[0, 4], rays_ref[0, 5],
            m=split.m, n_other=split.n_other, n_sph=split.n_sph,
            use_mt=False, use_gram=use_gram, with_normals=False,
            unroll=U)
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
           "n_tri": split.n_tri, "m": split.m, "g": g}
    ref_out = None
    for v in args.variants.split(","):
        t_c = time.perf_counter()
        if v == "walk":
            fn = fn_walk
        elif v == "dual":
            fn = make_multi(2)
        elif v == "quad":
            fn = make_multi(4)
        elif v == "octo":
            fn = make_multi(8)
        elif v == "sub2":
            fn = make_sub(2)
        else:
            continue
        ms, out = run(fn, rays, reps=args.reps)
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
