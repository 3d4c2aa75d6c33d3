"""Measure the production walk's PER-ITERATION LATENCY on chip.

The roofline census says a frame is only ~9k walk iterations and ~11M
VREG-ops — under 1 ms of pure vector throughput — yet measures 9.6 ms.
Hypothesis: each while-loop iteration pays a serial latency (cross-lane
any() -> scalar sync, scalar VMEM loads, branches) of ~1 us that vector
work hides under.

Kernel A: the REAL walk body (slab probe + any + leaf-cond with U tri
tests) iterated over a straight-line chain of n nodes whose boxes always
hit (worst case: every iteration enters a leaf and runs the tests).
Kernel B: same chain, boxes never hit (internal-iteration cost only).
Sweep n; the slope is the per-iteration latency.

Usage: python benchmarks/iter_latency.py   (real chip)
"""
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

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from raytracer_tpu.render import pallas_split
from raytracer_tpu.render.pallas_split import _closest_pass
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 16, 128
GRID = 235


def make_chain(n, hit):
    """A degenerate 'tree': n nodes in a straight chain (every node
    internal with its subtree = the rest), last node a leaf of U tris.
    hit=True: every box contains the ray origin (always probed true).
    hit=False: boxes far away (probe false -> skip to next)."""
    m = n
    nodes = np.zeros((max(m, 8), 8), np.float32)
    if hit:
        nodes[:, 0:3] = -1e6
        nodes[:, 3:6] = 1e6
    else:
        nodes[:, 0:3] = 1e7
        nodes[:, 3:6] = 1e7 + 1
    leaf_start = np.zeros(max(m, 8), np.int32)
    leaf_count = np.zeros(max(m, 8), np.int32)
    skip = np.arange(1, max(m, 8) + 1, dtype=np.int32)
    if hit:
        leaf_count[:] = 1  # every node a 1-tri leaf -> runs the U tests
    tri = np.zeros((64, pallas_split.TRI_W), np.float32)
    pre = np.zeros((8, pallas_split.PRE_W), np.float32)
    return (jnp.asarray(leaf_start), jnp.asarray(leaf_count),
            jnp.asarray(skip), jnp.asarray(nodes), jnp.asarray(pre),
            jnp.asarray(tri), m)


def bench_chain(n, hit, with_normals=False):
    ls, lc, sk, nodes, pre, tri, m = make_chain(n, hit)

    def kernel(ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
               rays_ref, t_ref, g_ref):
        out = _closest_pass(
            ls_ref, lc_ref, sk_ref, nodes_ref, pre_ref, tri_ref,
            rays_ref[0, 0], rays_ref[1, 0], rays_ref[2, 0],
            rays_ref[3, 0], rays_ref[4, 0], rays_ref[5, 0],
            m=m, n_other=0, n_sph=0, use_mt=False,
            with_normals=with_normals,
            unroll=pallas_split.TRI_UNROLL)
        t_ref[0] = out[0]
        g_ref[0] = out[1] + sum(out[2:], jnp.zeros_like(out[0])) \
            if with_normals else out[1]

    rays = jnp.ones((GRID, 6, TH, TW), jnp.float32)
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec(nodes.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pre.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, TH, TW), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, TH, TW), lambda i, *_: (i, 0, 0))
                   for _ in range(2)],
    )
    fn = jax.jit(lambda r: pl.pallas_call(
        kernel, grid_spec=spec,
        out_shape=[jax.ShapeDtypeStruct((GRID, TH, TW), jnp.float32)
                   for _ in range(2)],
    )(ls, lc, sk, nodes, pre, tri, r.reshape(GRID, 6, TH, TW)))
    jax.block_until_ready(fn(rays))
    reps = 30
    t0 = time.perf_counter()
    outs = [fn(rays) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def main():
    for hit, wn in ((False, False), (True, False), (True, True)):
        times = {}
        for n in (8, 64, 256):
            times[n] = bench_chain(n, hit, wn)
        slope = (times[256] - times[8]) / (256 - 8) / GRID
        print(json.dumps({
            "mode": ("leaf(U tests)" if hit else "internal(probe only)")
            + ("+normals" if wn else ""),
            "s_per_launch": {k: round(v, 6) for k, v in times.items()},
            "per_tile_per_iter_us": round(slope * 1e6, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
