"""Measure the fixed per-grid-step cost of a pallas launch shaped like
the production wholeframe kernel (same 247-step grid, same resident
VMEM tables in_specs, trivial body), and the incremental cost of the
resident tables themselves. Separates 'grid machinery' from 'walk
iterations' in the frame budget.

Usage: python benchmarks/grid_overhead.py   (real chip)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.render import pallas_split
from raytracer_tpu.scenes import generate_scene1

TH, TW = 16, 128
GRID = 247


def bench(with_tables, split):
    def kernel(*refs):
        out = refs[-4], refs[-3], refs[-2]
        z = jnp.zeros((TH, TW), jnp.float32)
        out[0][0] = z
        out[1][0] = z
        out[2][0] = z

    in_specs = []
    operands = []
    if with_tables:
        in_specs = [
            pl.BlockSpec(split.nodes.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.pre_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(split.tri_rows.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = [split.nodes, split.pre_rows, split.tri_rows]
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(GRID,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, TH, TW), lambda i, *_: (i, 0, 0))
                   for _ in range(3)],
        scratch_shapes=[pltpu.VMEM((TH, TW), jnp.float32)],
    )
    fn = jax.jit(lambda *ops: pl.pallas_call(
        kernel, grid_spec=spec,
        out_shape=[jax.ShapeDtypeStruct((GRID, TH, TW), jnp.float32)
                   for _ in range(3)],
    )(jnp.zeros(8, jnp.int32), *ops))
    jax.block_until_ready(fn(*operands))
    reps = 50
    t0 = time.perf_counter()
    outs = [fn(*operands) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps


def main():
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    t_bare = bench(False, split)
    t_tab = bench(True, split)
    print(json.dumps({
        "grid_steps": GRID,
        "bare_ms_per_launch": round(t_bare * 1e3, 3),
        "bare_us_per_step": round(t_bare / GRID * 1e6, 3),
        "with_tables_ms_per_launch": round(t_tab * 1e3, 3),
        "with_tables_us_per_step": round(t_tab / GRID * 1e6, 3),
    }))


if __name__ == "__main__":
    main()
