"""Measure achievable VPU vector-op throughput on the attached chip with
a pure elementwise Pallas kernel (a chain of independent-pair FMAs over a
(16,128) VMEM tile, grid-swept like the production kernel). Writes the
achieved VREG-ops/s into ROOFLINE.json ("vpu_vreg_ops_per_s_measured")
so the speed-of-light model uses a measured peak, not a datasheet guess.

Usage: python benchmarks/vpu_peak.py   (real chip)
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

TH, TW = 16, 128
GRID = 235            # same tile count as the 800x600 production frame
CHAIN = 512           # FMAs per element per kernel; 4 independent chains


def kernel(x_ref, o_ref):
    a = x_ref[0]
    b = x_ref[0] * 1.0001
    c = x_ref[0] * 0.9999
    d = x_ref[0] + 0.5
    for _ in range(CHAIN // 4):
        a = a * 1.000001 + 0.25
        b = b * 0.999999 + 0.125
        c = c * 1.000002 + 0.0625
        d = d * 0.999998 + 0.03125
    o_ref[0] = a + b + c + d


def kernel_select(x_ref, o_ref):
    """compare+select mix (the intersection workload's dominant ops):
    4 independent chains of (cmp, where) pairs — 2 vector ops each."""
    a = x_ref[0]
    b = x_ref[0] * 1.0001
    c = x_ref[0] * 0.9999
    d = x_ref[0] + 0.5
    for _ in range(CHAIN // 8):
        a = jnp.where(a > 0.5, a * 0.999, a + 0.001)
        b = jnp.where(b > 0.5, b * 0.998, b + 0.002)
        c = jnp.where(c > 0.5, c * 0.997, c + 0.003)
        d = jnp.where(d > 0.5, d * 0.996, d + 0.004)
    o_ref[0] = a + b + c + d


def kernel_scalar_bcast(x_ref, rows_ref, o_ref):
    """scalar VMEM load + broadcast FMA (the tri-test row access
    pattern): CHAIN/4 iterations of 4 independent broadcast FMAs, each
    reading a distinct VMEM scalar."""
    a = x_ref[0]
    b = x_ref[0] * 1.0001
    c = x_ref[0] * 0.9999
    d = x_ref[0] + 0.5
    for i in range(CHAIN // 4):
        r = i % 64
        a = a * rows_ref[r, 0] + rows_ref[r, 1]
        b = b * rows_ref[r, 2] + rows_ref[r, 3]
        c = c * rows_ref[r, 4] + rows_ref[r, 5]
        d = d * rows_ref[r, 6] + rows_ref[r, 7]
    o_ref[0] = a + b + c + d


def _bench(kern, ops):
    x = jnp.ones((GRID, TH, TW), jnp.float32)
    rows = jnp.full((64, 8), 1.0001, jnp.float32)
    scalar = kern is kernel_scalar_bcast
    in_specs = [pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0))]
    args = [x]
    if scalar:
        in_specs.append(pl.BlockSpec((64, 8), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(rows)
    fn = jax.jit(lambda *a: pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((GRID, TH, TW), jnp.float32),
    )(*a))
    jax.block_until_ready(fn(*args))
    n = 50
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    s = (time.perf_counter() - t0) / n
    vregs_per_tile = (TH * TW) // (8 * 128)
    vreg_ops = GRID * ops * vregs_per_tile
    return s, vreg_ops


def main():
    s, vreg_ops = _bench(kernel, CHAIN)
    res = {"measured_s_per_launch": s,
           "vreg_ops_per_launch": vreg_ops,
           "vpu_vreg_ops_per_s_measured": vreg_ops / s}
    # op-class rates: select mix = 2 vector ops per chain step (cmp +
    # where); scalar-broadcast FMA = 1 vector op + 2 scalar loads each
    s_sel, ops_sel = _bench(kernel_select, (CHAIN // 8) * 4 * 2)
    res["select_mix_vreg_ops_per_s"] = ops_sel / s_sel
    s_sc, ops_sc = _bench(kernel_scalar_bcast, CHAIN)
    res["scalar_bcast_fma_per_s"] = ops_sc / s_sc
    print(json.dumps(res))
    out = os.path.join(os.path.dirname(__file__), "..", "ROOFLINE.json")
    if os.path.exists(out):
        with open(out) as f:
            roof = json.load(f)
        roof["model"]["vpu_vreg_ops_per_s_measured"] = vreg_ops / s
        sol_ms = roof["est_vreg_ops_per_frame"] / (vreg_ops / s) * 1e3
        roof["vpu_speed_of_light_ms_per_frame"] = round(sol_ms, 3)
        roof["vpu_speed_of_light_fps"] = round(1e3 / sol_ms, 1)
        with open(out, "w") as f:
            json.dump(roof, f, indent=1)
        print(json.dumps({"updated": out,
                          "sol_ms": round(sol_ms, 3),
                          "sol_fps": round(1e3 / sol_ms, 1)}))


if __name__ == "__main__":
    main()
