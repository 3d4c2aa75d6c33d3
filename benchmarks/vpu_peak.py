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


def main():
    x = jnp.ones((GRID, TH, TW), jnp.float32)
    fn = jax.jit(lambda x: pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((GRID, TH, TW), jnp.float32),
    )(x))
    jax.block_until_ready(fn(x))
    n = 50
    t0 = time.perf_counter()
    outs = [fn(x) for _ in range(n)]
    jax.block_until_ready(outs)
    s = (time.perf_counter() - t0) / n
    vregs_per_tile = (TH * TW) // (8 * 128)
    # each chain step is one FMA = 1 vector op issue
    vreg_ops = GRID * CHAIN * vregs_per_tile
    res = {"measured_s_per_launch": s,
           "vreg_ops_per_launch": vreg_ops,
           "vpu_vreg_ops_per_s_measured": vreg_ops / s}
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
