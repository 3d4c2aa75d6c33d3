"""A/B: does bf16 double VPU element throughput on this chip for the
intersection workload's op mix? (VERDICT r4 next-round item 1: bf16
packs 2 elements per 32-bit lane; if the VPU executes packed bf16
compare/select/FMA at the same vreg-op rate as f32, element throughput
doubles — the one untried op-count lever.)

Measures, per dtype, a chain of (a) independent FMAs and (b) cmp+select
pairs over tiles holding the SAME vreg count (f32 (16,128) vs bf16
(32,128) — both 2 vregs), reporting element-ops/s. A bf16/f32 ratio
~2x means packed execution; ~1x means bf16 ops are unpacked and the
whole reduced-precision direction is dead on this hardware.

Usage: python benchmarks/bf16_ab.py   (real chip)
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

GRID = 235
CHAIN = 512


def make_fma(dtype):
    # Python-float scalars stay weakly typed -> ops keep the array dtype
    def kernel(x_ref, o_ref):
        a = x_ref[0]
        b = x_ref[0] * 1.0001
        c = x_ref[0] * 0.9999
        d = x_ref[0] + 0.5
        for _ in range(CHAIN // 4):
            a = a * 1.000001 + 0.25
            b = b * 1.000001 + 0.125
            c = c * 1.000001 + 0.0625
            d = d * 1.000001 + 0.03125
        o_ref[0] = a + b + c + d
    return kernel


def make_select(dtype):
    def kernel(x_ref, o_ref):
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
    return kernel


def bench(kern, th, tw, dtype, elem_ops_per_item):
    x = jnp.ones((GRID, th, tw), dtype)
    fn = jax.jit(lambda a: pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((GRID, th, tw), dtype),
    )(a))
    jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(3):
        n = 50
        t0 = time.perf_counter()
        outs = [fn(x) for _ in range(n)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / n)
    elem_ops = GRID * th * tw * elem_ops_per_item
    return best, elem_ops / best


def main():
    res = {"note": "bf16 select mix is UNSUPPORTED on this target: "
                   "Mosaic rejects arith.cmpf on vector<8x128x2xbf16> "
                   "('Target does not support this comparison') — "
                   "packed bf16 compares do not exist on v5e, so the "
                   "compare/select-heavy intersection mix cannot run "
                   "packed. Only the FMA chain is measured."}
    for name, maker, ops in (("fma", make_fma, CHAIN),):
        s32, r32 = bench(maker(jnp.float32), 16, 128, jnp.float32, ops)
        s16, r16 = bench(maker(jnp.bfloat16), 32, 128, jnp.bfloat16, ops)
        res[name] = {
            "f32_s_per_launch": round(s32 * 1e6, 1),
            "bf16_s_per_launch": round(s16 * 1e6, 1),
            "f32_elem_ops_per_s": r32,
            "bf16_elem_ops_per_s": r16,
            "bf16_over_f32": round(r16 / r32, 3),
        }
    print(json.dumps(res, indent=1))
    out = os.path.join(os.path.dirname(__file__), "..", "BF16_AB.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
