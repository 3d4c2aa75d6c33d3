"""Decompose the production frame time: kernel vs XLA glue.

Times, on the real chip (pipelined dispatch, block once — see
bench.py for why blocked per-call timing is meaningless here):
  1. full frame        pallas_split.render (the bench.py number)
  2. fused kernel      one closest+shadow launch on fixed blocked rays
  3. camera+blocks     camera_rays + to_blocks packing
  4. one shading wave  the whitted per-bounce glue (gather + phong +
                       reflection update) on fixed kernel outputs
Frame model: full ~= camera + 3*kernel + 3*glue. Residual = dispatch
overheads / fusion differences.

Usage: python benchmarks/profile_split.py   (real chip; ~2 min)
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

jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.render import pallas_split, shading, whitted
from raytracer_tpu.render.pallas_bvh import _block_shape
from raytracer_tpu.scenes import generate_scene1


def timed(fn, n=30):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=128)
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    h, w = cfg.height, cfg.width
    out = {"device": str(jax.devices()[0]), "config": "scene1 800x600x3"}

    # 1. full frame
    full = jax.jit(lambda c: pallas_split.render(
        sc.flat, None, c, sc.light, cfg, split=split))
    out["full_frame_ms"] = round(timed(lambda: full(sc.camera)), 3)

    # 3. camera rays + block packing (the pre-kernel XLA work)
    tile = cfg.tile_h * cfg.tile_w
    bh, bw = _block_shape(tile)
    hp, wp = -(-h // bh) * bh, -(-w // bw) * bw

    @jax.jit
    def cam_blocks(camera):
        o, d = cam_ops.camera_rays(camera, w, h)
        ys = jnp.arange(h, dtype=jnp.float32) / h
        bg = jnp.broadcast_to(shading.background(ys)[:, None, :], (h, w, 3))

        def to_blocks(x, fill=0.0):
            x = jnp.pad(x, ((0, hp - h), (0, wp - w), (0, 0)),
                        constant_values=fill)
            x = x.reshape(hp // bh, bh, wp // bw, bw, 3)
            return x.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

        return (to_blocks(o, whitted.PARK_ORIGIN),
                to_blocks(d, whitted._PARK_DIR), to_blocks(bg))

    o_b, d_b, bg_b = jax.block_until_ready(cam_blocks(sc.camera))
    out["camera_blocks_ms"] = round(timed(lambda: cam_blocks(sc.camera)), 3)

    # 2. fused kernel launch (closest + shadow, one wave)
    closest = pallas_split.make_closest_hit(split, cfg)
    lp = jnp.asarray(sc.light.position, jnp.float32)
    fused = jax.jit(lambda o, d: closest.fused_shadow(o, d, lp))
    out["fused_kernel_ms"] = round(timed(lambda: fused(o_b, d_b)), 3)

    # plain (non-fused) closest for comparison
    plain = jax.jit(lambda o, d: closest(o, d))
    out["closest_kernel_ms"] = round(timed(lambda: plain(o_b, d_b)), 3)

    # 4. one shading wave: gather + phong + shadow select + reflection
    t, sid, hit, in_shadow = jax.block_until_ready(fused(o_b, d_b))
    attr_tab = whitted._attr_table(sc.flat)
    light_pos = jnp.asarray(sc.light.position, jnp.float32)
    light_color = jnp.asarray(sc.light.color, jnp.float32)

    @jax.jit
    def shade_wave(o, d, t, sid, hit, in_shadow, atten, accum, bg):
        miss_now = ~hit
        accum = accum + jnp.where(miss_now[..., None], atten * bg, 0.0)
        p = o + t[..., None] * d
        row = jnp.take(attr_tab, sid, axis=0)
        mat_color = row[:, 3:6]
        k_a, k_d, k_s = row[:, 6], row[:, 7], row[:, 8]
        shin = row[:, 10]
        rel = p - row[:, 11:14]
        inv = jax.lax.rsqrt(jnp.sum(rel * rel, -1, keepdims=True) + 1e-30)
        n = row[:, 14:15] * (rel * inv) + (1.0 - row[:, 14:15]) * row[:, 0:3]
        color = shading.phong(p, n, d, light_pos, light_color, mat_color,
                              k_a, k_d, k_s, shin, attenuate=True)
        color = jnp.where(in_shadow[..., None],
                          color * shading.SHADOW_FACTOR, color)
        accum = accum + jnp.where(hit[..., None], atten * color, 0.0)
        new_d = whitted.reflect(d, n)
        new_o = p + n * 1e-3
        cont = hit & (k_s > 0)
        atten = jnp.where(cont[..., None], atten * k_s[..., None], atten)
        o = jnp.where(cont[..., None], new_o, o)
        d = jnp.where(cont[..., None], new_d, d)
        return o, d, atten, accum

    atten = jnp.ones_like(o_b)
    accum = jnp.zeros_like(o_b)
    out["shade_wave_ms"] = round(
        timed(lambda: shade_wave(o_b, d_b, t, sid, hit, in_shadow,
                                 atten, accum, bg_b)), 3)

    # frame model
    model = (out["camera_blocks_ms"] + 3 * out["fused_kernel_ms"]
             + 3 * out["shade_wave_ms"])
    out["model_ms"] = round(model, 3)
    out["residual_ms"] = round(out["full_frame_ms"] - model, 3)
    out["fps_from_full"] = round(1e3 / out["full_frame_ms"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
