"""Where do the 19.6ms/frame go? Times, each as a pipelined stream with
scene tables passed as jit ARGS (closure constants defeat pipelining —
see dispatch_ab.py):

  full    — the production frame (3 fused waves + XLA shading glue)
  kernels — 3 chained fused closest+shadow launches only, no shading
  glue    — the frame with DEBUG_CONST_SHADE (gather replaced by consts)
  raygen  — camera rays + to_blocks + background only

Prints one JSON line per measurement.
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


def timed(fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=128)
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)

    full = timed(lambda: pallas_split.render(
        sc.flat, bvh, sc.camera, sc.light, cfg, split=split))
    print(json.dumps({"stage": "full_frame", "ms": round(full, 2),
                      "fps": round(1e3 / full, 1)}), flush=True)

    # --- raygen + blocking glue only
    h, w = cfg.height, cfg.width
    bh, bw = _block_shape(cfg.tile_h * cfg.tile_w)
    hp, wp = -(-h // bh) * bh, -(-w // bw) * bw

    @jax.jit
    def raygen(camera):
        o, d = cam_ops.camera_rays(camera, w, h)
        ys = jnp.arange(h, dtype=jnp.float32) / h
        bg = jnp.broadcast_to(shading.background(ys)[:, None, :], (h, w, 3))

        def to_blocks(x, fill=0.0):
            x = jnp.pad(x, ((0, hp - h), (0, wp - w), (0, 0)),
                        constant_values=fill)
            x = x.reshape(hp // bh, bh, wp // bw, bw, 3)
            return x.transpose(0, 2, 1, 3, 4).reshape(-1, 3)

        return (to_blocks(o, fill=whitted.PARK_ORIGIN),
                to_blocks(d, fill=whitted._PARK_DIR), to_blocks(bg))

    rg = timed(lambda: raygen(sc.camera))
    print(json.dumps({"stage": "raygen_blocks", "ms": round(rg, 2)}),
          flush=True)

    o_b, d_b, bg_b = jax.block_until_ready(raygen(sc.camera))

    # --- 3 chained fused kernel launches, no shading between (wave i+1
    # rays derived trivially from wave i output so the chain is honest)
    def make_kernel_chain(split_arg):
        closest = pallas_split.make_closest_hit(split_arg, cfg)
        fused = closest.fused_shadow

        @jax.jit
        def chain(o, d, lp, split_tables):
            del split_tables  # tables already baked into closest's refs
            acc = jnp.zeros_like(o[:, 0])
            for _ in range(cfg.max_bounces):
                t, sid, hit, sh = fused(o, d, lp)
                acc = acc + t + sid.astype(jnp.float32) \
                    + sh.astype(jnp.float32)
                # derive next wave from outputs (keeps the dependency)
                o = o + t[:, None] * d * 1e-6
            return acc
        return chain

    chain = make_kernel_chain(split)
    kr = timed(lambda: chain(o_b, d_b, sc.light.position, None))
    print(json.dumps({"stage": "kernels_only_3x_fused",
                      "ms": round(kr, 2)}), flush=True)

    # --- glue with constant shading (gather removed)
    whitted.DEBUG_CONST_SHADE = True
    pallas_split._render_impl.clear_cache()
    cs = timed(lambda: pallas_split.render(
        sc.flat, bvh, sc.camera, sc.light, cfg, split=split))
    whitted.DEBUG_CONST_SHADE = False
    pallas_split._render_impl.clear_cache()
    print(json.dumps({"stage": "full_const_shade", "ms": round(cs, 2),
                      "gather_cost_ms": round(full - cs, 2)}), flush=True)

    print(json.dumps({
        "stage": "summary",
        "full_ms": round(full, 2),
        "kernels_ms": round(kr, 2),
        "raygen_ms": round(rg, 2),
        "xla_glue_ms": round(full - kr - rg, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
