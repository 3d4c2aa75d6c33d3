"""Benchmark harness: per-config throughput + gradient timings as JSON.

Replaces the reference's single on-screen FPS counter (SURVEY.md §5
tracing) with a scriptable suite. Run on whatever backend jax selects:

  python benchmarks/harness.py --scene 1 --renderers wavefront pallas_bvh
  python benchmarks/harness.py --all --out results.json
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_one(fn, warmup=1, iters=5):
    import jax

    jax.block_until_ready(fn())
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return {"mean_s": sum(ts) / len(ts), "min_s": min(ts),
            "fps": 1.0 / min(ts)}


def run(scene_id, renderers, width, height, bounces, iters):
    import jax

    from raytracer_tpu.accel import build_bvh, linearize
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.scenes import generate_scene

    cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                       tile_h=16, tile_w=256, ray_chunk=width * height)
    sc = generate_scene(scene_id, aspect=width / height)
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))

    out = {"scene": sc.name, "width": width, "height": height,
           "bounces": bounces, "device": str(jax.devices()[0]),
           "results": {}}

    fns = {}
    if "wavefront" in renderers:
        from raytracer_tpu.render import wavefront
        fns["wavefront"] = lambda: wavefront.render(
            sc.flat, bvh, sc.camera, sc.light, cfg)
    if "pallas_bvh" in renderers:
        from raytracer_tpu.render import pallas_bvh
        fns["pallas_bvh"] = lambda: pallas_bvh.render(
            sc.flat, bvh, sc.camera, sc.light, cfg)
    if "pallas_split" in renderers:
        from raytracer_tpu.render import pallas_split
        split = pallas_split.prepare(sc.flat, bvh)
        fns["pallas_split"] = lambda: pallas_split.render(
            sc.flat, bvh, sc.camera, sc.light, cfg, split=split)
    if "pallas_brute" in renderers:
        from raytracer_tpu.render import pallas_kernel
        fns["pallas_brute"] = lambda: pallas_kernel.render(
            sc.flat, bvh, sc.camera, sc.light, cfg)
    if "reference" in renderers:
        from raytracer_tpu.render.reference import render as render_ref
        fns["reference"] = lambda: render_ref(sc.flat, sc.camera, sc.light,
                                              cfg)

    for name, fn in fns.items():
        try:
            r = bench_one(fn, iters=iters)
            r["mpixels_per_s"] = width * height * r["fps"] / 1e6
            out["results"][name] = r
        except Exception as e:
            out["results"][name] = {"error": f"{type(e).__name__}: {e}"}
    return out


def grad_timing(scene_id, width, height, bounces, iters):
    """Forward vs backward wall time (the BASELINE.md fwd/bwd-ratio
    metric) through BOTH differentiable paths: the pure-XLA oracle and
    the production split kernel (stop-grad hits + re-derived t,
    diff/kernel_vjp.py)."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.accel import build_bvh, linearize
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.render import pallas_split
    from raytracer_tpu.render.reference import render as render_ref
    from raytracer_tpu.scenes import generate_scene

    cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                       ray_chunk=width * height)
    sc = generate_scene(scene_id, aspect=width / height)
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)
    cfg_k = cfg.replace(use_bvh=True, tile_h=16, tile_w=128)
    target = render_ref(sc.flat, sc.camera, sc.light, cfg)

    def loss_oracle(center):
        s = sc.flat.replace(sphere_center=center)
        img = render_ref(s, sc.camera, sc.light, cfg)
        return jnp.mean((img - target) ** 2)

    def loss_kernel(center):
        s = sc.flat.replace(sphere_center=center)
        img = pallas_split.render(s, bvh, sc.camera, sc.light, cfg_k,
                                  split=split, differentiable=True)
        return jnp.mean((img - target) ** 2)

    def pipelined_s(fn, n=10):
        """Per-call time over a dispatched stream (block once): excludes
        the fixed per-sync host/tunnel round-trip that would otherwise
        dominate small configs and flatten the bwd/fwd ratio."""
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / n

    out = {}
    x = sc.flat.sphere_center
    for name, loss in (("oracle", loss_oracle), ("kernel", loss_kernel)):
        fwd = jax.jit(loss)
        bwd = jax.jit(jax.value_and_grad(loss))
        f = pipelined_s(lambda: fwd(x))
        b = pipelined_s(lambda: bwd(x))
        out[name] = {"forward_s": f, "value_and_grad_s": b,
                     "bwd_over_fwd": b / f}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", type=int, default=1)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--bounces", type=int, default=3)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--renderers", nargs="+",
                   default=["pallas_bvh", "wavefront"])
    p.add_argument("--out", default=None)
    p.add_argument("--grad", action="store_true",
                   help="also time forward vs value_and_grad (oracle)")
    args = p.parse_args()

    res = run(args.scene, args.renderers, args.width, args.height,
              args.bounces, args.iters)
    if args.grad:
        res["grad"] = grad_timing(args.scene, min(args.width, 160),
                                  min(args.height, 120), args.bounces,
                                  args.iters)
    text = json.dumps(res, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main()
