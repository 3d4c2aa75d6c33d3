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
    """Forward vs backward wall time through the differentiable oracle
    (the BASELINE.md fwd/bwd-ratio metric)."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.render.reference import render as render_ref
    from raytracer_tpu.scenes import generate_scene

    cfg = RenderConfig(width=width, height=height, max_bounces=bounces,
                       ray_chunk=width * height)
    sc = generate_scene(scene_id, aspect=width / height)
    target = render_ref(sc.flat, sc.camera, sc.light, cfg)

    def loss(center):
        s = sc.flat.replace(sphere_center=center)
        img = render_ref(s, sc.camera, sc.light, cfg)
        return jnp.mean((img - target) ** 2)

    fwd = jax.jit(loss)
    bwd = jax.jit(jax.value_and_grad(loss))
    x = sc.flat.sphere_center
    f = bench_one(lambda: fwd(x), iters=iters)
    b = bench_one(lambda: bwd(x), iters=iters)
    return {"forward_s": f["min_s"], "value_and_grad_s": b["min_s"],
            "bwd_over_fwd": b["min_s"] / f["min_s"]}


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
