"""Multi-device scaling benchmark: rays/s vs mesh size.

On real hardware this measures ICI scaling of the image-plane sharding
(the BASELINE.md >=85% efficiency target); on a CPU host it exercises the
same code over --xla_force_host_platform_device_count virtual devices
(functional, not a perf statement).

  python benchmarks/scaling.py --devices 1 2 4 8 --width 320 --height 240
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--bounces", type=int, default=3)
    p.add_argument("--scene", type=int, default=1)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax

    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.parallel import make_mesh, render_sharded
    from raytracer_tpu.scenes import generate_scene

    cfg = RenderConfig(width=args.width, height=args.height,
                       max_bounces=args.bounces,
                       ray_chunk=args.width * args.height)
    sc = generate_scene(args.scene, aspect=args.width / args.height)

    out = {"scene": sc.name, "width": args.width, "height": args.height,
           "platform": jax.devices()[0].platform,
           "available_devices": len(jax.devices()), "results": {}}
    base = None
    for n in args.devices:
        if n > len(jax.devices()):
            out["results"][n] = "unavailable"
            continue
        mesh = make_mesh(n)
        fn = lambda: render_sharded(sc.flat, sc.camera, sc.light, cfg, mesh)
        jax.block_until_ready(fn())
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        rays_s = args.width * args.height / min(ts)
        entry = {"min_s": min(ts), "rays_per_s": rays_s}
        if base is None:
            base = rays_s
        entry["efficiency_vs_1dev"] = rays_s / (base * n)
        out["results"][n] = entry
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
