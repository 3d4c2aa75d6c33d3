"""Round benchmark: scene 1 "monkeys" (1240 shapes) at 800x600, 3 bounces —
the reference's headline config (README.md:4: 30+ FPS on an RTX 3070).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is FPS / 30 (the reference's published number).

Tries the available renderers and reports the fastest.
"""

import json
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_FPS = 30.0

# Per-candidate wall-clock budget: the remote Mosaic compile service can
# wedge indefinitely; skip to the next renderer rather than hang the bench.
CANDIDATE_TIMEOUT_S = 420


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def main():
    import jax
    import numpy as np

    from raytracer_tpu.accel import build_bvh, linearize
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.scenes import generate_scene1

    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=256)
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))

    candidates = []

    def add(name, fn):
        candidates.append((name, fn))

    try:
        from raytracer_tpu.render import pallas_split

        split = pallas_split.prepare(sc.flat, bvh, tri_max_depth=20)
        add("pallas_split", lambda: pallas_split.render(
            sc.flat, bvh, sc.camera, sc.light, cfg, split=split))
    except Exception:
        pass
    try:
        from raytracer_tpu.render import pallas_bvh

        add("pallas_bvh", lambda: pallas_bvh.render(sc.flat, bvh, sc.camera,
                                                    sc.light, cfg))
    except Exception:
        pass
    from raytracer_tpu.render import wavefront

    add("wavefront", lambda: wavefront.render(sc.flat, bvh, sc.camera,
                                              sc.light, cfg))
    # last resort: the pure-XLA brute-force oracle — slow but avoids the
    # Mosaic compile service entirely (it has been observed to wedge)
    from raytracer_tpu.accel.linearize import shape_leaf_boxes
    from raytracer_tpu.render.reference import render as render_ref

    lb = shape_leaf_boxes(bvh, sc.flat.num_shapes)
    cfg_ref = cfg.replace(ray_chunk=24000)  # bounded (R,N) intermediates
    add("reference_oracle", lambda: render_ref(sc.flat, sc.camera, sc.light,
                                               cfg_ref, leaf_boxes=lb))

    best = None
    details = {}
    signal.signal(signal.SIGALRM, _alarm)
    for name, fn in candidates:
        try:
            signal.alarm(CANDIDATE_TIMEOUT_S)
            jax.block_until_ready(fn())  # compile + warm
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(fn())
                times.append(time.perf_counter() - t0)
            signal.alarm(0)
            mean = sum(times) / len(times)
            details[name] = round(1.0 / mean, 3)
            if best is None or mean < best[1]:
                best = (name, mean)
            if 1.0 / mean > 5.0:
                # good result in hand — don't risk further compile-service
                # exposure benchmarking slower candidates
                break
        except _Timeout:
            details[name] = "error: compile/run timeout"
        except Exception as e:  # renderer unavailable on this backend
            details[name] = f"error: {type(e).__name__}"
        finally:
            signal.alarm(0)
    if best is None:
        print(json.dumps({"metric": "scene1_800x600_fps", "value": 0.0,
                          "unit": "fps", "vs_baseline": 0.0,
                          "error": str(details)}))
        return

    name, mean = best
    fps = 1.0 / mean
    print(json.dumps({
        "metric": "scene1_800x600_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "renderer": name,
        "mpixels_per_s": round(800 * 600 * fps / 1e6, 2),
        "all": details,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
