"""Round benchmark: scene 1 "monkeys" (1240 shapes) at 800x600, 3 bounces —
the reference's headline config (README.md:4: 30+ FPS on an RTX 3070).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is FPS / 30 (the reference's published number).

Robustness: the TPU remote Mosaic compile service intermittently wedges,
and a blocked compile IGNORES signals (SIGALRM never fires) — so each
renderer candidate runs in a SUBPROCESS that can be hard-killed on
timeout. Candidates are tried in speed order; once one exceeds 5 FPS the
rest are skipped; the pure-XLA oracle (no Pallas, never wedges) is the
last resort.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_FPS = 30.0
CANDIDATE_TIMEOUT_S = 420
CANDIDATES = ["pallas_split", "pallas_bvh", "wavefront", "reference_oracle"]


def _run_candidate(name: str):
    """Child-process entry: benchmark one renderer, print one JSON line."""
    import jax

    from raytracer_tpu.accel import build_bvh, linearize
    from raytracer_tpu.config import RenderConfig
    from raytracer_tpu.scenes import generate_scene1

    cfg = RenderConfig(width=800, height=600, max_bounces=3, use_bvh=True,
                       ray_chunk=480000, tile_h=16, tile_w=128)
    sc = generate_scene1()
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))

    if name == "pallas_split":
        from raytracer_tpu.render import pallas_split

        split = pallas_split.prepare(sc.flat, bvh)
        fn = lambda: pallas_split.render(sc.flat, bvh, sc.camera, sc.light,
                                         cfg, split=split)
    elif name == "pallas_bvh":
        from raytracer_tpu.render import pallas_bvh

        fn = lambda: pallas_bvh.render(sc.flat, bvh, sc.camera, sc.light,
                                       cfg)
    elif name == "wavefront":
        from raytracer_tpu.render import wavefront

        fn = lambda: wavefront.render(sc.flat, bvh, sc.camera, sc.light,
                                      cfg)
    else:  # reference_oracle: pure XLA, no Pallas
        from raytracer_tpu.accel.linearize import shape_leaf_boxes
        from raytracer_tpu.render.reference import render as render_ref

        lb = shape_leaf_boxes(bvh, sc.flat.num_shapes)
        cfg_ref = cfg.replace(ray_chunk=24000)
        fn = lambda: render_ref(sc.flat, sc.camera, sc.light, cfg_ref,
                                leaf_boxes=lb)

    jax.block_until_ready(fn())  # compile + warm

    # Throughput: dispatch a pipelined stream of frames and block once at
    # the end — the metric an interactive render loop sees (the reference's
    # GL loop equally overlaps CPU and GPU frames). On this TPU attachment
    # a per-frame host sync costs a fixed ~30ms tunnel round-trip that has
    # nothing to do with device compute, so the blocked per-frame latency
    # is reported separately.
    nframes = 20
    t0 = time.perf_counter()
    outs = [fn() for _ in range(nframes)]
    jax.block_until_ready(outs)
    fps = nframes / (time.perf_counter() - t0)

    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        lat.append(time.perf_counter() - t0)
    print(json.dumps({"__bench__": name, "fps": fps,
                      "blocked_latency_ms": round(min(lat) * 1e3, 1),
                      "device": str(jax.devices()[0])}))


def main():
    best = None
    details = {}
    device = "unknown"
    for name in CANDIDATES:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--candidate", name],
                capture_output=True, text=True,
                timeout=CANDIDATE_TIMEOUT_S)
            line = None
            for ln in proc.stdout.splitlines():
                if ln.startswith('{"__bench__"'):
                    line = json.loads(ln)
            if line is None:
                err = (proc.stderr or "").strip().splitlines()
                details[name] = "error: " + (err[-1][:120] if err
                                             else "no output")
                continue
            fps = line["fps"]
            device = line.get("device", device)
            details[name] = round(fps, 3)
            details[name + "_blocked_latency_ms"] = \
                line.get("blocked_latency_ms")
            if best is None or fps > best[1]:
                best = (name, fps)
            if fps > 5.0:
                break  # good result; minimize compile-service exposure
        except subprocess.TimeoutExpired:
            details[name] = "error: timeout (compile service wedged?)"
        except Exception as e:  # pragma: no cover
            details[name] = f"error: {type(e).__name__}"

    if best is None:
        print(json.dumps({"metric": "scene1_800x600_fps", "value": 0.0,
                          "unit": "fps", "vs_baseline": 0.0,
                          "all": details}))
        return
    name, fps = best
    print(json.dumps({
        "metric": "scene1_800x600_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
        "renderer": name,
        "mpixels_per_s": round(800 * 600 * fps / 1e6, 2),
        "all": details,
        "device": device,
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--candidate":
        _run_candidate(sys.argv[2])
    else:
        main()
