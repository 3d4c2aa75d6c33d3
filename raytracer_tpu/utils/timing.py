"""Timing / throughput instrumentation.

The reference's only metric is the ImGui FPS readout computed from
glfwGetTime deltas with vsync off (src/main.cpp:296-300, 375, 175). Here:
a FrameTimer with the same delta/fps semantics for the interactive loop,
plus a benchmark() helper that reports wall time per jitted call with
jax.block_until_ready (the TPU equivalent of the glMemoryBarrier+swap
timing boundary) and derived Mrays/s.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict

import jax


@dataclasses.dataclass
class FrameTimer:
    """deltaTime/fps bookkeeping (main.cpp:292-300)."""

    last_frame: float = 0.0
    delta_time: float = 0.0
    fps: float = 0.0
    frames: int = 0

    def tick(self, now: float = None) -> float:
        now = time.perf_counter() if now is None else now
        if self.frames:
            self.delta_time = now - self.last_frame
            self.fps = 1.0 / self.delta_time if self.delta_time > 0 else 0.0
        self.last_frame = now
        self.frames += 1
        return self.delta_time


def benchmark(fn: Callable, *args, warmup: int = 2, iters: int = 10,
              rays_per_call: int = None, **kw) -> Dict[str, float]:
    """Time a device function with proper synchronization.

    Returns dict with mean/min seconds per call, fps, and Mrays/s when
    rays_per_call is given (rays = pixels * (1 primary + 1 shadow) *
    bounces is the caller's choice — report what you pass).
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    mean = sum(times) / len(times)
    out = {
        "mean_s": mean,
        "min_s": min(times),
        "fps": 1.0 / mean if mean > 0 else float("inf"),
        "iters": iters,
    }
    if rays_per_call:
        out["mrays_per_s"] = rays_per_call / mean / 1e6
    return out
