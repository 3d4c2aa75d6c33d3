"""Render configuration.

The reference scatters configuration across three tiers (compile-time consts,
ImGui-mutated globals, GPU uniforms — src/main.cpp:46,113-138,357-361 and
src/shaders/gpu_shader.comp:126-130). Here it is a single hashable dataclass
passed statically into jit'd renderers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render settings (hashable; safe as a jit static argument).

    Mirrors the reference's uniforms/globals:
      width/height   <- WIDTH/HEIGHT (src/main.cpp:113-114; default 800x600)
      max_bounces    <- maxBounces (src/main.cpp:135; ImGui range 1-10)
      use_bvh        <- useBVH (src/main.cpp:137)
      use_fresnel    <- useFresnel (src/main.cpp:136)
      use_mt         <- useMollerTrumbore (src/main.cpp:118); switches the
                        triangle test between barycentric and Moller-Trumbore
                        (gpu_shader.comp:317-325)
    TPU-side knobs have no reference analogue:
      ray_chunk      rays per lax.map chunk in the oracle renderer
      tile_h/tile_w  Pallas kernel tile shape (pixels per program)
    """

    width: int = 800
    height: int = 600
    max_bounces: int = 3
    use_bvh: bool = True
    use_fresnel: bool = False
    use_mt: bool = False
    # Shadow rays on/off. The reference GPU path always shadows; disabling
    # matches the CPU path's look (and halves traversal work) — an
    # extension knob, default-on for parity.
    enable_shadows: bool = True

    # Shadow-ray surface offset: the reference uses 1e-3 in the BVH path and
    # 1e-5 in the non-BVH path (gpu_shader.comp:469,565).
    @property
    def shadow_eps(self) -> float:
        return 1e-3 if self.use_bvh else 1e-5

    # Reflection-ray surface offset (gpu_shader.comp:498,598): always 1e-3.
    reflect_eps: float = 1e-3

    # TPU execution knobs.
    ray_chunk: int = 8192
    tile_h: int = 16
    tile_w: int = 128
    interpret: Optional[bool] = None  # Pallas interpret mode; None = auto
    # Re-sort bounce-wave rays into coherent packets between bounces
    # (direction-octant + origin-Morton key, parked lanes compacted to
    # the tail). Per-lane hit decisions are exact — packet composition
    # changes which tree nodes a TILE visits, never a lane's own closest
    # hit — and colors match the unsorted frame up to f32 add
    # reassociation (the split accumulation reassociates sums). Pays one
    # lax.sort per re-pack; wins when divergent bounce waves dominate
    # (census: 83-88% of leaf tests — benchmarks/sort_eval.py measured
    # 2.69x fewer leaf iterations on scene 2, 1.56x on scene 1).
    # Two routes, picked in pallas_split._render_impl: when in-kernel
    # raygen is usable and max_bounces >= 2, the wholeframe
    # sorted-continuation hybrid (bounce-1 megakernel + sort + a
    # continuation megakernel over the re-packed survivors); otherwise
    # the per-bounce whitted.trace path, which sorts between separate
    # per-bounce kernel launches.
    sort_bounces: bool = False
    # With sort_bounces on the wholeframe hybrid: insert a SECOND
    # re-pack between bounce 2 and 3 (3 launches), so bounce-3 rays get
    # their own clustering instead of inheriting bounce-2's. The sort
    # NETWORK itself is cheap (~0.14 ms for 14 columns at 506K rows,
    # benchmarks/sort_cost_ab.py — the hybrid's "sort" budget is mostly
    # the surrounding relayout glue); whether the extra launch + glue
    # pays is scene-dependent, so this is a separate toggle. Only
    # active when max_bounces >= 3 and the hybrid route is taken.
    # Measured NEGATIVE on scene 2 (benchmarks/second_sort_ab.py, v5e:
    # 66.6 vs 68.75 FPS, bit-exact) — bounce-3 re-clustering saves less
    # than the third launch + re-pack glue costs; default stays off.
    second_sort: bool = False
    # Gram-fused barycentric triangle test (v,w from precomputed
    # Ev/cv/Ew/cw row constants; 12 scalar loads vs 15, no hit point).
    # Same accept set in exact arithmetic; f32 reassociation can flip
    # accepts exactly on triangle edges. False = the raw-column test,
    # bit-exact vs the oracle's hit-point formulation. Part of the
    # hashable config so jit cache keys track it.
    use_gram_tri: bool = True

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    @property
    def num_pixels(self) -> int:
        return self.width * self.height
