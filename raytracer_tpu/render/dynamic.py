"""Fully on-device animated frame pipeline: animate -> LBVH rebuild ->
render, all inside one jit.

The reference animates by mutating C++ objects, re-serializing changed
shapes into the SSBO (updateScene, src/main.cpp:981-992) and grow-refitting
the BVH (updateBVH, main.cpp:1068-1077) on the CPU every frame. Here every
step is a traced function of the scene pytree: bounce/wheel transforms
(anim/), per-shape AABBs (geom.aabb.shape_aabbs_jnp), a full LBVH REBUILD
(accel/lbvh.py, no quality decay), and the renderer — so an animation
loop is a single compiled program per frame with zero host round trips.
"""

from __future__ import annotations

from typing import Callable

import jax

from raytracer_tpu.accel.lbvh import build_lbvh, node_cullable_flags_device
from raytracer_tpu.anim.animation import bounce_spheres, rotate_wheels
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core.scene import FlatScene, WALL
from raytracer_tpu.core.types import Camera, Light
from raytracer_tpu.geom.aabb import shape_aabbs_jnp, shape_centers_jnp
from raytracer_tpu.geom.direct import wall_basis
from raytracer_tpu.render import pallas_bvh, wavefront


def make_frame_fn(scene_meta, cfg: RenderConfig,
                  renderer: str = "wavefront") -> Callable:
    """Build frame(flat, camera, light, elapsed_t, delta_t) -> (image,
    flat') — one jitted animated frame with on-device LBVH rebuild.

    ``scene_meta``: a scenes.Scene (for bounce_params / wheels metadata;
    static). renderer: "wavefront" (XLA gathers), "pallas" (packet
    kernel), or "split" (the production split kernel — fastest; valid
    when the animation moves only non-triangle shapes, i.e. no wheels:
    the static triangle BVH is reused and only the pre-pass rows are
    refreshed on device via pallas_split.update_pre_rows).
    """
    bounce_params = tuple(scene_meta.bounce_params)
    wheels = scene_meta.wheels

    if renderer == "split":
        from raytracer_tpu.accel.bvh import build_bvh
        from raytracer_tpu.accel.linearize import linearize as _linearize
        from raytracer_tpu.render import pallas_split
        ref_lin = _linearize(build_bvh(scene_meta.flat,
                                       scene_meta.bvh_max_depth))
        split0 = pallas_split.prepare(scene_meta.flat, ref_lin)

        # split0 is passed as a traced argument, not a closure capture:
        # executables with embedded array constants pay a fixed ~30ms
        # blocked-dispatch penalty on the tunnel attachment (bench.py).
        @jax.jit
        def _frame_split(split_in, flat: FlatScene, camera: Camera,
                         light: Light, elapsed_t, delta_t):
            if bounce_params:
                flat = bounce_spheres(flat, bounce_params, elapsed_t)
            if wheels:
                # triangles move: refresh tri rows + refit the tri tree
                # on device (pallas_split.update_tri_rows)
                flat = rotate_wheels(flat, wheels, delta_t)
                split = pallas_split.update_dynamic(split_in, flat)
            else:
                split = pallas_split.update_pre_rows(split_in, flat)
            img = pallas_split._render_impl(flat, split, camera, light,
                                            cfg)
            return img, flat

        def frame_split(flat, camera, light, elapsed_t, delta_t):
            return _frame_split(split0, flat, camera, light, elapsed_t,
                                delta_t)

        return frame_split

    @jax.jit
    def frame(flat: FlatScene, camera: Camera, light: Light, elapsed_t,
              delta_t):
        if bounce_params:
            flat = bounce_spheres(flat, bounce_params, elapsed_t)
        if wheels:
            flat = rotate_wheels(flat, wheels, delta_t)

        mins, maxs = shape_aabbs_jnp(flat)
        centers = shape_centers_jnp(flat)
        lin = build_lbvh(mins, maxs, centers)

        if renderer == "pallas":
            _, _, wdeg = wall_basis(flat.plane_normal)
            mask = wdeg & (flat.shape_type == WALL)
            flags = node_cullable_flags_device(lin, mask)
            img = pallas_bvh._render_impl(flat, lin, flags, camera, light,
                                          cfg, True)
        else:
            img = wavefront.render(flat, lin, camera, light, cfg)
        return img, flat

    return frame
