"""BVH-accelerated wavefront renderer (pure JAX, XLA gathers).

Equivalent of the reference's useBVH=true path (intersectScene2,
gpu_shader.comp:380-430) re-designed for a vector machine: instead of a
per-thread traversal stack, every ray lane keeps a single DFS node pointer
into the skip-pointer LinearBVH (accel/linearize.py) plus a within-leaf
progress counter. One lax.while_loop iteration advances every lane by one
unit of work (an AABB test on entry to a node, or one shape test inside a
leaf); lanes that finish park at ptr == M. The visited-leaf set matches the
reference's stack walk exactly (it has no ordering/culling either), so
closest-hit results agree with the brute-force oracle.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from raytracer_tpu.accel.linearize import LinearBVH
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import FlatScene
from raytracer_tpu.core.types import Camera, Light
from raytracer_tpu.geom import rowwise
from raytracer_tpu.geom.direct import INF
from raytracer_tpu.render import shading, whitted


def make_closest_hit(bvh: LinearBVH, rows_perm: jnp.ndarray,
                     perm: jnp.ndarray, use_mt: bool = False):
    """Build a closest_hit(o, d) -> (t, shape_id, hit) traversal closure.

    rows_perm: (K, PACK_WIDTH) geometry rows already permuted into
    DFS-leaf order (rows_perm = pack_rows(scene)[perm]).
    """
    m = bvh.num_nodes
    bounds = bvh.bounds
    leaf_start = bvh.leaf_start
    leaf_count = bvh.leaf_count
    skip = bvh.skip

    def closest_hit(o: jnp.ndarray, d: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        r = o.shape[0]
        inv_d = 1.0 / d                      # GLSL 1/dir semantics (comp:365)

        def cond(state):
            ptr, *_ = state
            return jnp.any(ptr < m)

        def body(state):
            ptr, k, t_best, sid_best = state
            p = jnp.minimum(ptr, m - 1)
            nb = jnp.take(bounds, p, axis=0)            # (R, 6)
            ls = jnp.take(leaf_start, p, axis=0)
            lc = jnp.take(leaf_count, p, axis=0)
            sk = jnp.take(skip, p, axis=0)

            active = ptr < m
            entering = active & (k == 0)

            # slab test (gpu_shader.comp:364-377)
            t0 = (nb[:, 0:3] - o) * inv_d
            t1 = (nb[:, 3:6] - o) * inv_d
            tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
            box_hit = (tmax >= tmin) & (tmax > 0)

            is_leaf = lc > 0
            in_leaf = active & ((k > 0) | (entering & box_hit & is_leaf))

            # one shape test for lanes inside a leaf
            gidx = jnp.minimum(ls + k, rows_perm.shape[0] - 1)
            row = jnp.take(rows_perm, gidx, axis=0)     # (R, PACK)
            t_s, inner = rowwise.intersect_rows(row, o, d, use_mt)
            better = in_leaf & inner & (t_s < t_best)
            t_best = jnp.where(better, t_s, t_best)
            sid_best = jnp.where(better, jnp.take(perm, gidx), sid_best)

            k_next = k + 1
            leaf_done = in_leaf & (k_next >= lc)

            new_ptr = jnp.where(
                in_leaf,
                jnp.where(leaf_done, sk, ptr),
                jnp.where(entering & box_hit & ~is_leaf, ptr + 1,
                          jnp.where(entering, sk, ptr)))
            new_k = jnp.where(in_leaf & ~leaf_done, k_next, 0)
            new_ptr = jnp.where(active, new_ptr, ptr)
            return new_ptr, new_k, t_best, sid_best

        ptr0 = jnp.zeros(r, jnp.int32)
        k0 = jnp.zeros(r, jnp.int32)
        t0 = jnp.full(r, INF, jnp.float32)
        sid0 = jnp.zeros(r, jnp.int32)
        _, _, t_best, sid_best = jax.lax.while_loop(
            cond, body, (ptr0, k0, t0, sid0))
        hit = t_best < INF
        return t_best, sid_best, hit

    return closest_hit


@partial(jax.jit, static_argnames=("cfg",))
def render(scene: FlatScene, bvh: LinearBVH, camera: Camera, light: Light,
           cfg: RenderConfig) -> jnp.ndarray:
    """Render (H, W, 3) with BVH traversal — the useBVH=true frame."""
    h, w = cfg.height, cfg.width
    o, d = cam_ops.camera_rays(camera, w, h)
    ys = jnp.arange(h, dtype=jnp.float32) / h
    bg = jnp.broadcast_to(shading.background(ys)[:, None, :], (h, w, 3))

    rows = rowwise.pack_rows(scene)
    rows_perm = jnp.take(rows, bvh.perm, axis=0)
    closest = make_closest_hit(bvh, rows_perm, bvh.perm, cfg.use_mt)

    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    bg = bg.reshape(-1, 3)
    n_rays = o.shape[0]
    chunk = min(cfg.ray_chunk, n_rays)
    pad = (-n_rays) % chunk
    if pad:
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        bg = jnp.pad(bg, ((0, pad), (0, 0)))
    kk = o.shape[0] // chunk

    def body(args):
        o_, d_, bg_ = args
        return whitted.trace(scene, light, closest, o_, d_, bg_, cfg)

    colors = jax.lax.map(body, (o.reshape(kk, chunk, 3),
                                d.reshape(kk, chunk, 3),
                                bg.reshape(kk, chunk, 3)))
    return colors.reshape(-1, 3)[:n_rays].reshape(h, w, 3)
