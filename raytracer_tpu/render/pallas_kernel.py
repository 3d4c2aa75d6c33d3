"""Pallas TPU megakernel: closest-hit over the whole scene, per ray tile.

TPU-native equivalent of the reference's per-pixel compute-shader dispatch
(glDispatchCompute 800x600x1 with local_size 1x1x1, src/main.cpp:352-353,
gpu_shader.comp:108). Re-design, not a translation:

- grid over (tile_h x tile_w) RAY TILES; each program holds the whole
  scene's packed geometry table in VMEM (scene 2 is ~0.4 MB — far under
  the ~16 MB budget) and loops over shapes with per-shape scalar
  broadcasts against the full tile (dense VPU work, zero divergence);
- shapes are PRE-SORTED BY TYPE so each type runs a specialized loop
  (sphere math never executes for triangles and vice versa) — the SoA
  answer to the reference's per-thread tagged-union branching
  (gpu_shader.comp:242-328);
- the Whitted bounce/shadow loop stays in JAX (render/whitted.py): XLA
  fuses the shading, and the kernel is reused for primary, shadow and
  reflection waves alike;
- gradients: the kernel returns (t, sid, hit); for differentiable paths the
  winning shape's t is RE-DERIVED in JAX by intersecting only the
  identified shape (geom/rowwise.py) — discrete choice from the kernel,
  continuous math in autodiff land.

The same kernel runs under interpret mode on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.accel.linearize import LinearBVH, shape_leaf_boxes
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.core.scene import FlatScene, SPHERE, PLANE, WALL, TRIANGLE
from raytracer_tpu.core.types import Camera, Light
from raytracer_tpu.geom import rowwise
from raytracer_tpu.geom.direct import INF
from raytracer_tpu.render import shading, whitted

# packed row field indices (see geom/rowwise.py docstring)
F_TYPE = 0
F_CX, F_CY, F_CZ, F_R = 1, 2, 3, 4
F_NX, F_NY, F_NZ, F_PD = 5, 6, 7, 8
F_V1X, F_V1Y, F_V1Z = 9, 10, 11
F_V2X, F_V2Y, F_V2Z = 12, 13, 14
F_V3X, F_V3Y, F_V3Z = 15, 16, 17
F_S0, F_S1, F_S2, F_S3, F_S4 = 18, 19, 20, 21, 22
F_WDEG = 23
# leaf-box gating fields appended for BVH-visibility mode
F_B0X, F_B0Y, F_B0Z, F_B1X, F_B1Y, F_B1Z = 24, 25, 26, 27, 28, 29
PACK_EXT = 30


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _auto_interpret(cfg: RenderConfig) -> bool:
    return (not _on_tpu()) if cfg.interpret is None else cfg.interpret


def sort_scene_by_type(scene: FlatScene):
    """Stable type-sort permutation + per-type counts (static metadata)."""
    st = np.asarray(scene.shape_type)
    perm = np.argsort(st, kind="stable").astype(np.int32)
    counts = tuple(int((st == k).sum())
                   for k in (SPHERE, PLANE, WALL, TRIANGLE))
    return jnp.asarray(perm), counts


def pack_rows_ext(scene: FlatScene, perm: jnp.ndarray,
                  leaf_boxes=None) -> jnp.ndarray:
    """(N, PACK_EXT) rows in ``perm`` order with optional leaf-box columns.
    Without leaf boxes the box is [-INF, +INF] (never gates)."""
    rows = rowwise.pack_rows(scene)
    n = rows.shape[0]
    if leaf_boxes is None:
        bmin = jnp.full((n, 3), -INF, jnp.float32)
        bmax = jnp.full((n, 3), INF, jnp.float32)
    else:
        bmin, bmax = leaf_boxes
    rows = jnp.concatenate([rows, bmin, bmax], axis=1)
    return jnp.take(rows, perm, axis=0)


def _closest_hit_kernel(rows_ref, rays_ref, t_ref, sid_ref,
                        *, counts, n_pad, use_mt, gate_boxes):
    """One program = one (TH, TW) ray tile vs the whole scene."""
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]

    aa = dx * dx + dy * dy + dz * dz
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz

    shape = ox.shape
    t0 = jnp.full(shape, INF, jnp.float32)
    s0 = jnp.zeros(shape, jnp.int32)

    n_sph, n_pl, n_wall, n_tri = counts
    off_pl = n_sph
    off_wall = n_sph + n_pl
    off_tri = n_sph + n_pl + n_wall

    def gate(i, inner, t):
        """leaf-box slab test (gpu_shader.comp:364-377) as visibility gate."""
        if not gate_boxes:
            return inner
        tx0 = (rows_ref[i, F_B0X] - ox) * inv_dx
        tx1 = (rows_ref[i, F_B1X] - ox) * inv_dx
        ty0 = (rows_ref[i, F_B0Y] - oy) * inv_dy
        ty1 = (rows_ref[i, F_B1Y] - oy) * inv_dy
        tz0 = (rows_ref[i, F_B0Z] - oz) * inv_dz
        tz1 = (rows_ref[i, F_B1Z] - oz) * inv_dz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                       jnp.maximum(ty0, ty1)),
                           jnp.maximum(tz0, tz1))
        return inner & (tmax >= tmin) & (tmax > 0)

    def update(carry, i, t, inner):
        t_best, sid_best = carry
        better = inner & (t < t_best)
        return (jnp.where(better, t, t_best),
                jnp.where(better, i, sid_best))

    def sphere_body(i, carry):
        ocx = ox - rows_ref[i, F_CX]
        ocy = oy - rows_ref[i, F_CY]
        ocz = oz - rows_ref[i, F_CZ]
        r = rows_ref[i, F_R]
        bb = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = bb * bb - 4.0 * aa * cc
        sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
        t = (-bb - sq) / (2.0 * aa)
        inner = (disc > 0) & (t > 0)
        return update(carry, i, t, gate(i, inner, t))

    def plane_base(i):
        nx = rows_ref[i, F_NX]
        ny = rows_ref[i, F_NY]
        nz = rows_ref[i, F_NZ]
        d_n = dx * nx + dy * ny + dz * nz
        o_n = ox * nx + oy * ny + oz * nz
        t = -(rows_ref[i, F_PD] + o_n) / jnp.where(d_n == 0, 1.0, d_n)
        inner = (d_n > 0) & (t > 0)
        return t, inner

    def plane_body(i, carry):
        t, inner = plane_base(i)
        return update(carry, i, t, gate(i, inner, t))

    def wall_body(i, carry):
        t, inner = plane_base(i)
        tw = jnp.where(inner, t, 0.0)
        hx = ox + tw * dx
        hy = oy + tw * dy
        hz = oz + tw * dz
        u_proj = (hx * rows_ref[i, F_V1X] + hy * rows_ref[i, F_V1Y]
                  + hz * rows_ref[i, F_V1Z] - rows_ref[i, F_S0])
        v_proj = (hx * rows_ref[i, F_V2X] + hy * rows_ref[i, F_V2Y]
                  + hz * rows_ref[i, F_V2Z] - rows_ref[i, F_S1])
        outside = ((u_proj < 0) | (u_proj > rows_ref[i, F_S2])
                   | (v_proj < 0) | (v_proj > rows_ref[i, F_S3]))
        inner = inner & ((rows_ref[i, F_WDEG] > 0) | ~outside)
        return update(carry, i, t, gate(i, inner, t))

    def tri_bary_body(i, carry):
        t, inner = plane_base(i)
        tw = jnp.where(inner, t, 0.0)
        hx = ox + tw * dx
        hy = oy + tw * dy
        hz = oz + tw * dz
        d20 = (hx * rows_ref[i, F_V1X] + hy * rows_ref[i, F_V1Y]
               + hz * rows_ref[i, F_V1Z] - rows_ref[i, F_S0])
        d21 = (hx * rows_ref[i, F_V2X] + hy * rows_ref[i, F_V2Y]
               + hz * rows_ref[i, F_V2Z] - rows_ref[i, F_S1])
        v = rows_ref[i, F_S2] * d20 - rows_ref[i, F_S3] * d21
        w = rows_ref[i, F_S4] * d21 - rows_ref[i, F_S3] * d20
        u = 1.0 - v - w
        inner = inner & ~((u < 0) | (v < 0) | (w < 0))
        return update(carry, i, t, gate(i, inner, t))

    def tri_mt_body(i, carry):
        e1x = rows_ref[i, F_V1X]
        e1y = rows_ref[i, F_V1Y]
        e1z = rows_ref[i, F_V1Z]
        e2x = rows_ref[i, F_V2X]
        e2y = rows_ref[i, F_V2Y]
        e2z = rows_ref[i, F_V2Z]
        hcx = dy * e2z - dz * e2y
        hcy = dz * e2x - dx * e2z
        hcz = dx * e2y - dy * e2x
        a = e1x * hcx + e1y * hcy + e1z * hcz
        ok = jnp.abs(a) >= 1e-5
        f = 1.0 / jnp.where(ok, a, 1.0)
        smx = ox - rows_ref[i, F_V3X]
        smy = oy - rows_ref[i, F_V3Y]
        smz = oz - rows_ref[i, F_V3Z]
        u = f * (smx * hcx + smy * hcy + smz * hcz)
        ok = ok & (u >= 0) & (u <= 1)
        qx = smy * e1z - smz * e1y
        qy = smz * e1x - smx * e1z
        qz = smx * e1y - smy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        ok = ok & (v >= 0) & (u + v <= 1)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        inner = ok & (t > 0)
        return update(carry, i, t, gate(i, inner, t))

    carry = (t0, s0)
    if n_sph:
        carry = jax.lax.fori_loop(0, n_sph, sphere_body, carry)
    if n_pl:
        carry = jax.lax.fori_loop(off_pl, off_pl + n_pl, plane_body, carry)
    if n_wall:
        carry = jax.lax.fori_loop(off_wall, off_wall + n_wall, wall_body,
                                  carry)
    if n_tri:
        body = tri_mt_body if use_mt else tri_bary_body
        carry = jax.lax.fori_loop(off_tri, off_tri + n_tri, body, carry)

    t_best, sid_best = carry
    t_ref[0] = t_best
    sid_ref[0] = sid_best


def make_closest_hit(rows_ext: jnp.ndarray, perm: jnp.ndarray, counts,
                     cfg: RenderConfig, gate_boxes: bool = False):
    """Build closest_hit(o, d) -> (t, sid_global, hit) backed by the Pallas
    kernel. rows_ext: (N, PACK_EXT) type-sorted packed rows."""
    interpret = _auto_interpret(cfg)
    th, tw = cfg.tile_h, cfg.tile_w
    n = rows_ext.shape[0]
    n_pad = ((n + 127) // 128) * 128
    rows_pad = jnp.pad(rows_ext, ((0, n_pad - n), (0, 0)))
    # row-major (N_pad, PACK_EXT): Mosaic supports dynamic SUBLANE
    # indexing with a static lane (rows_ref[i, F]); the transposed
    # (F, N) layout would need dynamic-lane scalar loads, which the
    # TPU compiler rejects.
    rows_nm = rows_pad

    kernel = functools.partial(_closest_hit_kernel, counts=counts,
                               n_pad=n_pad, use_mt=cfg.use_mt,
                               gate_boxes=gate_boxes)

    @jax.jit
    def closest_hit(o: jnp.ndarray, d: jnp.ndarray):
        r = o.shape[0]
        tile = th * tw
        pad = (-r) % tile
        if pad:
            o = jnp.pad(o, ((0, pad), (0, 0)))
            d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        g = o.shape[0] // tile
        rays = jnp.stack([o[:, 0], o[:, 1], o[:, 2],
                          d[:, 0], d[:, 1], d[:, 2]])  # (6, R)
        rays = rays.reshape(6, g, th, tw)

        t, sid = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec((n_pad, PACK_EXT), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((6, 1, th, tw), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, th, tw), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((g, th, tw), jnp.float32),
                jax.ShapeDtypeStruct((g, th, tw), jnp.int32),
            ],
            interpret=interpret,
        )(rows_nm, rays)

        t = t.reshape(-1)[:r]
        sid_local = sid.reshape(-1)[:r]
        hit = t < INF
        sid_global = jnp.take(perm, sid_local)
        return t, sid_global, hit

    return closest_hit


@functools.partial(jax.jit, static_argnames=("cfg", "counts", "gate_boxes"))
def _render_impl(scene: FlatScene, rows_ext, perm, counts, camera, light,
                 cfg: RenderConfig, gate_boxes: bool):
    h, w = cfg.height, cfg.width
    o, d = cam_ops.camera_rays(camera, w, h)
    ys = jnp.arange(h, dtype=jnp.float32) / h
    bg = jnp.broadcast_to(shading.background(ys)[:, None, :], (h, w, 3))

    closest = make_closest_hit(rows_ext, perm, counts, cfg, gate_boxes)

    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    bg = bg.reshape(-1, 3)
    colors = whitted.trace(scene, light, closest, o, d, bg, cfg)
    return colors.reshape(h, w, 3)


def render(scene: FlatScene, bvh, camera: Camera, light: Light,
           cfg: RenderConfig) -> jnp.ndarray:
    """Render (H, W, 3) with the Pallas closest-hit kernel.

    bvh: optional LinearBVH — when given (and cfg.use_bvh), per-shape leaf
    boxes gate visibility so output matches the BVH renderers exactly.
    """
    perm, counts = sort_scene_by_type(scene)
    leaf_boxes = None
    if bvh is not None and cfg.use_bvh:
        leaf_boxes = shape_leaf_boxes(bvh, scene.num_shapes)
    rows_ext = pack_rows_ext(scene, perm, leaf_boxes)
    gate = leaf_boxes is not None
    return _render_impl(scene, rows_ext, perm, counts, camera, light, cfg,
                        gate)
