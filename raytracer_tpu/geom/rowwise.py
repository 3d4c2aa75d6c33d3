"""Row-wise (gathered) intersection: one packed geometry row per lane.

Used by BVH traversal, where each ray lane has gathered ONE shape row from
the packed geometry table and all lanes evaluate the type-union test
branchlessly. Same math/order as geom/direct.py (reference
gpu_shader.comp:170-328); tests assert agreement.

Packed row layout (PACK_WIDTH f32 per shape):
  [0]      type tag (0 sphere / 1 plane / 2 wall / 3 triangle)
  [1:4]    sphere center          [4]  sphere radius
  [5:8]    plane normal           [8]  plane d
  [9:12]   V1: wall u      | tri e1
  [12:15]  V2: wall v      | tri e2
  [15:18]  V3: (unused)    | tri p1 (Moller-Trumbore)
  [18]     S0: dot(start,u)| dot(p1,e1)
  [19]     S1: dot(start,v)| dot(p1,e2)
  [20]     S2: width       | d11/denom
  [21]     S3: height      | d01/denom
  [22]     S4: (unused)    | d00/denom
  [23]     W : wall degenerate-basis flag (1.0 -> treat as infinite plane)

A degenerate triangle (denom == 0) packs S2=S3=S4=0, which yields
v = w = 0, u = 1 -> always "inside" its plane — exactly the reference's
NaN-comparison behavior (see geom.direct.intersect_triangle_barycentric).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from raytracer_tpu.core.scene import FlatScene, SPHERE, PLANE, WALL, TRIANGLE
from raytracer_tpu.geom.direct import INF, wall_basis

PACK_WIDTH = 24


def pack_rows(scene: FlatScene) -> jnp.ndarray:
    """Pack per-shape geometry into (N, PACK_WIDTH) f32. Pure jnp: jit-able
    and differentiable w.r.t. scene parameters."""
    n_sh = scene.num_shapes
    wu, wv, w_deg = wall_basis(scene.plane_normal)
    e1 = scene.tri_p2 - scene.tri_p1
    e2 = scene.tri_p3 - scene.tri_p1
    d00 = jnp.sum(e1 * e1, -1)
    d01 = jnp.sum(e1 * e2, -1)
    d11 = jnp.sum(e2 * e2, -1)
    denom = d00 * d11 - d01 * d01
    safe = jnp.where(denom == 0, 1.0, denom)
    r11 = jnp.where(denom == 0, 0.0, d11 / safe)
    r01 = jnp.where(denom == 0, 0.0, d01 / safe)
    r00 = jnp.where(denom == 0, 0.0, d00 / safe)

    is_wall = scene.shape_type == WALL
    v1 = jnp.where(is_wall[:, None], wu, e1)
    v2 = jnp.where(is_wall[:, None], wv, e2)
    v3 = scene.tri_p1
    s0 = jnp.where(is_wall, jnp.sum(scene.wall_start * wu, -1),
                   jnp.sum(scene.tri_p1 * e1, -1))
    s1 = jnp.where(is_wall, jnp.sum(scene.wall_start * wv, -1),
                   jnp.sum(scene.tri_p1 * e2, -1))
    s2 = jnp.where(is_wall, scene.wall_width, r11)
    s3 = jnp.where(is_wall, scene.wall_height, r01)
    s4 = jnp.where(is_wall, 0.0, r00)

    rows = jnp.zeros((n_sh, PACK_WIDTH), jnp.float32)
    rows = rows.at[:, 0].set(scene.shape_type.astype(jnp.float32))
    rows = rows.at[:, 1:4].set(scene.sphere_center)
    rows = rows.at[:, 4].set(scene.sphere_radius)
    rows = rows.at[:, 5:8].set(scene.plane_normal)
    rows = rows.at[:, 8].set(scene.plane_d)
    rows = rows.at[:, 9:12].set(v1)
    rows = rows.at[:, 12:15].set(v2)
    rows = rows.at[:, 15:18].set(v3)
    rows = rows.at[:, 18].set(s0)
    rows = rows.at[:, 19].set(s1)
    rows = rows.at[:, 20].set(s2)
    rows = rows.at[:, 21].set(s3)
    rows = rows.at[:, 22].set(s4)
    rows = rows.at[:, 23].set(w_deg.astype(jnp.float32))
    return rows


def intersect_rows(rows: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray,
                   use_mt: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Intersect lane i's ray (o[i], d[i]) with lane i's shape rows[i].

    rows: (R, PACK_WIDTH); o, d: (R, 3). Returns (t, inner) of shape (R,).
    """
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    typ = rows[..., 0]

    # sphere
    ocx = ox - rows[..., 1]
    ocy = oy - rows[..., 2]
    ocz = oz - rows[..., 3]
    r = rows[..., 4]
    aa = dx * dx + dy * dy + dz * dz
    bb = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = bb * bb - 4.0 * aa * cc
    sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
    t_sph = (-bb - sq) / (2.0 * aa)
    v_sph = (disc > 0) & (t_sph > 0)

    # plane family
    nx, ny, nz = rows[..., 5], rows[..., 6], rows[..., 7]
    pd = rows[..., 8]
    d_n = dx * nx + dy * ny + dz * nz
    o_n = ox * nx + oy * ny + oz * nz
    t_pl = -(pd + o_n) / jnp.where(d_n == 0, 1.0, d_n)
    v_pl = (d_n > 0) & (t_pl > 0)
    tw = jnp.where(v_pl, t_pl, 0.0)
    hx, hy, hz = ox + tw * dx, oy + tw * dy, oz + tw * dz

    v1x, v1y, v1z = rows[..., 9], rows[..., 10], rows[..., 11]
    v2x, v2y, v2z = rows[..., 12], rows[..., 13], rows[..., 14]
    s0, s1, s2, s3, s4 = (rows[..., 18], rows[..., 19], rows[..., 20],
                          rows[..., 21], rows[..., 22])

    # wall: V1=u, V2=v, s0=dot(start,u), s1=dot(start,v), s2=w, s3=h
    u_proj = hx * v1x + hy * v1y + hz * v1z - s0
    v_proj = hx * v2x + hy * v2y + hz * v2z - s1
    outside_w = (u_proj < 0) | (u_proj > s2) | (v_proj < 0) | (v_proj > s3)
    v_wall = v_pl & ((rows[..., 23] > 0) | ~outside_w)

    # triangle
    if use_mt:
        p1x, p1y, p1z = rows[..., 15], rows[..., 16], rows[..., 17]
        hcx = dy * v2z - dz * v2y
        hcy = dz * v2x - dx * v2z
        hcz = dx * v2y - dy * v2x
        a = v1x * hcx + v1y * hcy + v1z * hcz
        ok = jnp.abs(a) >= 1e-5
        f = 1.0 / jnp.where(ok, a, 1.0)
        smx, smy, smz = ox - p1x, oy - p1y, oz - p1z
        u = f * (smx * hcx + smy * hcy + smz * hcz)
        ok = ok & (u >= 0) & (u <= 1)
        qx = smy * v1z - smz * v1y
        qy = smz * v1x - smx * v1z
        qz = smx * v1y - smy * v1x
        v = f * (dx * qx + dy * qy + dz * qz)
        ok = ok & (v >= 0) & (u + v <= 1)
        t_tri = f * (v2x * qx + v2y * qy + v2z * qz)
        v_tri = ok & (t_tri > 0)
    else:
        # barycentric with premultiplied ratios: s0=p1e1, s1=p1e2,
        # s2=d11/denom, s3=d01/denom, s4=d00/denom
        d20 = hx * v1x + hy * v1y + hz * v1z - s0
        d21 = hx * v2x + hy * v2y + hz * v2z - s1
        v = s2 * d20 - s3 * d21
        w = s4 * d21 - s3 * d20
        u = 1.0 - v - w
        v_tri = v_pl & ~((u < 0) | (v < 0) | (w < 0))
        t_tri = t_pl

    inner = jnp.where(typ == SPHERE, v_sph,
                      jnp.where(typ == PLANE, v_pl,
                                jnp.where(typ == WALL, v_wall, v_tri)))
    t = jnp.where(typ == SPHERE, t_sph,
                  jnp.where(typ == TRIANGLE, t_tri, t_pl))
    return jnp.where(inner, t, INF), inner
