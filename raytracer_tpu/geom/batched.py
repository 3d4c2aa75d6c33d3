"""Batched ray-x-shape intersection (the JAX-level hot path).

Tests R rays against N shapes producing (R, N) t/hit arrays without ever
materializing an (R, N, 3) tensor: vectors are held as separate x/y/z
component planes of shape (R, 1) (rays) and (1, N) (shapes) that broadcast
to (R, N). This keeps the arithmetic in the SAME formulation and operation
order as geom/direct.py (which mirrors the reference GLSL,
gpu_shader.comp:170-328) — bit-identical math, no cancellation surprises —
while everything maps onto dense VPU lanes.

Note: a (R,3)@(3,N) matmul formulation was tried and rejected — with K=3
the MXU runs at 3/128 utilization and the expanded quadratic terms
(|o|^2 - 2 o.c + |c|^2) catastrophically cancel at f32 near grazing hits.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from raytracer_tpu.core.scene import FlatScene, SPHERE, PLANE, WALL, TRIANGLE
from raytracer_tpu.geom.direct import INF, wall_basis


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GeomCache:
    """Per-shape derived arrays; pure jnp functions of the FlatScene so
    gradients flow back to scene parameters through the cache."""

    n: jnp.ndarray            # (N,3) plane normal
    pd: jnp.ndarray           # (N,)  plane d
    c: jnp.ndarray            # (N,3) sphere centers
    r: jnp.ndarray            # (N,)  sphere radii
    wu: jnp.ndarray           # (N,3) wall u basis (zeros when degenerate)
    wv: jnp.ndarray           # (N,3) wall v basis
    w_deg: jnp.ndarray        # (N,)  degenerate-basis mask (-> all inside)
    ws: jnp.ndarray           # (N,3) wall start
    ww: jnp.ndarray           # (N,)  width
    wh: jnp.ndarray           # (N,)  height
    p1: jnp.ndarray           # (N,3) triangle p1
    e1: jnp.ndarray           # (N,3) p2-p1
    e2: jnp.ndarray           # (N,3) p3-p1
    d00: jnp.ndarray          # (N,)  dot(e1,e1)
    d01: jnp.ndarray          # (N,)  dot(e1,e2)
    d11: jnp.ndarray          # (N,)  dot(e2,e2)
    denom: jnp.ndarray        # (N,)  d00*d11 - d01^2
    is_sphere: jnp.ndarray    # (N,) bool
    is_plane: jnp.ndarray
    is_wall: jnp.ndarray
    is_tri: jnp.ndarray

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        return tuple(getattr(self, f.name) for f in fields), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def precompute(scene: FlatScene) -> GeomCache:
    n = scene.plane_normal
    wu, wv, w_deg = wall_basis(n)
    e1 = scene.tri_p2 - scene.tri_p1
    e2 = scene.tri_p3 - scene.tri_p1
    d00 = jnp.sum(e1 * e1, -1)
    d01 = jnp.sum(e1 * e2, -1)
    d11 = jnp.sum(e2 * e2, -1)
    st = scene.shape_type
    return GeomCache(
        n=n, pd=scene.plane_d,
        c=scene.sphere_center, r=scene.sphere_radius,
        wu=wu, wv=wv, w_deg=w_deg, ws=scene.wall_start,
        ww=scene.wall_width, wh=scene.wall_height,
        p1=scene.tri_p1, e1=e1, e2=e2,
        d00=d00, d01=d01, d11=d11, denom=d00 * d11 - d01 * d01,
        is_sphere=st == SPHERE, is_plane=st == PLANE,
        is_wall=st == WALL, is_tri=st == TRIANGLE,
    )


def _ray_planes(v):
    """Split (R,3) into three (R,1) component planes."""
    return v[:, 0:1], v[:, 1:2], v[:, 2:3]


def _shape_planes(v):
    """Split (N,3) into three (1,N) component planes."""
    return v[None, :, 0], v[None, :, 1], v[None, :, 2]


def intersect_scene(cache: GeomCache, o: jnp.ndarray, d: jnp.ndarray,
                    use_mt: bool = False,
                    leaf_boxes=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Test R rays against all N shapes. o, d: (R,3) with unit directions.
    Returns (t, inner) of shape (R, N); t = INF where not INNER.

    leaf_boxes: optional ((N,3) min, (N,3) max) per-shape BVH-leaf AABBs.
    When given, a shape only counts as hit if the ray also passes the slab
    test for its leaf box — this reproduces BVH-traversal VISIBILITY
    exactly (a shape is tested iff its leaf box is hit; ancestor boxes
    contain leaf boxes so they never prune extra). This is how the
    reference's useBVH=true image differs from useBVH=false: e.g. scene 1's
    infinite-plane floor wall gets clipped to its finite leaf box.
    """
    ox, oy, oz = _ray_planes(o)
    dx, dy, dz = _ray_planes(d)

    # --- sphere (gpu_shader.comp:246-271) ---------------------------------
    cx, cy, cz = _shape_planes(cache.c)
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    aa = dx * dx + dy * dy + dz * dz                      # (R,1)
    bb = 2.0 * (dx * ocx + dy * ocy + dz * ocz)           # (R,N)
    ccq = ocx * ocx + ocy * ocy + ocz * ocz - cache.r[None, :] ** 2
    disc = bb * bb - 4.0 * aa * ccq
    sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
    t_sph = (-bb - sq) / (2.0 * aa)
    v_sph = (disc > 0) & (t_sph > 0)

    # --- plane family base (gpu_shader.comp:272-286) ----------------------
    nx, ny, nz = _shape_planes(cache.n)
    d_n = dx * nx + dy * ny + dz * nz
    o_n = ox * nx + oy * ny + oz * nz
    t_pl = -(cache.pd[None, :] + o_n) / jnp.where(d_n == 0, 1.0, d_n)
    v_pl = (d_n > 0) & (t_pl > 0)
    tw = jnp.where(v_pl, t_pl, 0.0)
    # plane-family hit point components (shared by wall + barycentric)
    hx, hy, hz = ox + tw * dx, oy + tw * dy, oz + tw * dz

    # --- wall rectangle bound (gpu_shader.comp:287-316) -------------------
    ux, uy, uz = _shape_planes(cache.wu)
    vx, vy, vz = _shape_planes(cache.wv)
    sx, sy, sz = _shape_planes(cache.ws)
    lx, ly, lz = hx - sx, hy - sy, hz - sz
    u_proj = lx * ux + ly * uy + lz * uz
    v_proj = lx * vx + ly * vy + lz * vz
    outside_w = ((u_proj < 0) | (u_proj > cache.ww[None, :])
                 | (v_proj < 0) | (v_proj > cache.wh[None, :]))
    v_wall = v_pl & jnp.where(cache.w_deg[None, :], True, ~outside_w)

    # --- triangle ---------------------------------------------------------
    p1x, p1y, p1z = _shape_planes(cache.p1)
    e1x, e1y, e1z = _shape_planes(cache.e1)
    e2x, e2y, e2z = _shape_planes(cache.e2)
    if use_mt:
        # Moller-Trumbore (gpu_shader.comp:170-195); double-sided.
        hcx = dy * e2z - dz * e2y
        hcy = dz * e2x - dx * e2z
        hcz = dx * e2y - dy * e2x
        a = e1x * hcx + e1y * hcy + e1z * hcz
        ok = jnp.abs(a) >= 1e-5
        f = 1.0 / jnp.where(ok, a, 1.0)
        smx, smy, smz = ox - p1x, oy - p1y, oz - p1z
        u = f * (smx * hcx + smy * hcy + smz * hcz)
        ok = ok & (u >= 0) & (u <= 1)
        qx = smy * e1z - smz * e1y
        qy = smz * e1x - smx * e1z
        qz = smx * e1y - smy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        ok = ok & (v >= 0) & (u + v <= 1)
        t_tri = f * (e2x * qx + e2y * qy + e2z * qz)
        v_tri = ok & (t_tri > 0)
    else:
        # barycentric inside-test on the plane hit (gpu_shader.comp:196-240)
        tpx, tpy, tpz = hx - p1x, hy - p1y, hz - p1z
        d20 = tpx * e1x + tpy * e1y + tpz * e1z
        d21 = tpx * e2x + tpy * e2y + tpz * e2z
        deg = (cache.denom == 0)[None, :]
        safe = jnp.where(deg, 1.0, cache.denom[None, :])
        v = (cache.d11[None, :] * d20 - cache.d01[None, :] * d21) / safe
        w = (cache.d00[None, :] * d21 - cache.d01[None, :] * d20) / safe
        u = 1.0 - v - w
        outside_t = (u < 0) | (v < 0) | (w < 0)
        v_tri = v_pl & jnp.where(deg, True, ~outside_t)
        t_tri = t_pl

    # --- select by type tag (gpu_shader.comp:242-328) ---------------------
    inner = jnp.where(
        cache.is_sphere[None, :], v_sph,
        jnp.where(cache.is_plane[None, :], v_pl,
                  jnp.where(cache.is_wall[None, :], v_wall, v_tri)))
    t = jnp.where(
        cache.is_sphere[None, :], t_sph,
        jnp.where(cache.is_tri[None, :], t_tri, t_pl))

    if leaf_boxes is not None:
        bmin, bmax = leaf_boxes
        inv_x = 1.0 / dx
        inv_y = 1.0 / dy
        inv_z = 1.0 / dz
        bx0, by0, bz0 = _shape_planes(bmin)
        bx1, by1, bz1 = _shape_planes(bmax)
        tx0 = (bx0 - ox) * inv_x
        tx1 = (bx1 - ox) * inv_x
        ty0 = (by0 - oy) * inv_y
        ty1 = (by1 - oy) * inv_y
        tz0 = (bz0 - oz) * inv_z
        tz1 = (bz1 - oz) * inv_z
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                       jnp.maximum(ty0, ty1)),
                           jnp.maximum(tz0, tz1))
        inner = inner & (tmax >= tmin) & (tmax > 0)

    t = jnp.where(inner, t, INF)
    return t, inner


def closest_hit(cache: GeomCache, o: jnp.ndarray, d: jnp.ndarray,
                use_mt: bool = False, leaf_boxes=None):
    """Closest INNER hit per ray (the useBVH=false linear scan,
    gpu_shader.comp:538-554). Returns (t, shape_idx, hit_mask), shapes (R,).

    Ties resolve to the lowest shape index, matching the reference's strict
    ``dist < closestDist`` forward scan.
    """
    t, inner = intersect_scene(cache, o, d, use_mt, leaf_boxes)
    sid = jnp.argmin(t, axis=-1).astype(jnp.int32)
    tmin = jnp.take_along_axis(t, sid[:, None], axis=-1)[:, 0]
    hit = jnp.any(inner, axis=-1)
    return tmin, sid, hit


def shape_normal(scene: FlatScene, sid: jnp.ndarray, point: jnp.ndarray
                 ) -> jnp.ndarray:
    """getNormalFromShape (gpu_shader.comp:64-71): sphere ->
    normalize(p - center); plane/wall/triangle -> stored plane normal."""
    st = jnp.take(scene.shape_type, sid, axis=0)
    center = jnp.take(scene.sphere_center, sid, axis=0)
    pn = jnp.take(scene.plane_normal, sid, axis=0)
    rel = point - center
    norm = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, -1, keepdims=True), 1e-30))
    sphere_n = rel / norm
    return jnp.where((st == SPHERE)[..., None], sphere_n, pn)
