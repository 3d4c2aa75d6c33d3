"""Roofline / op-count model for the production wholeframe kernel
(VERDICT r1 item 2: quantify the distance to speed-of-light).

Method (offline, CPU):
1. Re-run the Whitted bounce loop EAGERLY (same formulas as
   whitted.trace / _wholeframe_kernel) with the pure-XLA wavefront
   closest-hit, recording the concrete ray stream of each of the
   2 * max_bounces walks (closest + shadow per bounce). The replay's
   accumulated image is asserted allclose against wavefront.render, so
   the recorded streams are the production streams.
2. Simulate the kernel's packet walk per (tile, walk) in numpy — the
   EXACT scalar-control algorithm of pallas_split._closest_pass
   (any-lane slab probe with t-culling, skip pointers, TRI_UNROLL
   triangle tests per leaf iteration) — counting internal-node
   iterations, leaf iterations, and live tiles.
3. Convert counts to a vector-op model (ops per iteration from the
   kernel source) and compare against the measured frame time and the
   v5e VPU peak. Writes ROOFLINE.json at the repo root; bench.py
   attaches it to its JSON line when present.

Usage (per scene; scene 1 writes ROOFLINE.json — the artifact bench.py
attaches — scene N>1 writes ROOFLINE_s{N}.json):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/roofline.py \
      [--scene 1|2]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.accel import build_bvh, linearize
from raytracer_tpu.config import RenderConfig
from raytracer_tpu.core import camera as cam_ops
from raytracer_tpu.render import pallas_split, shading, wavefront, whitted
from raytracer_tpu.render.pallas_bvh import _block_shape
from raytracer_tpu.scenes import generate_scene
from raytracer_tpu.geom.rowwise import pack_rows

W, H, BOUNCES = 800, 600, 3
TILE_H, TILE_W = 16, 128

# --- vector-op model (counted from pallas_split.py source) --------------
# per (8,128) VREG; a (16,128) tile is 2 VREGs per elementwise op.
OPS_SLAB = 21          # 6 sub, 6 mul, 3 min, 3 max chains, 3 cmp/and
OPS_TRI_TEST = 26      # _tri_test: plane t + barycentric via cached Gram
OPS_LEAF_EXTRA = 6     # carry where-blends per tested row (t, gid, 3 nrm)
OPS_PRE_SPHERE = 38    # _pre_sphere incl leaf-box gate
OPS_PRE_PW = 48        # _pre_planewall incl gate + wall uv
VREGS_PER_TILE = (TILE_H * TILE_W) // (8 * 128)
# v5e TensorCore VPU: 4 ALUs x (8,128) lanes @ ~0.94 GHz (public spec
# is 197 bf16 TFLOP/s MXU; the VPU figure is the standard estimate used
# by the scaling book's v5e table).
VPU_VREG_OPS_PER_S = 4 * 0.94e9


def to_blocks(x, fill=0.0):
    bh, bw = _block_shape(TILE_H * TILE_W)
    hp = -(-H // bh) * bh
    wp = -(-W // bw) * bw
    x = jnp.pad(x, ((0, hp - H), (0, wp - W), (0, 0)),
                constant_values=fill)
    x = x.reshape(hp // bh, bh, wp // bw, bw, 3)
    return x.transpose(0, 2, 1, 3, 4).reshape(-1, 3)


def record_walk_streams(sc, bvh, cfg):
    """Eager re-run of whitted.trace's bounce loop, returning the ray
    stream (o, d) of every walk plus the replayed image for validation."""
    rows_perm = pack_rows(sc.flat)[bvh.perm]
    closest = wavefront.make_closest_hit(bvh, rows_perm, bvh.perm,
                                         cfg.use_mt)
    closest = jax.jit(closest)
    o, d = cam_ops.camera_rays(sc.camera, W, H)
    ys = jnp.arange(H, dtype=jnp.float32) / H
    bg = jnp.broadcast_to(shading.background(ys)[:, None, :], (H, W, 3))
    o = to_blocks(o, fill=whitted.PARK_ORIGIN)
    d = to_blocks(d, fill=whitted._PARK_DIR)
    bg = to_blocks(bg)

    light_pos, light_color = sc.light.position, sc.light.color
    attr_tab = whitted._attr_table(sc.flat)
    accum = jnp.zeros_like(o)
    atten = jnp.ones_like(o)
    alive = jnp.ones(o.shape[:-1], dtype=bool)
    streams = []
    for _ in range(cfg.max_bounces):
        streams.append(("closest", np.asarray(o), np.asarray(d)))
        t, sid, hit = closest(o, d)
        miss_now = alive & ~hit
        accum = accum + jnp.where(miss_now[..., None], atten * bg, 0.0)
        live = alive & hit
        p = o + t[..., None] * d
        row = jnp.take(attr_tab, sid, axis=0)
        mat_color = row[:, 3:6]
        k_a, k_d, k_s = row[:, 6], row[:, 7], row[:, 8]
        k_f, shin = row[:, 9], row[:, 10]
        rel = p - row[:, 11:14]
        inv = jax.lax.rsqrt(jnp.sum(rel * rel, -1, keepdims=True) + 1e-30)
        n = row[:, 14:15] * (rel * inv) + (1.0 - row[:, 14:15]) * row[:, 0:3]

        s_o = p + n * jnp.float32(cfg.shadow_eps)
        light_dist = jnp.linalg.norm(light_pos - p, axis=-1)
        s_d = (light_pos - p) / jnp.maximum(light_dist, 1e-30)[..., None]
        s_o = jnp.where(hit[..., None], s_o, whitted.PARK_ORIGIN)
        s_d = jnp.where(hit[..., None], s_d, whitted._PARK_DIR)
        streams.append(("shadow", np.asarray(s_o), np.asarray(s_d)))
        s_t, _, s_hit = closest(s_o, s_d)
        in_shadow = s_hit & (s_t < light_dist)

        color = shading.phong(p, n, d, light_pos, light_color, mat_color,
                              k_a, k_d, k_s, shin, attenuate=True)
        color = jnp.where(in_shadow[..., None],
                          color * shading.SHADOW_FACTOR, color)
        accum = accum + jnp.where(live[..., None], atten * color, 0.0)

        spec_pos = k_s > 0
        new_d = d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n
        new_o = p + n * jnp.float32(cfg.reflect_eps)
        cont = live & spec_pos
        if cfg.use_fresnel:
            w = shading.fresnel_weight(new_d, n, k_f)
            atten = jnp.where(
                cont[..., None],
                atten * (mat_color + (1.0 - mat_color) * w[..., None]),
                atten)
            accum = accum + jnp.where(
                cont[..., None],
                (1.0 - w)[..., None] * mat_color * color, 0.0)
        else:
            atten = jnp.where(cont[..., None], atten * k_s[..., None],
                              atten)
        o = jnp.where(cont[..., None], new_o, whitted.PARK_ORIGIN)
        d = jnp.where(cont[..., None], new_d, whitted._PARK_DIR)
        alive = cont
    return streams, np.asarray(accum)


def simulate_walk(split, o, d):
    """Numpy replica of _closest_pass's scalar-control packet walk over
    one blocked ray stream. Returns per-tile iteration counts."""
    nodes = np.asarray(split.nodes)
    leaf_start = np.asarray(split.leaf_start)
    leaf_count = np.asarray(split.leaf_count)
    skip = np.asarray(split.skip)
    tri = np.asarray(split.tri_rows)
    m = split.m
    U = pallas_split.TRI_UNROLL

    tile = TILE_H * TILE_W
    g = o.shape[0] // tile
    stats = {"internal_iters": 0, "leaf_iters": 0, "live_tiles": 0,
             "tiles": g, "tri_rows_tested": 0}

    # prepass best-t seeds the walk's t-culling (numpy port of
    # _pre_sphere/_pre_planewall below)
    pre = np.asarray(split.pre_rows)

    for ti in range(g):
        sl = slice(ti * tile, (ti + 1) * tile)
        ox, oy, oz = o[sl, 0], o[sl, 1], o[sl, 2]
        dx, dy, dz = d[sl, 0], d[sl, 1], d[sl, 2]
        if not (ox < 1e30).any():
            continue
        stats["live_tiles"] += 1
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_dx, inv_dy, inv_dz = 1.0 / dx, 1.0 / dy, 1.0 / dz

            # prepass t0 (sphere + plane/wall rows) — numpy port of
            # _pre_sphere/_pre_planewall sufficient for t-cull seeding
            t_best = np.full(tile, np.float32(3.4e38))
            t_best = _prepass_np(pre, split.n_other, split.n_sph,
                                 ox, oy, oz, dx, dy, dz,
                                 inv_dx, inv_dy, inv_dz, t_best)

            ptr, k = 0, 0
            while ptr < m:
                entering = k == 0
                if entering:
                    b = nodes[ptr]
                    tx0 = (b[0] - ox) * inv_dx
                    tx1 = (b[3] - ox) * inv_dx
                    ty0 = (b[1] - oy) * inv_dy
                    ty1 = (b[4] - oy) * inv_dy
                    tz0 = (b[2] - oz) * inv_dz
                    tz1 = (b[5] - oz) * inv_dz
                    tmin = np.maximum(np.maximum(
                        np.minimum(tx0, tx1), np.minimum(ty0, ty1)),
                        np.minimum(tz0, tz1))
                    tmax = np.minimum(np.minimum(
                        np.maximum(tx0, tx1), np.maximum(ty0, ty1)),
                        np.maximum(tz0, tz1))
                    any_hit = bool(((tmax >= tmin) & (tmax > 0)
                                    & (tmin <= t_best)).any())
                else:
                    any_hit = False
                st, cnt, sk = leaf_start[ptr], leaf_count[ptr], skip[ptr]
                is_leaf = cnt > 0
                start_leaf = entering and any_hit and is_leaf
                in_leaf = start_leaf or (not entering)
                if in_leaf:
                    stats["leaf_iters"] += 1
                    rows = np.arange(k, min(k + U, cnt)) + st
                    stats["tri_rows_tested"] += U
                    t_best = _tri_tests_np(tri, rows, ox, oy, oz,
                                           dx, dy, dz, t_best)
                else:
                    stats["internal_iters"] += 1
                k_next = k + U
                leaf_done = in_leaf and (k_next >= cnt)
                go_deeper = entering and any_hit and not is_leaf
                stay = in_leaf and not leaf_done
                if stay:
                    k = k_next
                else:
                    k = 0
                    ptr = (ptr + 1) if go_deeper else int(sk)
    return stats


def _prepass_np(pre, n_other, n_sph, ox, oy, oz, dx, dy, dz,
                inv_dx, inv_dy, inv_dz, t_best):
    """Numpy port of _pre_sphere/_pre_planewall over the REAL packed row
    layout (geom/rowwise.pack_rows: sphere center 1:4 radius 4; plane
    family normal 5:8, d 8, u-basis 9:12 / s0 18, v-basis 12:15 / s1 19,
    w 20, h 21, degenerate flag 23). Spheres skip the leaf-box gate
    (provably redundant — see _pre_sphere)."""
    from raytracer_tpu.render.pallas_split import G_B0X, G_B1X
    for i in range(n_other):
        r = pre[i]
        if i < n_sph:
            ocx, ocy, ocz = ox - r[1], oy - r[2], oz - r[3]
            aa = dx * dx + dy * dy + dz * dz
            b = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
            c = ocx * ocx + ocy * ocy + ocz * ocz - r[4] * r[4]
            disc = b * b - 4 * aa * c
            t = (-b - np.sqrt(np.maximum(disc, 0.0))) / (2 * aa)
            inner = (disc > 0) & (t > 0)
        else:
            nx, ny, nz = r[5], r[6], r[7]
            d_n = nx * dx + ny * dy + nz * dz
            t = -(r[8] + nx * ox + ny * oy + nz * oz) / np.where(
                d_n == 0, 1.0, d_n)
            v_pl = (d_n > 0) & (t > 0)
            tw = np.where(v_pl, t, 0.0)
            hx, hy, hz = ox + tw * dx, oy + tw * dy, oz + tw * dz
            u = hx * r[9] + hy * r[10] + hz * r[11] - r[18]
            v = hx * r[12] + hy * r[13] + hz * r[14] - r[19]
            outside = (u < 0) | (u > r[20]) | (v < 0) | (v > r[21])
            inner = v_pl & ((r[23] > 0) | ~outside)
            # leaf-box gate (plane family only)
            tx0 = (r[G_B0X] - ox) * inv_dx
            tx1 = (r[G_B1X] - ox) * inv_dx
            ty0 = (r[G_B0X + 1] - oy) * inv_dy
            ty1 = (r[G_B1X + 1] - oy) * inv_dy
            tz0 = (r[G_B0X + 2] - oz) * inv_dz
            tz1 = (r[G_B1X + 2] - oz) * inv_dz
            tmin = np.maximum(np.maximum(np.minimum(tx0, tx1),
                                         np.minimum(ty0, ty1)),
                              np.minimum(tz0, tz1))
            tmax = np.minimum(np.minimum(np.maximum(tx0, tx1),
                                         np.maximum(ty0, ty1)),
                              np.maximum(tz0, tz1))
            inner &= (tmax >= tmin) & (tmax > 0)
        better = inner & (t < t_best)
        t_best = np.where(better, t, t_best)
    return t_best


def _tri_tests_np(tri, rows, ox, oy, oz, dx, dy, dz, t_best):
    from raytracer_tpu.render.pallas_split import (
        T_NX, T_NY, T_NZ, T_PD, T_P1X, T_E1X, T_E2X, T_S0, T_S1,
        T_R11, T_R01, T_R00)
    for row in rows:
        r = tri[row]
        npd = r[T_NX] * dx + r[T_NY] * dy + r[T_NZ] * dz
        t = -(r[T_NX] * ox + r[T_NY] * oy + r[T_NZ] * oz + r[T_PD]) \
            / np.where(npd == 0, 1.0, npd)
        inner = (npd > 0) & (t > 0)
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        pe1 = ((px - r[T_P1X]) * r[T_E1X] + (py - r[T_P1X + 1])
               * r[T_E1X + 1] + (pz - r[T_P1X + 2]) * r[T_E1X + 2])
        pe2 = ((px - r[T_P1X]) * r[T_E2X] + (py - r[T_P1X + 1])
               * r[T_E2X + 1] + (pz - r[T_P1X + 2]) * r[T_E2X + 2])
        v = r[T_R11] * pe1 - r[T_R01] * pe2
        w_ = r[T_R00] * pe2 - r[T_R01] * pe1
        inner &= (v >= 0) & (w_ >= 0) & (v + w_ <= 1)
        better = inner & (t < t_best)
        t_best = np.where(better, t, t_best)
    return t_best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=int, default=1, choices=[1, 2, 3])
    args = ap.parse_args()
    scene_id = args.scene

    cfg = RenderConfig(width=W, height=H, max_bounces=BOUNCES,
                       use_bvh=True, ray_chunk=W * H,
                       tile_h=TILE_H, tile_w=TILE_W)
    sc = generate_scene(scene_id, aspect=W / H)
    bvh = linearize(build_bvh(sc.flat, sc.bvh_max_depth))
    split = pallas_split.prepare(sc.flat, bvh)

    cache = os.path.join("/tmp", f"walk_streams_s{scene_id}_{W}x{H}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        n = int(z["n"])
        streams = [(str(z[f"name{i}"]), z[f"o{i}"], z[f"d{i}"])
                   for i in range(n)]
        replay_img = z["img"]
    else:
        streams, replay_img = record_walk_streams(sc, bvh, cfg)
        np.savez(cache, n=len(streams), img=replay_img,
                 **{f"name{i}": nm for i, (nm, _, _) in enumerate(streams)},
                 **{f"o{i}": o for i, (_, o, _) in enumerate(streams)},
                 **{f"d{i}": d for i, (_, _, d) in enumerate(streams)})
    ref_img = np.asarray(wavefront.render(sc.flat, bvh, sc.camera,
                                          sc.light, cfg))
    # blocked -> image order for the check
    bh, bw = _block_shape(TILE_H * TILE_W)
    hp, wp = -(-H // bh) * bh, -(-W // bw) * bw
    img = replay_img.reshape(hp // bh, wp // bw, bh, bw, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(hp, wp, 3)[:H, :W]
    # The replay jits the closest-hit standalone while wavefront.render
    # fuses it into the whole trace: FP reassociation flips a handful of
    # silhouette/highlight pixels (46 of 49k at 256x192, 2 > 1e-3), which
    # is irrelevant for iteration counting. Validate the overwhelming
    # agreement instead of exact allclose.
    frac_ok = np.mean(np.abs(img - ref_img).max(-1) <= 2e-4)
    assert frac_ok > 0.999, f"replay diverged: only {frac_ok:.4%} agree"

    totals = {"internal_iters": 0, "leaf_iters": 0, "live_tiles": 0,
              "tiles": 0, "tri_rows_tested": 0}
    per_walk = []
    for name, o, d in streams:
        s = simulate_walk(split, o, d)
        per_walk.append({"walk": name, **s})
        for k in totals:
            totals[k] += s[k]
        print(json.dumps(per_walk[-1]), flush=True)

    U = pallas_split.TRI_UNROLL
    ops_leaf = (U * (OPS_TRI_TEST + OPS_LEAF_EXTRA)) * VREGS_PER_TILE
    ops_internal = OPS_SLAB * VREGS_PER_TILE
    ops_pre_tile = (split.n_sph * OPS_PRE_SPHERE
                    + (split.n_other - split.n_sph) * OPS_PRE_PW) \
        * VREGS_PER_TILE
    vreg_ops = (totals["leaf_iters"] * ops_leaf
                + totals["internal_iters"] * ops_internal
                + totals["live_tiles"] * ops_pre_tile)
    sol_ms = vreg_ops / VPU_VREG_OPS_PER_S * 1e3

    result = {
        "scene": scene_id, "width": W, "height": H, "bounces": BOUNCES,
        "walks": per_walk,
        "totals": totals,
        "model": {
            "tri_unroll": U,
            "ops_per_leaf_iter_vregs": ops_leaf,
            "ops_per_internal_iter_vregs": ops_internal,
            "ops_prepass_per_tile_vregs": ops_pre_tile,
            "vpu_vreg_ops_per_s": VPU_VREG_OPS_PER_S,
        },
        "est_vreg_ops_per_frame": int(vreg_ops),
        "op_share": {
            "prepass": round(totals["live_tiles"] * ops_pre_tile
                             / vreg_ops, 4),
            "leaf_tests": round(totals["leaf_iters"] * ops_leaf
                                / vreg_ops, 4),
            "internal_slabs": round(totals["internal_iters"] * ops_internal
                                    / vreg_ops, 4),
        },
        "vpu_speed_of_light_ms_per_frame": round(sol_ms, 3),
        "vpu_speed_of_light_fps": round(1e3 / sol_ms, 1),
    }
    out = os.path.join(os.path.dirname(__file__), "..",
                       "ROOFLINE.json" if scene_id == 1
                       else f"ROOFLINE_s{scene_id}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "walks"},
                     indent=1))


if __name__ == "__main__":
    main()
